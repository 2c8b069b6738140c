#!/usr/bin/env bash
# InstaVariety: extract frames from the tfrecords, then build the DB.
# (No TensorFlow required — native tfrecord/Example decoding.)
set -e
export PYTHONPATH="./:$PYTHONPATH"

python -m maed_tpu.data.preprocess.insta --extract_imgs --split "${1:-train}"
python -m maed_tpu.data.preprocess.insta --split "${1:-train}"
