#!/usr/bin/env bash
# Build the preprocessed joblib DBs (see doc/data.md for raw-data layout).
set -e
export PYTHONPATH="./:$PYTHONPATH"

# 3DPW
python -m maed_tpu.data.preprocess.threedpw --inp_dir ./data/3dpw

# MPI-INF-3D-HP
python -m maed_tpu.data.preprocess.mpii3d --inp_dir ./data/mpi_inf_3dhp --test

# PoseTrack
python -m maed_tpu.data.preprocess.posetrack --inp_dir ./data/posetrack

# PennAction
python -m maed_tpu.data.preprocess.penn_action --inp_dir ./data/penn_action
