#!/bin/bash
# Evaluation launch. Usage: scripts/eval.sh <cfg> <checkpoint> <eval_ds> <eval_set>
set -e
export PYTHONPATH="./:$PYTHONPATH"
python eval.py --cfg "$1" --checkpoint "$2" --eval_ds "$3" --eval_set "$4"
