#!/bin/sh
# One-command acceptance run against the reference's released checkpoint.
#
#   sh scripts/eval_released.sh path/to/released_checkpoint.pth.tar
#
# Preflight-checks every artifact the run needs (with exact placement
# instructions when one is missing), then evaluates on 3DPW-test with the
# reference protocol. Expected result (reference README, /root/reference/
# README.md:93-94): PA-MPJPE 45.7 mm (MPJPE 88.8) for the released stage-2
# model; the parity target for this rebuild is within 0.5 mm of that.
#
# The .pth.tar is converted to flax on the fly (eval.py ->
# maed_tpu/utils/torch_convert.py; key naming validated against the
# reference's real model definitions in tests/test_reference_naming.py).
set -e
cd "$(dirname "$0")/.."

CKPT="${1:?usage: sh scripts/eval_released.sh <released .pth.tar>}"
shift

fail=0
need() {
    if [ ! -e "$1" ]; then
        echo "MISSING: $1"
        echo "    -> $2"
        fail=1
    fi
}

need "$CKPT" "the released checkpoint (reference README 'Trained models')"
need data/smpl_data/SMPL_NEUTRAL.pkl \
    "SMPL neutral body model pickle (from smplify / SPIN data bundle)"
need data/smpl_data/J_regressor_extra.npy \
    "extra 9-joint regressor (SPIN data bundle)"
need data/smpl_data/J_regressor_h36m.npy \
    "H36M 17-joint regressor — 3DPW protocol metrics are computed on its J14 subset"
need data/database/3dpw_test_db.pt \
    "preprocessed 3DPW test DB: python -m maed_tpu.data.preprocess.threedpw --inp_dir <3DPW_root>"

if [ "$fail" -ne 0 ]; then
    echo "aborting: place the artifacts above, then re-run." >&2
    exit 1
fi

exec python eval.py --cfg configs/config_stage2.yaml \
    --checkpoint "$CKPT" --eval_ds 3dpw --eval_set test "$@"
