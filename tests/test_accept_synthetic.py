"""Closed-loop synthetic acceptance — oracle phase as a regression test
(VERDICT r3 next #1; full round-4 results in doc/runbook.md).

Generates a small synthetic dataset from the native SMPL through the REAL
joblib DB format, then pushes GT-perfect predictions through the COMPLETE
windowed eval protocol (VideoDataset seqlen=0 -> ShardedLoader -> Evaluator
strided sub-clips -> merge -> valid-dedup -> pelvis-center -> Procrustes ->
PVE-from-theta) via the real decoder head path (rot6d -> SMPL -> joint bank).
PA-MPJPE/MPJPE/PVE must come out ~0: any cross-component sign/indexing/
convention drift (crop cam, pelvis, joint bank, theta slicing, windowing)
surfaces as millimetres here. Reference protocol:
/root/reference/lib/core/evaluate.py:71-94,135-179.

The training phase (train.py -> eval.py trained-vs-untrained, ~20 min) runs
via `python tools/accept_synthetic.py all`; round-4 numbers: untrained
102.55 mm -> trained 39.93 mm PA-MPJPE.
"""

import sys
import os.path as osp

sys.path.insert(0, osp.join(osp.dirname(osp.dirname(osp.abspath(__file__))), "tools"))

import pytest


@pytest.fixture(scope="module")
def synacc_dir(tmp_path_factory):
    import accept_synthetic

    out = str(tmp_path_factory.mktemp("synacc"))
    # small: 1 train video is unused here; 2 val videos exercise windowing,
    # batch padding (3 windows into batch 4) and the valid-dedup wrap
    accept_synthetic.generate(out, n_videos=1, frames_per_video=40,
                              size=48, seed=0, val_videos=2)
    return out


def test_gt_oracle_full_protocol_scores_zero(synacc_dir):
    import accept_synthetic

    eval_dict = accept_synthetic.oracle(synacc_dir, tol_mm=0.1)
    # the loop is self-consistent to float32 noise, orders of magnitude
    # below any convention bug (a flipped sign or off-by-one joint is >10mm)
    assert eval_dict["pa-mpjpe"] < 0.01
    assert eval_dict["mpjpe"] < 0.01
    assert eval_dict["pve"] < 0.01
