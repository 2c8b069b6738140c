"""Keypoint format conversion vs the REAL reference kp_utils (numpy-only).

Our joint-name tables were transcribed from the reference and the flip table
is derived; this sweep imports the actual
/root/reference/lib/data_utils/kp_utils.py and checks, for EVERY format the
datasets use: the name lists themselves, convert_kps in both directions
against 'spin', permutation indices, and the flipped-spin conversion the
horizontal-flip augmentation depends on. Note the reference defines
get_pennaction_joint_names twice — the later 13-joint version wins (Python
shadowing), and that is the behavior preprocessors relied on.
"""

import importlib.util

import numpy as np
import pytest

from maed_tpu.data import keypoints as ours

FORMATS = ["spin", "spin2", "h36m", "common", "coco", "mpii", "mpii3d",
           "mpii3d_test", "insta", "posetrack", "pennaction", "staf",
           "3dpw", "aich", "smplcoco", "smpl"]


@pytest.fixture(scope="module")
def ref_kp():
    spec = importlib.util.spec_from_file_location(
        "ref_kp_utils", "/root/reference/lib/data_utils/kp_utils.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _ref_names(ref_kp, fmt, flip=False):
    getter = getattr(ref_kp, f"get_{fmt}_joint_names")
    return getter(flip) if fmt in ("spin", "smpl") else getter()


def test_joint_name_tables_match_reference(ref_kp):
    for fmt in FORMATS:
        assert list(ours.get_joint_names(fmt)) == list(_ref_names(ref_kp, fmt)), fmt
    for fmt in ("spin", "smpl"):
        assert list(ours.get_joint_names(fmt, flip=True)) == \
            list(_ref_names(ref_kp, fmt, flip=True)), f"{fmt} flipped"


def test_convert_kps_matches_reference_every_format(ref_kp):
    rng = np.random.RandomState(31)
    for fmt in FORMATS:
        n_src = len(_ref_names(ref_kp, fmt))
        joints = rng.rand(3, n_src, 3)
        # the reference's convert_kps passes `flip` to every dst getter, so
        # only dst spin/smpl (the two flip-aware getters) actually work —
        # and those are the only dst the training pipeline uses
        for dst in ("spin", "smpl"):
            want = ref_kp.convert_kps(joints, fmt, dst)
            got = ours.convert_kps(joints, fmt, dst)
            np.testing.assert_array_equal(got, want, err_msg=f"{fmt}->{dst}")
        # the hflip augmentation path: src -> flipped spin
        want = ref_kp.convert_kps(joints, fmt, "spin", flip=True)
        got = ours.convert_kps(joints, fmt, "spin", flip=True)
        np.testing.assert_array_equal(got, want, err_msg=f"{fmt}->spin flip")


def test_perm_idxs_match_reference(ref_kp):
    for fmt in FORMATS:
        assert ours.get_perm_idxs(fmt, "common") == \
            ref_kp.get_perm_idxs(fmt, "common"), fmt
        assert ours.get_perm_idxs("spin", fmt) == \
            ref_kp.get_perm_idxs("spin", fmt), fmt


def test_convert_kps_to_mask_matches_reference(ref_kp):
    rng = np.random.RandomState(7)
    for mask_size in (56, 28, 14):
        # include out-of-frame coordinates: the reference clamps them onto
        # the border cells (after an int8 cast) rather than dropping them
        kp_2d = rng.uniform(-12.0, 236.0, size=(49, 2))
        visibility = (rng.rand(49) > 0.3).astype(np.float32)
        want = ref_kp.convert_kps_to_mask(kp_2d, visibility, mask_size)
        got = ours.convert_kps_to_mask(kp_2d, visibility, mask_size)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(got, want, err_msg=f"mask {mask_size}")
