"""Crop transform vs the REAL reference crop code (the eval input path).

The affine crop is the preprocessing every accuracy number flows through;
here the actual /root/reference/lib/data_utils/transforms/crop.py runs as
the oracle (torchvision stubbed — imported but unused by the crop math):
identical affine matrices, identical warped pixels (cv2.INTER_LINEAR),
identical transformed keypoints, over bboxes with rotation/scale/shift
augmentations.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

from maed_tpu.data.transforms import apply_trans_points, gen_crop_trans


@pytest.fixture(scope="module")
def ref_crop():
    pytest.importorskip("cv2")
    saved = {k: sys.modules.get(k)
             for k in ("torchvision", "torchvision.transforms",
                       "torchvision.transforms.functional")}
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvt.functional = tvf
    tv.transforms = tvt
    sys.modules.update({"torchvision": tv, "torchvision.transforms": tvt,
                        "torchvision.transforms.functional": tvf})
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_crop", "/root/reference/lib/data_utils/transforms/crop.py")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)


CASES = [
    # bbox (cx, cy, w, h), scale, rot_deg, shift
    (np.array([120.0, 90.0, 80.0, 80.0]), (1.3, 1.3), 0.0, (0.0, 0.0)),
    (np.array([60.0, 200.0, 50.0, 120.0]), (1.1, 1.1), 25.0, (0.0, 0.0)),
    (np.array([150.0, 100.0, 90.0, 60.0]), (0.9, 0.9), -40.0, (0.12, -0.08)),
]


@pytest.mark.parametrize("case", range(len(CASES)))
def test_crop_affine_and_pixels_match_reference(ref_crop, case):
    import cv2

    bbox, scale, rot, shift = CASES[case]
    ref = ref_crop.CropVideo(patch_height=64, patch_width=64)

    ref_trans = ref.gen_trans(bbox, scale, rot, shift)
    our_trans = gen_crop_trans(bbox, scale, rot, shift, out_w=64, out_h=64)
    np.testing.assert_allclose(our_trans, ref_trans, rtol=1e-6, atol=1e-6)

    rng = np.random.RandomState(case)
    img = rng.randint(0, 255, (240, 320, 3), dtype=np.uint8)
    ref_img = np.asarray(ref.trans_image(img, ref_trans))
    our_img = cv2.warpAffine(img, our_trans, (64, 64),
                             flags=cv2.INTER_LINEAR,
                             borderMode=cv2.BORDER_CONSTANT)
    np.testing.assert_array_equal(our_img, ref_img)

    kp = np.concatenate([rng.rand(49, 2) * 300, rng.rand(49, 1)], axis=1)
    ref_kp = ref.trans_keypoints(kp, ref_trans)
    our_kp = apply_trans_points(kp, our_trans)
    np.testing.assert_allclose(our_kp, ref_kp, rtol=1e-6, atol=1e-6)
