"""Color-jitter parity vs the REAL reference transform (VERDICT r3 next #5).

The reference's ColorJitterVideo/Image delegate to torchvision.transforms.
functional (/root/reference/lib/data_utils/transforms/color_jitter.py:2,
77-84); torchvision is not installed here, but its PIL backend is a thin
layer over PIL.ImageEnhance + a uint8-HSV hue roll, and PIL *is* installed.
This suite imports the reference module with a faithful PIL-backed
torchvision stub (the exact _functional_pil.py semantics) and demands
BIT-EXACT equality from maed_tpu's vectorized numpy ops — closing the last
replica-only training transform.
"""

import importlib.util
import random
import sys
import types

import numpy as np
import pytest
from PIL import Image, ImageEnhance

from maed_tpu.data.transforms import (
    ColorJitterImage, ColorJitterVideo, _hsv_to_rgb_pil, _rgb_to_hsv_pil,
    adjust_brightness, adjust_contrast, adjust_hue, adjust_saturation,
)

REF = "/root/reference/lib/data_utils/transforms/color_jitter.py"


# --------------------------------------------------------------------------- #
# the PIL-backed torchvision.transforms.functional stub — what torchvision's
# _functional_pil.py does on PIL images (ImageEnhance blends; HSV hue roll)
# --------------------------------------------------------------------------- #

def _stub_adjust_brightness(img, f):
    return ImageEnhance.Brightness(img).enhance(f)


def _stub_adjust_saturation(img, f):
    return ImageEnhance.Color(img).enhance(f)


def _stub_adjust_contrast(img, f):
    return ImageEnhance.Contrast(img).enhance(f)


def _stub_adjust_hue(img, f):
    if not -0.5 <= f <= 0.5:
        raise ValueError(f"hue_factor {f} not in [-0.5, 0.5]")
    h, s, v = img.convert("HSV").split()
    np_h = np.array(h, dtype=np.uint8)
    # torchvision: np_h += np.uint8(hue_factor * 255) — numpy-1.x modular
    # float->uint8 cast (numpy 2 raises on negatives; spell it out)
    np_h += np.uint8(int(np.trunc(f * 255.0)) % 256)
    return Image.merge("HSV", (Image.fromarray(np_h, "L"), s, v)).convert(img.mode)


@pytest.fixture(scope="module")
def ref_jitter():
    """The reference color_jitter module, imported against the PIL stub."""
    tv = types.ModuleType("torchvision")
    tvt = types.ModuleType("torchvision.transforms")
    tvf = types.ModuleType("torchvision.transforms.functional")
    tvf.adjust_brightness = _stub_adjust_brightness
    tvf.adjust_saturation = _stub_adjust_saturation
    tvf.adjust_contrast = _stub_adjust_contrast
    tvf.adjust_hue = _stub_adjust_hue
    tv.transforms = tvt
    tvt.functional = tvf
    saved = {k: sys.modules.get(k) for k in
             ("torchvision", "torchvision.transforms",
              "torchvision.transforms.functional")}
    sys.modules.update({
        "torchvision": tv, "torchvision.transforms": tvt,
        "torchvision.transforms.functional": tvf,
    })
    try:
        spec = importlib.util.spec_from_file_location("ref_color_jitter", REF)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        yield mod
    finally:
        for k, v in saved.items():
            if v is None:
                sys.modules.pop(k, None)
            else:
                sys.modules[k] = v


def _images(rng):
    imgs = [rng.randint(0, 256, (41, 37, 3)).astype(np.uint8)]
    # structured edge cases: grays (maxc==minc), primaries, black/white
    edge = np.zeros((4, 8, 3), np.uint8)
    edge[0] = [128, 128, 128]
    edge[1] = [255, 0, 0]
    edge[2, :4] = [0, 255, 0]
    edge[2, 4:] = [0, 0, 255]
    edge[3, :4] = 0
    edge[3, 4:] = 255
    imgs.append(edge)
    return imgs


# --------------------------------------------------------------------------- #
# per-op bit-exactness across the factor ranges the configs use
# --------------------------------------------------------------------------- #

@pytest.mark.parametrize("ours,theirs,factors", [
    (adjust_brightness, _stub_adjust_brightness, (0.05, 0.7, 1.0, 1.3, 1.95)),
    (adjust_saturation, _stub_adjust_saturation, (0.0, 0.7, 1.0, 1.3, 2.0)),
    (adjust_contrast, _stub_adjust_contrast, (0.05, 0.7, 1.0, 1.3, 1.95)),
    (adjust_hue, _stub_adjust_hue, (-0.5, -0.3, -0.1, 0.0, 0.1, 0.3, 0.5)),
], ids=["brightness", "saturation", "contrast", "hue"])
def test_adjust_op_bit_exact(ours, theirs, factors):
    rng = np.random.RandomState(0)
    for img in _images(rng):
        for f in factors:
            got = ours(img, f)
            want = np.array(theirs(Image.fromarray(img), f))
            np.testing.assert_array_equal(got, want, err_msg=f"factor={f}")


def test_pil_hsv_roundtrip_bit_exact():
    """The numpy HSV replicas ARE Pillow's Convert.c, including its precision
    quirks (f32 divisions, double-literal arithmetic, truncating store)."""
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (128, 128, 3)).astype(np.uint8)
    hsv_pil = np.array(Image.fromarray(img).convert("HSV"))
    np.testing.assert_array_equal(_rgb_to_hsv_pil(img), hsv_pil)
    back = np.array(Image.frombytes(
        "HSV", (128, 128), hsv_pil.tobytes()).convert("RGB"))
    np.testing.assert_array_equal(_hsv_to_rgb_pil(hsv_pil), back)


# --------------------------------------------------------------------------- #
# composed transform: the reference class (stubbed F, pinned RNG) vs ours
# --------------------------------------------------------------------------- #

class _FixedRng:
    """np.random.RandomState stand-in: uniform() pops pinned factors in our
    draw order (b, s, h, c); permutation() returns a pinned op order."""

    def __init__(self, factors, order):
        self.factors = list(factors)
        self.order = order

    def uniform(self, lo, hi):
        f = self.factors.pop(0)
        assert lo <= f <= hi, (lo, f, hi)
        return f

    def permutation(self, n):
        assert n == len(self.order)
        return list(self.order)


def _pin_reference_rng(monkeypatch, ref_mod, factors_bcsh, final_order):
    """Pin the reference's stdlib-random draws: get_params draws b, c, s, h
    (color_jitter.py:15-38); random.shuffle reorders [b, s, h, c] -> the
    pinned final order."""
    draws = list(factors_bcsh)

    def fake_uniform(lo, hi):
        f = draws.pop(0)
        assert lo <= f <= hi
        return f

    def fake_shuffle(lst):
        lst[:] = [lst[i] for i in final_order]

    monkeypatch.setattr(random, "uniform", fake_uniform)
    monkeypatch.setattr(random, "shuffle", fake_shuffle)


@pytest.mark.parametrize("order", [(0, 1, 2, 3), (3, 2, 1, 0), (2, 0, 3, 1)])
def test_video_composition_bit_exact(ref_jitter, monkeypatch, order):
    b, c, s, h = 1.25, 0.8, 1.1, -0.22
    rng = np.random.RandomState(11)
    clip = [rng.randint(0, 256, (33, 29, 3)).astype(np.uint8) for _ in range(3)]

    _pin_reference_rng(monkeypatch, ref_jitter, (b, c, s, h), order)
    ref_tf = ref_jitter.ColorJitterVideo(0.3, 0.3, 0.3, 0.3)
    ref_out = ref_tf({"clip": [f.copy() for f in clip], "other": 7})
    assert ref_out["other"] == 7
    ref_frames = [np.array(f) for f in ref_out["clip"]]

    ours = ColorJitterVideo(0.3, 0.3, 0.3, 0.3)
    out = ours({"clip": [f.copy() for f in clip]},
               _FixedRng([b, s, h, c], order))
    for got, want in zip(out["clip"], ref_frames):
        np.testing.assert_array_equal(got, want)


def test_image_composition_bit_exact(ref_jitter, monkeypatch):
    b, c, s, h = 0.9, 1.15, 1.3, 0.18
    rng = np.random.RandomState(13)
    img = rng.randint(0, 256, (25, 31, 3)).astype(np.uint8)

    _pin_reference_rng(monkeypatch, ref_jitter, (b, c, s, h), (1, 3, 0, 2))
    ref_out = ref_jitter.ColorJitterImage(0.5, 0.5, 0.5, 0.5)(
        {"image": img.copy()})
    want = np.array(ref_out["image"])

    out = ColorJitterImage(0.5, 0.5, 0.5, 0.5)(
        {"image": img.copy()}, _FixedRng([b, s, h, c], (1, 3, 0, 2)))
    np.testing.assert_array_equal(out["image"], want)


def test_zero_strength_ops_are_skipped(ref_jitter, monkeypatch):
    """strength 0 disables an op on both sides (reference get_params returns
    None factors); hue=0.0 strength draws nothing."""
    rng = np.random.RandomState(5)
    img = rng.randint(0, 256, (16, 16, 3)).astype(np.uint8)

    _pin_reference_rng(monkeypatch, ref_jitter, (1.2,), (0,))
    ref_out = ref_jitter.ColorJitterVideo(0.3, 0, 0, 0)({"clip": [img.copy()]})
    out = ColorJitterVideo(0.3, 0, 0, 0)(
        {"clip": [img.copy()]}, _FixedRng([1.2], (0,)))
    np.testing.assert_array_equal(out["clip"][0], np.array(ref_out["clip"][0]))
