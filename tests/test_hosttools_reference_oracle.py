"""Host-tool and geometry parity vs the REAL reference modules.

Imports the actual reference lib/utils/geometry.py (torch),
lib/utils/demo_utils.py (cam conversion), and lib/data_utils/img_utils.py
(eval chunk math; its dead `mc` import and skimage dep are stubbed — the
view_as_windows stand-in is numpy's sliding_window_view, identical
semantics for the 1-D windows the reference takes) and checks our
implementations against them.
"""

import importlib.util
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _load(path, name, stubs=None):
    saved = {k: sys.modules.get(k) for k in (stubs or {})}
    sys.modules.update(stubs or {})
    try:
        spec = importlib.util.spec_from_file_location(name, path)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)


@pytest.fixture(scope="module")
def ref_geometry():
    pytest.importorskip("torch")
    return _load("/root/reference/lib/utils/geometry.py", "ref_geometry")


@pytest.fixture(scope="module")
def ref_img_utils():
    pytest.importorskip("torch")
    skimage = types.ModuleType("skimage")
    sk_util = types.ModuleType("skimage.util")
    sk_shape = types.ModuleType("skimage.util.shape")

    def view_as_windows(arr, window, step=1):
        # the reference calls this on a (N,) int array with window (seqlen,)
        # and scalar step: numpy's sliding_window_view + stride is identical
        w = window[0] if isinstance(window, tuple) else window
        return np.lib.stride_tricks.sliding_window_view(arr, w)[::step]

    sk_shape.view_as_windows = view_as_windows
    sk_util.shape = sk_shape
    skimage.util = sk_util
    stubs = {
        "mc": types.ModuleType("mc"),
        "skimage": skimage,
        "skimage.util": sk_util,
        "skimage.util.shape": sk_shape,
    }
    return _load("/root/reference/lib/data_utils/img_utils.py",
                 "ref_img_utils", stubs)


def test_rodrigues_matches_reference(ref_geometry):
    import torch

    from maed_tpu.ops.geometry import rodrigues

    rng = np.random.RandomState(41)
    aa = np.concatenate([rng.randn(64, 3) * 2.0, np.zeros((1, 3))], axis=0)
    with torch.no_grad():
        want = ref_geometry.batch_rodrigues(torch.from_numpy(aa)).numpy()
    with jax.enable_x64(True):
        got = np.asarray(rodrigues(jnp.asarray(aa))).reshape(-1, 9)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_rot6d_matches_reference(ref_geometry):
    import torch

    from maed_tpu.ops.geometry import rot6d_to_rotmat

    rng = np.random.RandomState(42)
    x = rng.randn(32, 144)
    with torch.no_grad():
        want = ref_geometry.rot6d_to_rotmat(
            torch.from_numpy(x)).reshape(-1, 3, 3).numpy()
    with jax.enable_x64(True):
        got = np.asarray(rot6d_to_rotmat(jnp.asarray(x))).reshape(-1, 3, 3)
    np.testing.assert_allclose(got, want, rtol=1e-9, atol=1e-9)


def test_rotmat_to_aa_matches_reference(ref_geometry):
    import torch

    from maed_tpu.ops.geometry import rodrigues, rotmat_to_aa

    rng = np.random.RandomState(43)
    aa = rng.randn(64, 3)
    with jax.enable_x64(True):
        rotmats = np.asarray(rodrigues(jnp.asarray(aa)))
        got = np.asarray(rotmat_to_aa(jnp.asarray(rotmats)))
    with torch.no_grad():
        want = ref_geometry.rotation_matrix_to_angle_axis(
            torch.from_numpy(rotmats)).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-7)


def test_convert_crop_cam_matches_reference():
    import importlib

    pytube = types.ModuleType("pytube")
    pytube.YouTube = object
    lib = types.ModuleType("lib")
    lib.__path__ = ["/root/reference/lib"]
    lib_utils = types.ModuleType("lib.utils")
    lib_utils.__path__ = ["/root/reference/lib/utils"]
    saved = {k: sys.modules.get(k)
             for k in ("pytube", "lib", "lib.utils", "lib.utils.demo_utils",
                       "lib.utils.smooth_bbox", "lib.utils.geometry")}
    sys.modules.update({"pytube": pytube, "lib": lib, "lib.utils": lib_utils})
    try:
        ref_demo = importlib.import_module("lib.utils.demo_utils")
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)

    from maed_tpu.utils.demo_utils import convert_crop_cam_to_orig_img

    rng = np.random.RandomState(44)
    cam = np.stack([rng.uniform(0.6, 1.4, 8), rng.uniform(-1, 1, 8),
                    rng.uniform(-1, 1, 8)], axis=1)
    # non-square boxes: sx uses w, sy uses h (reference demo_utils.py:108-113)
    bbox = np.stack([rng.uniform(50, 250, 8), rng.uniform(50, 250, 8),
                     rng.uniform(40, 120, 8), rng.uniform(40, 120, 8)], axis=1)
    want = ref_demo.convert_crop_cam_to_orig_img(cam, bbox, 320, 240)
    got = convert_crop_cam_to_orig_img(cam, bbox, 320, 240)
    np.testing.assert_allclose(got, want, rtol=1e-9)


def test_split_into_chunks_matches_reference(ref_img_utils):
    from maed_tpu.data.chunks import split_into_chunks

    vid_names = np.array(
        ["a"] * 17 + ["b"] * 8 + ["c"] * 3 + ["d"] * 8)
    for seqlen, stride in [(8, 8), (8, 4), (4, 3), (8, 1)]:
        want = ref_img_utils.split_into_chunks(vid_names, seqlen, stride)
        got = split_into_chunks(vid_names, seqlen, stride)
        assert len(got) == len(want), (seqlen, stride)
        for g, w in zip(got, want):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w),
                                          err_msg=f"{seqlen}/{stride}")


def test_split_into_chunks_nopad_matches_reference(ref_img_utils):
    from maed_tpu.data.chunks import split_into_chunks

    vid_names = np.array(["a"] * 10 + ["b"] * 5)
    want = ref_img_utils.split_into_chunks(vid_names, 4, 2, pad=False)
    got = split_into_chunks(vid_names, 4, 2, pad=False)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))


@pytest.fixture(scope="module")
def ref_demo():
    import importlib

    pytube = types.ModuleType("pytube")
    pytube.YouTube = object
    lib = types.ModuleType("lib")
    lib.__path__ = ["/root/reference/lib"]
    lib_utils = types.ModuleType("lib.utils")
    lib_utils.__path__ = ["/root/reference/lib/utils"]
    saved = {k: sys.modules.get(k)
             for k in ("pytube", "lib", "lib.utils", "lib.utils.demo_utils",
                       "lib.utils.smooth_bbox", "lib.utils.geometry")}
    sys.modules.update({"pytube": pytube, "lib": lib, "lib.utils": lib_utils})
    try:
        yield importlib.import_module("lib.utils.demo_utils")
    finally:
        for k, v in saved.items():
            if v is not None:
                sys.modules[k] = v
            else:
                sys.modules.pop(k, None)


def test_prepare_rendering_results_matches_reference(ref_demo):
    from maed_tpu.utils.demo_utils import prepare_rendering_results

    rng = np.random.RandomState(11)
    nframes = 7
    results = {}
    for pid, frame_ids in [(3, [0, 1, 2, 5]), (9, [1, 2, 3]), (4, [2, 6])]:
        n = len(frame_ids)
        results[pid] = {
            "frame_ids": np.array(frame_ids),
            "verts": rng.rand(n, 12, 3).astype(np.float32),
            "orig_cam": rng.rand(n, 4).astype(np.float32),
        }
    want = ref_demo.prepare_rendering_results(results, nframes)
    got = prepare_rendering_results(results, nframes)
    assert len(got) == len(want) == nframes
    for f, (g, w) in enumerate(zip(got, want)):
        # same people, same back-to-front depth order
        assert list(g.keys()) == list(w.keys()), f
        for pid in g:
            np.testing.assert_array_equal(g[pid]["verts"], w[pid]["verts"])
            np.testing.assert_array_equal(g[pid]["cam"], w[pid]["cam"])
