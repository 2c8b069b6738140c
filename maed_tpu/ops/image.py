"""On-device image preprocessing: affine crop + normalize as a jitted kernel.

North-star feature (BASELINE.json): move clip crop/resize/normalize onto the
TPU so the host only ships raw uint8 frames + affine parameters. The warp is
a bilinear gather (pure jnp, fuses with the downstream model under one jit);
semantics match the host path (cv2.warpAffine INTER_LINEAR + constant border
+ ImageNet normalize) to float bilinear accuracy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# numpy on purpose: module import must not initialize a jax backend
IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def invert_affine(trans: jnp.ndarray) -> jnp.ndarray:
    """(..., 2, 3) forward affine (input px -> output px) -> inverse."""
    a, b, c = trans[..., 0, 0], trans[..., 0, 1], trans[..., 0, 2]
    d, e, f = trans[..., 1, 0], trans[..., 1, 1], trans[..., 1, 2]
    det = a * e - b * d
    ia, ib = e / det, -b / det
    id_, ie = -d / det, a / det
    ic = -(ia * c + ib * f)
    if_ = -(id_ * c + ie * f)
    row0 = jnp.stack([ia, ib, ic], axis=-1)
    row1 = jnp.stack([id_, ie, if_], axis=-1)
    return jnp.stack([row0, row1], axis=-2)


def _warp_one(frame: jnp.ndarray, inv: jnp.ndarray, out_h: int, out_w: int):
    """frame (H, W, 3) any dtype; inv (2, 3) output-px -> input-px affine."""
    H, W = frame.shape[:2]
    ys = jnp.arange(out_h, dtype=jnp.float32)
    xs = jnp.arange(out_w, dtype=jnp.float32)
    gx, gy = jnp.meshgrid(xs, ys)  # (out_h, out_w)
    sx = inv[0, 0] * gx + inv[0, 1] * gy + inv[0, 2]
    sy = inv[1, 0] * gx + inv[1, 1] * gy + inv[1, 2]

    x0 = jnp.floor(sx)
    y0 = jnp.floor(sy)
    fx = (sx - x0)[..., None]
    fy = (sy - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    img = frame.astype(jnp.float32)

    def tap(yi, xi):
        valid = (xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
        v = img[jnp.clip(yi, 0, H - 1), jnp.clip(xi, 0, W - 1)]
        return jnp.where(valid[..., None], v, 0.0)

    p00 = tap(y0i, x0i)
    p10 = tap(y0i, x0i + 1)
    p01 = tap(y0i + 1, x0i)
    p11 = tap(y0i + 1, x0i + 1)

    out = (
        p00 * (1 - fx) * (1 - fy)
        + p10 * fx * (1 - fy)
        + p01 * (1 - fx) * fy
        + p11 * fx * fy
    )
    return out


def _interp_matrix(starts, steps, out_size: int, in_size: int):
    """Per-frame 1D bilinear interpolation matrices.

    starts, steps: (T,) source coordinate of output index 0 and its increment.
    Returns (T, out_size, in_size) with rows relu(1 - |src - j|): exactly
    bilinear taps, and zero rows (constant-0 border) outside the source.
    """
    out_idx = jnp.arange(out_size, dtype=jnp.float32)
    src = starts[:, None] + steps[:, None] * out_idx[None, :]        # (T, out)
    in_idx = jnp.arange(in_size, dtype=jnp.float32)
    w = 1.0 - jnp.abs(src[:, :, None] - in_idx[None, None, :])       # (T, out, in)
    return jnp.maximum(w, 0.0)


def _warp_separable(frames, inv, out_h: int, out_w: int):
    """Axis-aligned warp as two batched MXU matmuls (no gathers).

    inv: (T, 2, 3) with zero off-diagonal terms (no rotation). TPU gathers
    serialize on the VPU (~10x slower than this path for 224^2 crops).
    """
    T, H, W = frames.shape[:3]
    img = frames.astype(jnp.float32)
    wx = _interp_matrix(inv[:, 0, 2], inv[:, 0, 0], out_w, W)  # (T, ow, W)
    wy = _interp_matrix(inv[:, 1, 2], inv[:, 1, 1], out_h, H)  # (T, oh, H)
    tmp = jnp.einsum("tiy,tyxc->tixc", wy, img)                # rows
    return jnp.einsum("tjx,tixc->tijc", wx, tmp)               # cols


def affine_crop_normalize(
    frames: jnp.ndarray,      # (T, H, W, 3) uint8 (or float 0..255)
    trans: jnp.ndarray,       # (T, 2, 3) forward affines (cv2 convention)
    out_h: int,
    out_w: int,
    separable: bool | None = None,
) -> jnp.ndarray:
    """Crop every frame with its affine and ImageNet-normalize: (T, oh, ow, 3)
    float32. Jit/vmap/shard-friendly; composes with the model under one jit.

    Axis-aligned affines (the eval protocol: scale+translate, no rotation)
    take a separable two-matmul path on the MXU; rotated affines fall back to
    the bilinear-gather path. `separable` forces the choice (it must be a
    static Python bool under jit; by default it is inferred from the traced
    values only when they are concrete)."""
    trans = trans.astype(jnp.float32)
    inv = invert_affine(trans)
    if separable is None:
        try:
            separable = bool(
                (jnp.abs(trans[..., 0, 1]).max() == 0)
                & (jnp.abs(trans[..., 1, 0]).max() == 0)
            )
        except jax.errors.TracerBoolConversionError:
            separable = False
    if separable:
        warped = _warp_separable(frames, inv, out_h, out_w)
    else:
        warped = jax.vmap(lambda f, m: _warp_one(f, m, out_h, out_w))(frames, inv)
    return (warped / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def device_normalize(images: jnp.ndarray) -> jnp.ndarray:
    """In-jit ImageNet normalize for uint8 inputs; float inputs pass through.

    The on-device half of the uint8 shipping contract (north star: move clip
    normalize onto the TPU): the host pipeline keeps frames uint8 end-to-end
    (crop/jitter/erase/flip all operate on uint8 already — reference host
    path being replaced: /root/reference/lib/data_utils/transforms/
    basic.py:28-117), ships 1/4 the H2D bytes, and this runs as the first op
    inside the model's jit where XLA fuses it into the stem convolution.
    dtype is static under jit, so the dispatch costs nothing at runtime and
    float32 callers (every pre-round-5 consumer, the parity oracles) get an
    UNCHANGED graph."""
    if images.dtype == jnp.uint8:
        return (images.astype(jnp.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
    return images


def normalize_keypoints(kp: jnp.ndarray, trans: jnp.ndarray, patch_size: int):
    """Apply the same affines to (T, K, 3) keypoints and scale xy to [-1, 1]."""
    xy1 = jnp.concatenate([kp[..., :2], jnp.ones_like(kp[..., :1])], axis=-1)
    out_xy = jnp.einsum("tij,tkj->tki", trans.astype(kp.dtype), xy1)
    out_xy = 2.0 * out_xy / patch_size - 1.0
    return jnp.concatenate([out_xy, kp[..., 2:]], axis=-1)


def batch_crop_normalize(frames, trans, out_h, out_w, separable: bool = True):
    """(N, T, H, W, 3) clips + (N, T, 2, 3) affines -> (N, T, oh, ow, 3).

    separable=True (default) assumes axis-aligned crops (the eval protocol)."""
    return jax.vmap(
        lambda f, m: affine_crop_normalize(f, m, out_h, out_w, separable=separable)
    )(frames, trans)


def apply_device_preproc(images, out_h: int, out_w: int):
    """Resolve either device-preprocessing input contract to model frames.

    images is one of:
      * an array (N, T, H, W, 3) — already-cropped clips, uint8 (normalized
        in-jit by the model) or f32 (the original host contract): returned
        unchanged;
      * a pack {'frames': (N, T, Hs, Ws, 3) uint8 RAW frames, 'trans':
        (N, T, 2, 3) forward affines} — DATASET.DEVICE_CROP mode: the crop
        AND normalize run here, inside the caller's jit, on the MXU
        (separable two-matmul warp; eval affines are axis-aligned).

    The full on-device preprocessing stage (north star): host ships raw
    uint8 frames + 24 floats per frame; decode stays on host. Use when
    source frames are near crop size (full 1080p frames would ship MORE
    bytes than uint8 crops — see doc/design.md).
    """
    if isinstance(images, dict):
        return batch_crop_normalize(images["frames"], images["trans"],
                                    out_h, out_w, separable=True)
    return images


def crop_trans_for_bbox(bbox: np.ndarray, out_h: int, out_w: int,
                        scale: float = 1.3) -> np.ndarray:
    """Host helper: deterministic eval-crop affine for a (..., 4) bbox
    (cx, cy, w, h), same geometry as transforms.gen_crop_trans."""
    bbox = np.asarray(bbox, np.float32)
    sw = bbox[..., 2] * scale
    sh = bbox[..., 3] * scale
    a = out_w / sw
    e = out_h / sh
    c = out_w * 0.5 - a * bbox[..., 0]
    f = out_h * 0.5 - e * bbox[..., 1]
    z = np.zeros_like(a)
    row0 = np.stack([a, z, c], axis=-1)
    row1 = np.stack([z, e, f], axis=-1)
    return np.stack([row0, row1], axis=-2)
