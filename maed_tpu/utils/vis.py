"""Debug visualization: skeleton overlays, 3D pose plots, and
batch-inspection grids (cv2/matplotlib).

Parity target: /root/reference/lib/utils/vis.py:46-426 (skeleton/mesh grids
for eyeballing training batches), rebuilt on cv2 — no GL or torchvision.
Not matched: get_regressor_output (vis.py:428-462, dead torch-model probe)
and show_video (vis.py:465-474, IPython-notebook display).
"""

from __future__ import annotations

import numpy as np

from maed_tpu.data.keypoints import get_joint_names

SPIN_SKELETON = [
    (0, 1), (1, 2), (2, 3), (3, 4), (1, 5), (5, 6), (6, 7), (1, 8),
    (8, 9), (9, 10), (10, 11), (8, 12), (12, 13), (13, 14),
    (0, 15), (0, 16), (15, 17), (16, 18),
]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def denormalize_image(img: np.ndarray) -> np.ndarray:
    """ImageNet-normalized float (H, W, 3) -> uint8 RGB."""
    x = img * IMAGENET_STD + IMAGENET_MEAN
    return np.clip(x * 255.0, 0, 255).astype(np.uint8)


def draw_skeleton(img: np.ndarray, kp_2d: np.ndarray, normalized: bool = True,
                  skeleton=SPIN_SKELETON, vis_thresh: float = 0.3) -> np.ndarray:
    """Draw keypoints + bones; kp in [-1,1] when normalized, else pixels."""
    import cv2

    out = img.copy()
    h, w = img.shape[:2]
    kp = kp_2d.copy()
    if normalized:
        kp[:, 0] = (kp[:, 0] + 1) * 0.5 * w
        kp[:, 1] = (kp[:, 1] + 1) * 0.5 * h
    conf = kp[:, 2] if kp.shape[1] > 2 else np.ones(len(kp))
    for a, b in skeleton:
        if a < len(kp) and b < len(kp) and conf[a] > vis_thresh and conf[b] > vis_thresh:
            cv2.line(out, tuple(kp[a, :2].astype(int)), tuple(kp[b, :2].astype(int)),
                     (0, 255, 0), 1)
    for i, p in enumerate(kp):
        if conf[i] > vis_thresh:
            cv2.circle(out, tuple(p[:2].astype(int)), 2, (255, 0, 0), -1)
    return out


def batch_grid(images: np.ndarray, kp_2d: np.ndarray | None = None,
               max_items: int = 16, normalized: bool = True) -> np.ndarray:
    """(N, H, W, 3) normalized batch -> one uint8 grid image for logging."""
    n = min(len(images), max_items)
    cols = int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = images.shape[1:3]
    grid = np.zeros((rows * h, cols * w, 3), np.uint8)
    for i in range(n):
        img = denormalize_image(images[i])
        if kp_2d is not None:
            img = draw_skeleton(img, kp_2d[i], normalized=normalized)
        r, c = divmod(i, cols)
        grid[r * h:(r + 1) * h, c * w:(c + 1) * w] = img
    return grid


def joint_names(fmt: str = "spin"):
    return get_joint_names(fmt)


# A named debug palette (reference vis.py:46-62 keeps one for per-limb
# coloring; the RGB values are ColorBrewer picks, not project-specific).
COLORS = {
    "pink": (197, 27, 125), "light_pink": (233, 163, 201),
    "light_green": (161, 215, 106), "green": (77, 146, 33),
    "red": (215, 48, 39), "light_red": (252, 146, 114),
    "light_orange": (252, 141, 89), "purple": (118, 42, 131),
    "light_purple": (175, 141, 195), "light_blue": (145, 191, 219),
    "blue": (69, 117, 180), "gray": (130, 130, 130),
    "white": (255, 255, 255),
}


def get_colors():
    return {k: np.array(v) for k, v in COLORS.items()}


def draw_smpl_joints2d(joints2d: np.ndarray, image: np.ndarray,
                       kintree_table: np.ndarray | None = None) -> np.ndarray:
    """Draw a 2D SMPL skeleton from a (2, 24) parent/child kintree table,
    alternating the palette's red/blue per bone (reference vis.py:142-164).
    Falls back to the SMPL tree from ops/smpl.py when no table is given."""
    import cv2

    if kintree_table is None:
        from maed_tpu.ops.joints import SMPL_PARENTS

        kintree_table = np.stack([np.asarray(SMPL_PARENTS),
                                  np.arange(len(SMPL_PARENTS))])
    rcolor, lcolor = COLORS["red"], COLORS["blue"]
    out = image
    pts = np.asarray(joints2d)[:, :2].astype(int)
    for i in range(1, kintree_table.shape[1]):
        j1, j2 = int(kintree_table[0][i]), int(kintree_table[1][i])
        color = lcolor if i % 2 == 0 else rcolor
        cv2.line(out, tuple(pts[j1]), tuple(pts[j2]), color, thickness=2)
        cv2.circle(out, tuple(pts[j1]), 4, color, -1)
        cv2.circle(out, tuple(pts[j2]), 4, color, -1)
    return out


H36M_17_CONNECTIONS = [
    (0, 1), (1, 2), (2, 3), (0, 4), (4, 5), (5, 6), (0, 7), (7, 8),
    (8, 9), (9, 10), (8, 11), (11, 12), (12, 13), (8, 14), (14, 15),
    (15, 16),
]
_H36M_17_LEFT = np.array(
    [0, 0, 0, 1, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0], dtype=bool)


def show_3d_pose(joints3d: np.ndarray, ax, radius: float = 40.0,
                 lcolor: str = "#ff0000", rcolor: str = "#0000ff"):
    """Plot a 17-joint h36m-topology 3D pose on a matplotlib 3D axis,
    root-centered cube limits (reference vis.py:166-187)."""
    vals = np.asarray(joints3d)
    for ind, (i, j) in enumerate(H36M_17_CONNECTIONS):
        seg = np.stack([vals[i], vals[j]])
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], lw=2,
                c=lcolor if _H36M_17_LEFT[ind] else rcolor)
    xr, yr, zr = vals[0, :3]
    ax.set_xlim3d([xr - radius, xr + radius])
    ax.set_ylim3d([yr - radius, yr + radius])
    ax.set_zlim3d([zr - radius, zr + radius])
    ax.set_xlabel("x")
    ax.set_ylabel("y")
    ax.set_zlabel("z")


def visualize_sequence(sequence: np.ndarray, radius: float = 0.6) -> np.ndarray:
    """Render a (T, 17*3) or (T, 17, 3) pose sequence to a (T, H, W, 3)
    uint8 frame stack (reference vis.py:190-207 animates the same views
    interactively with plt.pause; headless hosts get the frames instead —
    feed them to demo_utils.images_to_video for a clip)."""
    import matplotlib

    matplotlib.use("Agg", force=False)
    import matplotlib.pyplot as plt

    seq = np.asarray(sequence)
    seq = seq.reshape((seq.shape[0], -1, 3))
    frames = []
    fig = plt.figure(figsize=(4, 4))
    try:
        for pose in seq:
            ax = fig.add_subplot(111, projection="3d")
            show_3d_pose(pose, ax, radius=radius)
            ax.view_init(-75, -90)
            fig.canvas.draw()
            buf = np.asarray(fig.canvas.buffer_rgba())[:, :, :3]
            frames.append(buf.copy())
            fig.clf()
    finally:
        plt.close(fig)
    return np.stack(frames)


# --------------------------------------------------------------------------- #
# mesh-overlay batch grids (parity: /root/reference/lib/utils/vis.py:209-426 —
# visualize_preds/batch_visualize_preds/batch_visualize_vid_preds), composed
# from the GL-free rasterizer in utils/renderer.py.
# --------------------------------------------------------------------------- #

def _axis_angle_rotation(angle_deg: float, axis) -> np.ndarray:
    """Rodrigues rotation matrix for the reference's side-view render
    (render_image(angle=90, axis=[0,1,0]))."""
    axis = np.asarray(axis, np.float64)
    axis = axis / max(np.linalg.norm(axis), 1e-12)
    th = np.deg2rad(angle_deg)
    K = np.array([[0, -axis[2], axis[1]],
                  [axis[2], 0, -axis[0]],
                  [-axis[1], axis[0], 0]])
    return (np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)).astype(np.float32)


def render_mesh_overlay(img: np.ndarray, verts: np.ndarray, cam: np.ndarray,
                        faces: np.ndarray, angle: float | None = None,
                        axis=None, color=(0.9, 0.5, 0.4)) -> np.ndarray:
    """Composite a weak-perspective SMPL mesh onto a uint8 image.

    cam is the model's (s, tx, ty) weak-perspective triple
    (pred_theta[:3]); angle/axis rotate the mesh about its centroid first
    (the reference's rotated side view)."""
    from maed_tpu.utils.renderer import Renderer

    verts = np.asarray(verts, np.float32)
    if angle is not None:
        R = _axis_angle_rotation(angle, axis if axis is not None else [0, 1, 0])
        center = verts.mean(axis=0, keepdims=True)
        verts = (verts - center) @ R.T + center
    s, tx, ty = np.asarray(cam, np.float32)[:3]
    h, w = img.shape[:2]
    return Renderer(resolution=(w, h)).render(
        img, verts, np.asarray(faces), np.array([s, s, tx, ty], np.float32),
        color=color,
    )


def visualize_preds(image: np.ndarray, preds: dict, faces: np.ndarray,
                    target: dict | None = None,
                    normalized_image: bool = True) -> np.ndarray:
    """One sample's inspection strip:
    [image | pred skeleton | (target skeleton) | mesh render | side render]
    — the reference's visualize_preds panel layout (vis.py:209-269).

    preds: per-sample {'theta' (85,), 'kp_2d' (K, 2|3), 'verts' (V, 3)};
    target (optional): {'kp_2d' (K, 2|3)}. image: (H, W, 3) ImageNet-
    normalized float (normalized_image=True) or uint8."""
    img = denormalize_image(image) if normalized_image else image.copy()

    cam = np.asarray(preds["theta"])[:3]
    kp = np.asarray(preds["kp_2d"])
    if kp.shape[-1] == 2:
        kp = np.concatenate([kp, np.ones_like(kp[:, :1])], axis=-1)
    panels = [img, draw_skeleton(img, kp)]
    if target is not None and "kp_2d" in target:
        panels.append(draw_skeleton(img, np.asarray(target["kp_2d"])))
    verts = np.asarray(preds["verts"])
    panels.append(render_mesh_overlay(img, verts, cam, faces))
    panels.append(render_mesh_overlay(
        np.zeros_like(img), verts, cam, faces, angle=90, axis=[0, 1, 0]))
    return np.hstack(panels)


def batch_visualize_preds(images: np.ndarray, preds: dict, faces: np.ndarray,
                          target: dict | None = None, max_images: int = 16,
                          idxs=None) -> np.ndarray:
    """(N, H, W, 3) batch -> one vertically-stacked strip per sample
    (reference vis.py:272-311)."""
    n = min(len(images), max_images)
    rows = []
    for i in (range(n) if idxs is None else idxs):
        p = {k: np.asarray(v)[i] for k, v in preds.items()}
        t = None if target is None else {k: np.asarray(v)[i] for k, v in target.items()}
        rows.append(visualize_preds(images[i], p, faces, t))
    return np.vstack(rows)


def batch_visualize_vid_preds(video: np.ndarray, preds: dict, faces: np.ndarray,
                              target: dict | None = None,
                              max_video: int = 4) -> np.ndarray:
    """(N, T, H, W, 3) clips -> (N', T, H', W', 3) uint8 prediction video
    grid (reference vis.py:314-365, NHWC instead of NCHW)."""
    video = np.asarray(video)[:max_video]
    n, t = video.shape[:2]
    out = []
    for b in range(n):
        frames = []
        for i in range(t):
            p = {k: np.asarray(v)[b, i] for k, v in preds.items()}
            tg = None if target is None else {
                k: np.asarray(v)[b, i] for k, v in target.items()}
            frames.append(visualize_preds(video[b, i], p, faces, tg))
        out.append(np.stack(frames))
    return np.stack(out)
