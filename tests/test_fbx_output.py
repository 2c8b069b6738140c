"""fbx_output: keyframing math validated against a recording fake `bpy`
(Blender is not installable in this image; the math — quaternion conversion,
the reference's Pelvis location formula, start_origin offset — is what can
regress silently).

Parity target: /root/reference/lib/utils/fbx_output.py:94-113 (per-frame
Pelvis LOCATION keyframes from trans) and :115-131 (rotation keyframes).
"""

import sys
import types

import numpy as np
import pytest

from maed_tpu.utils.fbx_output import BONE_NAMES, rodrigues_to_quat


def test_rodrigues_to_quat():
    # identity
    np.testing.assert_allclose(rodrigues_to_quat([0, 0, 0]), [1, 0, 0, 0])
    # 90 deg about z
    q = rodrigues_to_quat([0, 0, np.pi / 2])
    np.testing.assert_allclose(q, [np.cos(np.pi / 4), 0, 0, np.sin(np.pi / 4)],
                               atol=1e-7)


class _Vec:
    def __init__(self, xyz):
        # accept tuples, arrays, or another _Vec (the product code wraps
        # the edit bone's head, which this fake stores as _Vec)
        self.v = np.asarray(list(xyz), np.float64)

    def __sub__(self, other):
        return _Vec(self.v - other.v)

    def __iter__(self):
        return iter(self.v)


class _Bone:
    def __init__(self, head=(0.0, 0.0, 0.0)):
        self.head = tuple(head)
        self.location = None
        self.rotation_mode = None
        self.rotation_quaternion = None
        self.keyframes = {"location": [], "rotation_quaternion": []}

    def keyframe_insert(self, channel, frame):
        val = self.location if channel == "location" else self.rotation_quaternion
        self.keyframes[channel].append((frame, tuple(val)))


def _install_fake_bpy(monkeypatch, pelvis_head=(0.0, 90.0, 1.0)):
    bones = {f"m_avg_{n}": _Bone() for n in BONE_NAMES}
    bones["m_avg_Pelvis"] = _Bone(head=pelvis_head)

    class _Obj:
        def __init__(self):
            self.pose = types.SimpleNamespace(bones=bones)
            self.data = types.SimpleNamespace(
                edit_bones={k: types.SimpleNamespace(head=_Vec(b.head))
                            for k, b in bones.items()})

        def select_set(self, v):
            pass

    armature = _Obj()
    scene = types.SimpleNamespace(
        render=types.SimpleNamespace(fps=0), frame_start=0, frame_end=0,
        frame_set=lambda f: None)
    ops_ns = lambda **kw: types.SimpleNamespace(**kw)
    bpy = types.SimpleNamespace(
        data=types.SimpleNamespace(
            scenes={"Scene": scene}, objects={"Armature": armature},
            armatures=[armature.data]),
        ops=ops_ns(
            object=ops_ns(delete=lambda: None, mode_set=lambda mode: None),
            import_scene=ops_ns(fbx=lambda filepath: None),
            export_scene=ops_ns(fbx=lambda **kw: None),
        ),
        context=types.SimpleNamespace(
            view_layer=types.SimpleNamespace(
                objects=types.SimpleNamespace(active=None))),
    )
    mathutils = types.SimpleNamespace(Quaternion=lambda q: tuple(q),
                                      Vector=_Vec)
    monkeypatch.setitem(sys.modules, "bpy", bpy)
    monkeypatch.setitem(sys.modules, "mathutils", mathutils)
    return bones


def test_export_keyframes_rotations_and_translation(monkeypatch, tmp_path):
    from maed_tpu.utils.fbx_output import export_fbx

    bones = _install_fake_bpy(monkeypatch, pelvis_head=(0.0, 90.0, 1.0))
    T = 3
    rng = np.random.RandomState(0)
    poses = rng.randn(T, 72).astype(np.float32) * 0.3
    trans = np.array([[0.1, 0.2, 0.3],
                      [0.4, 0.5, 0.6],
                      [0.7, 0.8, 0.9]], np.float32)
    export_fbx(poses, str(tmp_path / "o.fbx"), "template.fbx", trans=trans)

    pelvis = bones["m_avg_Pelvis"]
    # every frame keyframed both channels
    assert [f for f, _ in pelvis.keyframes["location"]] == [1, 2, 3]
    assert len(pelvis.keyframes["rotation_quaternion"]) == T
    # reference formula: location = 100*(ty, tz, tx) - rest pelvis head
    _, loc0 = pelvis.keyframes["location"][0]
    np.testing.assert_allclose(
        loc0, (100 * 0.2 - 0.0, 100 * 0.3 - 90.0, 100 * 0.1 - 1.0), atol=1e-5)
    # a non-root bone got rotations only
    knee = bones["m_avg_L_Knee"]
    assert len(knee.keyframes["rotation_quaternion"]) == T
    assert knee.keyframes["location"] == []
    # quaternion matches rodrigues_to_quat of the stored pose
    _, q0 = knee.keyframes["rotation_quaternion"][0]
    np.testing.assert_allclose(
        q0, rodrigues_to_quat(poses[0].reshape(24, 3)[BONE_NAMES.index("L_Knee")]),
        atol=1e-7)


def test_export_zero_trans_default_keeps_rotation_only(monkeypatch, tmp_path):
    from maed_tpu.utils.fbx_output import export_fbx

    bones = _install_fake_bpy(monkeypatch)
    poses = np.zeros((2, 72), np.float32)
    export_fbx(poses, str(tmp_path / "o.fbx"), "template.fbx")
    assert bones["m_avg_Pelvis"].keyframes["location"] == []
    assert len(bones["m_avg_Pelvis"].keyframes["rotation_quaternion"]) == 2


def test_export_start_origin(monkeypatch, tmp_path):
    from maed_tpu.utils.fbx_output import export_fbx

    bones = _install_fake_bpy(monkeypatch, pelvis_head=(0.0, 0.0, 0.0))
    poses = np.zeros((2, 72), np.float32)
    trans = np.array([[1.0, 2.0, 3.0], [1.5, 2.5, 3.5]], np.float32)
    export_fbx(poses, str(tmp_path / "o.fbx"), "template.fbx", trans=trans,
               start_origin=True)
    locs = [l for _, l in bones["m_avg_Pelvis"].keyframes["location"]]
    # frame 0's (x, y) subtracted; z kept (reference start_origin semantics)
    np.testing.assert_allclose(locs[0], (0.0, 300.0, 0.0), atol=1e-5)
    np.testing.assert_allclose(locs[1], (50.0, 350.0, 50.0), atol=1e-5)


def test_trans_length_mismatch_raises(monkeypatch, tmp_path):
    from maed_tpu.utils.fbx_output import export_fbx

    _install_fake_bpy(monkeypatch)
    with pytest.raises(ValueError, match="frames"):
        export_fbx(np.zeros((3, 72)), str(tmp_path / "o.fbx"), "t.fbx",
                   trans=np.zeros((2, 3)))
