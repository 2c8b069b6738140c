from maed_tpu.ops.geometry import (
    rodrigues,
    quat_to_rotmat,
    rotmat_to_quat,
    quat_to_aa,
    rotmat_to_aa,
    rot6d_to_rotmat,
    weak_perspective_projection,
    perspective_projection,
    estimate_translation,
)
from maed_tpu.ops.procrustes import batch_similarity_transform
