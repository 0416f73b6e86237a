"""TED skeleton math: direction-vector <-> joint-position conversions.

Vectorised jnp re-design of ``scripts/utils/data_utils.py:77-120``.  The TED
representation is 9 unit direction vectors (bone directions) for a 10-joint
upper body; poses are recovered by cumulative FK along the (static) adjacency
with fixed bone lengths.  The per-pair Python loops of the reference become
a single segment-matmul so batches of any size FK on the MXU/VPU.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "DIR_VEC_PAIRS",
    "MEAN_DIR_VEC",
    "MEAN_POSE",
    "convert_dir_vec_to_pose",
    "convert_pose_seq_to_dir_vec",
    "normalize_dir_vec",
]

# (parent, child, bone_length) — data_utils.py:14-15
DIR_VEC_PAIRS = (
    (0, 1, 0.26),
    (1, 2, 0.18),
    (2, 3, 0.14),
    (1, 4, 0.22),
    (4, 5, 0.36),
    (5, 6, 0.33),
    (1, 7, 0.22),
    (7, 8, 0.36),
    (8, 9, 0.33),
)

# Dataset normalisation constants (train_utils/ted_loader.py:17-18).
MEAN_DIR_VEC = np.array([
    0.0154009, -0.9690125, -0.0884354, -0.0022264, -0.8655276, 0.4342174,
    -0.0035145, -0.8755367, -0.4121039, -0.9236511, 0.3061306, -0.0012415,
    -0.5155854, 0.8129665, 0.0871897, 0.2348464, 0.1846561, 0.8091402,
    0.9271948, 0.2960011, -0.013189, 0.5233978, 0.8092403, 0.0725451,
    -0.2037076, 0.1924306, 0.8196916,
], dtype=np.float32)

MEAN_POSE = np.array([
    0.0000306, 0.0004946, 0.0008437, 0.0033759, -0.2051629, -0.0143453,
    0.0031566, -0.3054764, 0.0411491, 0.0029072, -0.4254303, -0.001311,
    -0.1458413, -0.1505532, -0.0138192, -0.2835603, 0.0670333, 0.0107002,
    -0.2280813, 0.112117, 0.2087789, 0.1523502, -0.1521499, -0.0161503,
    0.291909, 0.0644232, 0.0040145, 0.2452035, 0.1115339, 0.2051307,
], dtype=np.float32)


def _fk_matrix() -> np.ndarray:
    """[10, 9] accumulation matrix A with joint_pos = A @ (len * dir_vec).

    Row j holds 1 for every bone on the path root->joint j, so the cumulative
    FK loop of ``convert_dir_vec_to_pose`` (data_utils.py:77-98) becomes one
    matmul.
    """
    n_joints = 10
    a = np.zeros((n_joints, len(DIR_VEC_PAIRS)), dtype=np.float32)
    for b, (parent, child, _) in enumerate(DIR_VEC_PAIRS):
        a[child] = a[parent]
        a[child, b] = 1.0
    return a


_FK_A = _fk_matrix()
_BONE_LEN = np.array([p[2] for p in DIR_VEC_PAIRS], dtype=np.float32)


def convert_dir_vec_to_pose(vec: jnp.ndarray) -> jnp.ndarray:
    """[..., 9, 3] (or [..., 27]) unit direction vectors -> [..., 10, 3]
    joint positions (data_utils.py:77-98)."""
    vec = jnp.asarray(vec)
    if vec.shape[-1] != 3:
        vec = vec.reshape(vec.shape[:-1] + (-1, 3))
    scaled = vec * jnp.asarray(_BONE_LEN)[:, None]
    return jnp.einsum("jb,...bc->...jc", jnp.asarray(_FK_A), scaled)


def normalize_dir_vec(vec: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """Unit-normalise along the last axis (sklearn ``normalize`` semantics:
    zero vectors stay zero)."""
    norm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    return vec / jnp.maximum(norm, eps)


def convert_pose_seq_to_dir_vec(pose: jnp.ndarray) -> jnp.ndarray:
    """[..., 10, 3] (or [..., 30]) joint positions -> [..., 9, 3] unit
    direction vectors (data_utils.py:101-120)."""
    pose = jnp.asarray(pose)
    if pose.shape[-1] != 3:
        pose = pose.reshape(pose.shape[:-1] + (-1, 3))
    parents = jnp.asarray([p[0] for p in DIR_VEC_PAIRS])
    children = jnp.asarray([p[1] for p in DIR_VEC_PAIRS])
    vec = jnp.take(pose, children, axis=-2) - jnp.take(pose, parents, axis=-2)
    return normalize_dir_vec(vec)
