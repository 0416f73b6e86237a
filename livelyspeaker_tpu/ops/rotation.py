"""3D rotation conversions in jnp (quaternion / matrix / euler / axis-angle /
rot6d).

Functional equivalents of the PyTorch3D-lineage helpers the reference vendors
four times over (``scripts/mdm_utils/rotation_conversions.py``,
``scripts_beat/dataloaders/rot_utils.py`` etc.): the BEAT pipeline stores
motion as rot6d (process_cache.py:16-56) and exports euler for BVH/metrics
(test_RAG_beat.py:100-101).  All functions broadcast over leading axes and
jit/grad cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "quaternion_to_matrix",
    "matrix_to_quaternion",
    "euler_angles_to_matrix",
    "matrix_to_euler_angles",
    "axis_angle_to_quaternion",
    "quaternion_to_axis_angle",
    "axis_angle_to_matrix",
    "matrix_to_axis_angle",
    "rotation_6d_to_matrix",
    "matrix_to_rotation_6d",
]


def quaternion_to_matrix(quaternions: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) real-first quaternions -> [..., 3, 3]."""
    r, i, j, k = jnp.moveaxis(quaternions, -1, 0)
    two_s = 2.0 / jnp.sum(quaternions * quaternions, axis=-1)
    m = jnp.stack(
        [
            1 - two_s * (j * j + k * k),
            two_s * (i * j - k * r),
            two_s * (i * k + j * r),
            two_s * (i * j + k * r),
            1 - two_s * (i * i + k * k),
            two_s * (j * k - i * r),
            two_s * (i * k - j * r),
            two_s * (j * k + i * r),
            1 - two_s * (i * i + j * j),
        ],
        axis=-1,
    )
    return m.reshape(quaternions.shape[:-1] + (3, 3))


def _sqrt_positive_part(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] real-first unit quaternions (stable
    branch-select form)."""
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    q_abs = _sqrt_positive_part(
        jnp.stack(
            [
                1.0 + m00 + m11 + m22,
                1.0 + m00 - m11 - m22,
                1.0 - m00 + m11 - m22,
                1.0 - m00 - m11 + m22,
            ],
            axis=-1,
        )
    )
    quat_by_rijk = jnp.stack(
        [
            jnp.stack([q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], -1),
            jnp.stack([m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], -1),
            jnp.stack([m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], -1),
            jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], -1),
        ],
        axis=-2,
    )
    flr = jnp.asarray(0.1, matrix.dtype)
    quat_candidates = quat_by_rijk / (
        2.0 * jnp.maximum(q_abs[..., None], flr)
    )
    best = jnp.argmax(q_abs, axis=-1)
    out = jnp.take_along_axis(
        quat_candidates, best[..., None, None].repeat(4, -1), axis=-2
    )[..., 0, :]
    out = out / jnp.linalg.norm(out, axis=-1, keepdims=True)
    # canonical sign: non-negative real part (q and -q are the same rotation)
    return out * jnp.where(out[..., :1] < 0, -1.0, 1.0)


def _axis_angle_rotation(axis: str, angle: jnp.ndarray) -> jnp.ndarray:
    cos, sin = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(angle), jnp.zeros_like(angle)
    if axis == "X":
        flat = (one, zero, zero, zero, cos, -sin, zero, sin, cos)
    elif axis == "Y":
        flat = (cos, zero, sin, zero, one, zero, -sin, zero, cos)
    elif axis == "Z":
        flat = (cos, -sin, zero, sin, cos, zero, zero, zero, one)
    else:
        raise ValueError(f"invalid axis {axis}")
    return jnp.stack(flat, axis=-1).reshape(angle.shape + (3, 3))


def euler_angles_to_matrix(euler_angles: jnp.ndarray, convention: str) -> jnp.ndarray:
    """[..., 3] intrinsic euler angles -> [..., 3, 3]
    (R = R1(c1) @ R2(c2) @ R3(c3))."""
    assert len(convention) == 3
    matrices = [
        _axis_angle_rotation(c, euler_angles[..., i])
        for i, c in enumerate(convention)
    ]
    return matrices[0] @ matrices[1] @ matrices[2]


def _angle_from_tan(axis, other_axis, data, horizontal, tait_bryan):
    i1, i2 = {"X": (2, 1), "Y": (0, 2), "Z": (1, 0)}[axis]
    if horizontal:
        i2, i1 = i1, i2
    even = (axis + other_axis) in ("XY", "YZ", "ZX")
    if horizontal == even:
        return jnp.arctan2(data[..., i1], data[..., i2])
    if tait_bryan:
        return jnp.arctan2(-data[..., i2], data[..., i1])
    return jnp.arctan2(data[..., i2], -data[..., i1])


def matrix_to_euler_angles(matrix: jnp.ndarray, convention: str) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 3] intrinsic euler angles."""
    assert len(convention) == 3
    i0 = "XYZ".index(convention[0])
    i2 = "XYZ".index(convention[2])
    tait_bryan = i0 != i2
    if tait_bryan:
        central = jnp.arcsin(
            jnp.clip(
                matrix[..., i0, i2] * (-1.0 if i0 - i2 in (-1, 2) else 1.0),
                -1.0,
                1.0,
            )
        )
    else:
        central = jnp.arccos(jnp.clip(matrix[..., i0, i0], -1.0, 1.0))
    o = (
        _angle_from_tan(
            convention[0], convention[1], matrix[..., i2], False, tait_bryan
        ),
        central,
        _angle_from_tan(
            convention[2], convention[1], matrix[..., i0, :], True, tait_bryan
        ),
    )
    return jnp.stack(o, axis=-1)


def axis_angle_to_quaternion(axis_angle: jnp.ndarray) -> jnp.ndarray:
    angles = jnp.linalg.norm(axis_angle, axis=-1, keepdims=True)
    half = angles * 0.5
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small, 0.5 - (angles * angles) / 48, jnp.sin(half) / jnp.maximum(angles, eps)
    )
    return jnp.concatenate(
        [jnp.cos(half), axis_angle * sin_half_over], axis=-1
    )


def quaternion_to_axis_angle(quaternions: jnp.ndarray) -> jnp.ndarray:
    norms = jnp.linalg.norm(quaternions[..., 1:], axis=-1, keepdims=True)
    half_angles = jnp.arctan2(norms, quaternions[..., :1])
    angles = 2 * half_angles
    eps = 1e-6
    small = jnp.abs(angles) < eps
    sin_half_over = jnp.where(
        small,
        0.5 - (angles * angles) / 48,
        jnp.sin(half_angles) / jnp.where(small, 1.0, angles),
    )
    return quaternions[..., 1:] / sin_half_over


def axis_angle_to_matrix(axis_angle: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_matrix(axis_angle_to_quaternion(axis_angle))


def matrix_to_axis_angle(matrix: jnp.ndarray) -> jnp.ndarray:
    return quaternion_to_axis_angle(matrix_to_quaternion(matrix))


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """[..., 6] (first two matrix rows) -> [..., 3, 3] via Gram-Schmidt
    (Zhou et al. CVPR'19; rotation_conversions.py rotation_6d_to_matrix)."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = a1 / jnp.linalg.norm(a1, axis=-1, keepdims=True)
    b2 = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = b2 / jnp.linalg.norm(b2, axis=-1, keepdims=True)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


def matrix_to_rotation_6d(matrix: jnp.ndarray) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 6]: the first two rows flattened."""
    return matrix[..., :2, :].reshape(matrix.shape[:-2] + (6,))
