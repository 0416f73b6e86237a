"""Rotation conversion tests: round-trips + parity with the reference's
vendored PyTorch3D helpers."""

import sys

import numpy as np
import jax.numpy as jnp
import pytest

from livelyspeaker_tpu.ops import rotation as R
from conftest import REFERENCE_ROOT, requires_reference


def _random_rotations(rng, n):
    """Uniform-ish random rotation matrices via QR."""
    a = rng.normal(size=(n, 3, 3))
    q, r = np.linalg.qr(a)
    d = np.sign(np.diagonal(r, axis1=-2, axis2=-1))
    q = q * d[:, None, :]
    det = np.linalg.det(q)
    q[det < 0, :, 0] *= -1
    return q.astype(np.float32)


def test_quaternion_matrix_roundtrip(rng_np):
    m = _random_rotations(rng_np, 32)
    q = R.matrix_to_quaternion(jnp.asarray(m))
    m2 = R.quaternion_to_matrix(q)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)


def test_rot6d_roundtrip(rng_np):
    m = _random_rotations(rng_np, 32)
    d6 = R.matrix_to_rotation_6d(jnp.asarray(m))
    assert d6.shape == (32, 6)
    m2 = R.rotation_6d_to_matrix(d6)
    np.testing.assert_allclose(np.asarray(m2), m, atol=1e-5)


@pytest.mark.parametrize("conv", ["XYZ", "ZYX", "ZXY"])
def test_euler_matrix_roundtrip(rng_np, conv):
    angles = rng_np.uniform(-1.2, 1.2, size=(16, 3)).astype(np.float32)
    m = R.euler_angles_to_matrix(jnp.asarray(angles), conv)
    a2 = R.matrix_to_euler_angles(m, conv)
    np.testing.assert_allclose(np.asarray(a2), angles, atol=1e-4)


def test_axis_angle_roundtrip(rng_np):
    # keep |angle| < pi: larger rotations can't round-trip through a matrix
    axis = rng_np.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=-1, keepdims=True)
    angle = rng_np.uniform(0.05, 3.0, size=(16, 1))
    aa = (axis * angle).astype(np.float32)
    m = R.axis_angle_to_matrix(jnp.asarray(aa))
    aa2 = R.matrix_to_axis_angle(m)
    np.testing.assert_allclose(np.asarray(aa2), aa, atol=1e-4)


def test_rot6d_gram_schmidt_robustness(rng_np):
    """Arbitrary (non-orthogonal) 6d inputs must still produce valid
    rotations."""
    d6 = rng_np.normal(size=(16, 6)).astype(np.float32)
    m = np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6)))
    eye = m @ m.transpose(0, 2, 1)
    np.testing.assert_allclose(eye, np.eye(3)[None].repeat(16, 0), atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(m), 1.0, atol=1e-5)


@requires_reference
def test_parity_with_reference_helpers(rng_np):
    import torch

    sys.path.insert(0, f"{REFERENCE_ROOT}/scripts")
    from mdm_utils import rotation_conversions as RC

    m = _random_rotations(rng_np, 24)
    tm = torch.from_numpy(m)

    np.testing.assert_allclose(
        np.asarray(R.matrix_to_rotation_6d(jnp.asarray(m))),
        RC.matrix_to_rotation_6d(tm).numpy(),
        atol=1e-5,
    )
    d6 = rng_np.normal(size=(24, 6)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(R.rotation_6d_to_matrix(jnp.asarray(d6))),
        RC.rotation_6d_to_matrix(torch.from_numpy(d6)).numpy(),
        atol=1e-5,
    )
    for conv in ("XYZ", "ZYX"):
        angles = rng_np.uniform(-1.2, 1.2, size=(8, 3)).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(R.euler_angles_to_matrix(jnp.asarray(angles), conv)),
            RC.euler_angles_to_matrix(torch.from_numpy(angles), conv).numpy(),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(R.matrix_to_euler_angles(jnp.asarray(m), conv)),
            RC.matrix_to_euler_angles(tm, conv).numpy(),
            atol=1e-4,
        )
    # quaternions compare up to sign (ours is canonicalised to w >= 0)
    ours_q = np.asarray(R.matrix_to_quaternion(jnp.asarray(m)))
    ref_q = RC.matrix_to_quaternion(tm).numpy()
    sign = np.sign(np.sum(ours_q * ref_q, axis=-1, keepdims=True))
    np.testing.assert_allclose(ours_q, ref_q * sign, atol=1e-4)
