"""Unit tests for SO3/SE3/Sim3 against closed-form ground truth."""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.ops import lie


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_so3_exp_log_roundtrip(rng):
    for scale in [1e-8, 1e-4, 0.1, 1.0, 3.0]:
        phi = rng.normal(size=3)
        phi = phi / np.linalg.norm(phi) * scale
        R = lie.so3_exp(jnp.asarray(phi))
        # Orthonormality
        np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-5)
        phi2 = np.asarray(lie.so3_log(R))
        np.testing.assert_allclose(phi2, phi, atol=1e-4)


def test_so3_log_near_pi(rng):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    phi = axis * (np.pi - 1e-3)
    R = lie.so3_exp(jnp.asarray(phi))
    phi2 = np.asarray(lie.so3_log(R))
    np.testing.assert_allclose(phi2, phi, atol=1e-2)


def test_se3_exp_log_roundtrip(rng):
    for _ in range(10):
        xi = rng.normal(size=6)
        T = lie.se3_exp(jnp.asarray(xi))
        xi2 = np.asarray(lie.se3_log(T))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_se3_inverse(rng):
    xi = rng.normal(size=6)
    T = lie.se3_exp(jnp.asarray(xi))
    I = np.asarray(T @ lie.se3_inverse(T))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_se3_apply_matches_matmul(rng):
    xi = rng.normal(size=6)
    T = lie.se3_exp(jnp.asarray(xi))
    p = rng.normal(size=(7, 3))
    got = np.asarray(lie.se3_apply(T, jnp.asarray(p)))
    ph = np.concatenate([p, np.ones((7, 1))], axis=1)
    want = (np.asarray(T) @ ph.T).T[:, :3]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_sim3_exp_log_roundtrip(rng):
    for scale_sigma in [0.0, 1e-7, 0.3, -0.5]:
        xi = rng.normal(size=7) * 0.5
        xi[6] = scale_sigma
        S = lie.sim3_exp(jnp.asarray(xi))
        s = float(lie.sim3_scale(S))
        np.testing.assert_allclose(s, np.exp(scale_sigma), rtol=1e-4)
        xi2 = np.asarray(lie.sim3_log(S))
        np.testing.assert_allclose(xi2, xi, atol=1e-4)


def test_sim3_mul_and_inverse(rng):
    xi1 = rng.normal(size=7) * 0.3
    xi2 = rng.normal(size=7) * 0.3
    S1 = lie.sim3_exp(jnp.asarray(xi1))
    S2 = lie.sim3_exp(jnp.asarray(xi2))
    S12 = lie.sim3_mul(S1, S2)
    p = rng.normal(size=3)
    want = np.asarray(lie.sim3_apply(S1, lie.sim3_apply(S2, jnp.asarray(p))))
    got = np.asarray(lie.sim3_apply(S12, jnp.asarray(p)))
    np.testing.assert_allclose(got, want, atol=1e-5)
    I = np.asarray(lie.sim3_mul(S1, lie.sim3_inverse(S1)))
    np.testing.assert_allclose(I, np.eye(4), atol=1e-5)


def test_sim3_to_se3(rng):
    xi = rng.normal(size=7) * 0.3
    S = lie.sim3_exp(jnp.asarray(xi))
    T = lie.sim3_to_se3(S)
    R = np.asarray(T[:3, :3])
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(T[:3, 3]), np.asarray(S[:3, 3]) / float(lie.sim3_scale(S)), atol=1e-5
    )


def test_quaternion(rng):
    R = random_rotation(rng)
    q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(R)))
    x, y, z, w = q
    R2 = np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )
    np.testing.assert_allclose(R2, R, atol=1e-5)
