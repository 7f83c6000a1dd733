"""SO(3) / SE(3) / Sim(3) Lie-group operations as pure JAX functions.

These replace the reference's g2o `SE3Quat` (Thirdparty/g2o/g2o/types/se3quat.h)
and `Sim3` (Thirdparty/g2o/g2o/types/sim3.h) types: instead of quaternion
objects with operator overloading, every pose is a plain array —

- SO3: 3x3 rotation matrix
- SE3: (4, 4) homogeneous transform (row [0,0,0,1] at the bottom)
- Sim3: (R: (3,3), t: (3,), s: scalar) triple packed as a (4, 4) matrix whose
  upper-left block is s*R (this matches how the reference converts Sim3->SE3
  by dividing translation by scale, reference src/LoopClosing.cc:597-606)

Tangent conventions (for optimizer updates):
- se3 tangent xi = [rho(3), phi(3)]: translation then rotation, matching
  g2o::SE3Quat::exp ordering... we use [upsilon, omega] with exp in the
  *left-multiplicative* update convention T_new = exp(xi) @ T_old.
- sim3 tangent = [rho(3), phi(3), sigma(1)] with scale s = exp(sigma)
  (Strasdat's formulation, same as g2o Sim3 used by the reference's
  OptimizeEssentialGraph / OptimizeSim3, src/Optimizer.cc:787,1070).

All functions are unbatched and intended to be used under `jax.vmap`; all are
numerically guarded for the small-angle limit so they are jit/grad safe.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(v):
    """so(3) hat operator: 3-vector -> skew-symmetric matrix."""
    x, y, z = v[0], v[1], v[2]
    zero = jnp.zeros_like(x)
    return jnp.array(
        [
            [zero, -z, y],
            [z, zero, -x],
            [-y, x, zero],
        ]
    )


def vee(m):
    """Inverse of hat: skew-symmetric matrix -> 3-vector."""
    return jnp.array([m[2, 1], m[0, 2], m[1, 0]])


def _sinc(x):
    """sin(x)/x, stable at 0."""
    return jnp.where(jnp.abs(x) < _EPS, 1.0 - x * x / 6.0, jnp.sin(x) / jnp.where(jnp.abs(x) < _EPS, 1.0, x))


def so3_exp(phi):
    """Rodrigues formula: axis-angle 3-vector -> rotation matrix."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    # sin(t)/t and (1-cos t)/t^2 with series fallbacks
    a = _sinc(theta)
    b = jnp.where(theta < 1e-4, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    return jnp.eye(3) + a * K + b * (K @ K)


def so3_log(R):
    """Rotation matrix -> axis-angle 3-vector (theta in [0, pi]).

    Via the branch-free quaternion conversion: phi = 2 atan2(|qv|, qw) *
    qv/|qv|, which is accurate over the whole rotation range including the
    near-pi region where the classic (R - R^T)/(2 sin) formula degrades.
    """
    q = rotation_to_quaternion(R)  # (x, y, z, w)
    qv = q[:3]
    qw = q[3]
    # Shortest rotation: flip sign so qw >= 0.
    sgn = jnp.where(qw < 0.0, -1.0, 1.0)
    qv = qv * sgn
    qw = qw * sgn
    n = jnp.sqrt(jnp.maximum(jnp.dot(qv, qv), _EPS * _EPS))
    theta = 2.0 * jnp.arctan2(n, qw)
    # phi = theta * qv / n; small-angle series: 2 qv / qw * (1 + n^2/(3 qw^2))
    scale = jnp.where(n < 1e-6, 2.0 / jnp.maximum(qw, _EPS), theta / n)
    return scale * qv


def _so3_left_jacobian(phi):
    """Left Jacobian J_l of SO(3): exp((J_l v)^) integrates translation."""
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    b = jnp.where(theta < 1e-4, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / jnp.maximum(theta2, _EPS * _EPS))
    c = jnp.where(
        theta < 1e-4,
        1.0 / 6.0 - theta2 / 120.0,
        (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS * _EPS),
    )
    return jnp.eye(3) + b * K + c * (K @ K)


def _so3_left_jacobian_inv(phi):
    theta2 = jnp.dot(phi, phi)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(phi)
    half = 0.5
    cot_term = jnp.where(
        theta < 1e-4,
        1.0 / 12.0 + theta2 / 720.0,
        (1.0 / jnp.maximum(theta2, _EPS * _EPS))
        * (1.0 - theta * jnp.cos(theta * 0.5) / jnp.maximum(2.0 * jnp.sin(theta * 0.5), _EPS)),
    )
    return jnp.eye(3) - half * K + cot_term * (K @ K)


# ---------------------------------------------------------------------------
# SE(3)
# ---------------------------------------------------------------------------


def se3_from_Rt(R, t):
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def se3_R(T):
    return T[:3, :3]


def se3_t(T):
    return T[:3, 3]


def se3_identity(dtype=jnp.float32):
    return jnp.eye(4, dtype=dtype)


def se3_inverse(T):
    R = T[:3, :3]
    t = T[:3, 3]
    return se3_from_Rt(R.T, -R.T @ t)


def se3_orthonormalize(T):
    """Project the rotation block back onto SO(3) (Gram-Schmidt rows).

    Pose chains multiply f32 matrices every frame; left-multiplicative
    exp-updates preserve any non-orthogonal component of the initial guess,
    and transpose-based inverses then AMPLIFY it geometrically. One
    projection per frame keeps the chain rigid indefinitely.
    """
    r0 = T[0, :3]
    r1 = T[1, :3]
    r0 = r0 / jnp.linalg.norm(r0)
    r1 = r1 - jnp.dot(r1, r0) * r0
    r1 = r1 / jnp.linalg.norm(r1)
    r2 = jnp.cross(r0, r1)
    R = jnp.stack([r0, r1, r2])
    return se3_from_Rt(R, T[:3, 3])


def se3_exp(xi):
    """xi = [upsilon(3), omega(3)] -> 4x4 transform."""
    ups, omg = xi[:3], xi[3:6]
    R = so3_exp(omg)
    t = _so3_left_jacobian(omg) @ ups
    return se3_from_Rt(R, t)


def se3_log(T):
    phi = so3_log(T[:3, :3])
    ups = _so3_left_jacobian_inv(phi) @ T[:3, 3]
    return jnp.concatenate([ups, phi])


def se3_apply(T, p):
    """Transform 3-point(s): works for p of shape (3,) or (..., 3)."""
    return p @ T[:3, :3].T + T[:3, 3]


# ---------------------------------------------------------------------------
# Sim(3)
# ---------------------------------------------------------------------------


def sim3_from_Rts(R, t, s):
    """Pack Sim3 as (4,4) with upper-left s*R."""
    T = jnp.eye(4, dtype=R.dtype)
    T = T.at[:3, :3].set(s * R)
    T = T.at[:3, 3].set(t)
    return T


def sim3_scale(S):
    """Recover scale as cube root of det(sR)."""
    d = jnp.linalg.det(S[:3, :3])
    return jnp.cbrt(jnp.maximum(d, _EPS))


def sim3_R(S):
    return S[:3, :3] / sim3_scale(S)


def sim3_t(S):
    return S[:3, 3]


def sim3_inverse(S):
    s = sim3_scale(S)
    R = S[:3, :3] / s
    t = S[:3, 3]
    return sim3_from_Rts(R.T, -(R.T @ t) / s, 1.0 / s)


def sim3_apply(S, p):
    return p @ S[:3, :3].T + S[:3, 3]


def sim3_mul(S1, S2):
    """Composition: (s1 R1, t1) * (s2 R2, t2) = (s1 s2 R1 R2, s1 R1 t2 + t1).

    With the sR packing this is plain 4x4 matrix multiplication.
    """
    return S1 @ S2


def sim3_to_se3(S):
    """Sim3 -> SE3 by stripping scale into translation (t /= s), matching the
    reference's loop-correction conversion (src/LoopClosing.cc:597-606)."""
    s = sim3_scale(S)
    R = S[:3, :3] / s
    t = S[:3, 3] / s
    return se3_from_Rt(R, t)


def sim3_exp(xi):
    """xi = [upsilon(3), omega(3), sigma] -> Sim3 (4,4).

    Uses the W matrix of Strasdat: t = W @ upsilon where W generalizes the
    SO3 left Jacobian with the scale term.
    """
    ups, omg, sigma = xi[:3], xi[3:6], xi[6]
    s = jnp.exp(sigma)
    R = so3_exp(omg)
    theta2 = jnp.dot(omg, omg)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(omg)

    sigma2 = sigma * sigma
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-4

    # A = coefficient of K, B = coefficient of K^2, C = coefficient of I
    C = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma2 / 6.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))

    denom_t2 = jnp.maximum(theta2, _EPS * _EPS)
    denom_s = jnp.where(small_sigma, 1.0, sigma)

    # General case expressions (guarded)
    sig2_t2 = sigma2 + theta2
    a_gen = (s * jnp.sin(theta) * sigma + (1.0 - s * jnp.cos(theta)) * theta) / jnp.maximum(theta * sig2_t2, _EPS)
    b_gen = (
        C
        - ((s * jnp.cos(theta) - 1.0) * sigma + s * jnp.sin(theta) * theta) / jnp.maximum(sig2_t2, _EPS)
    ) / denom_t2
    # sigma -> 0 limits
    a_sig0 = jnp.where(small_theta, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / denom_t2)
    b_sig0 = jnp.where(
        small_theta, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS)
    )
    # theta -> 0, sigma != 0 limits
    a_th0 = jnp.where(small_sigma, 0.5, ((sigma - 1.0) * s + 1.0) / jnp.maximum(sigma2, _EPS))
    b_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s * 0.5 * sigma2 + s - 1.0 - sigma * s) / jnp.maximum(sigma2 * denom_s, _EPS),
    )

    A = jnp.where(small_sigma, a_sig0, jnp.where(small_theta, a_th0, a_gen))
    B = jnp.where(small_sigma, b_sig0, jnp.where(small_theta, b_th0, b_gen))

    W = C * jnp.eye(3) + A * K + B * (K @ K)
    t = W @ ups
    return sim3_from_Rts(R, t, s)


def sim3_log(S):
    """Sim3 (4,4) -> tangent 7-vector. Inverse of sim3_exp (W solve)."""
    s = sim3_scale(S)
    R = S[:3, :3] / s
    t = S[:3, 3]
    sigma = jnp.log(s)
    omg = so3_log(R)
    # Rebuild W as in sim3_exp and solve W ups = t.
    xi_tmp = jnp.concatenate([jnp.zeros(3, dtype=S.dtype), omg, sigma[None]])
    # Reuse the exp-side W computation by calling with unit upsilon basis.
    W = _sim3_W(omg, sigma)
    ups = jnp.linalg.solve(W, t)
    return jnp.concatenate([ups, omg, sigma[None]])


def _sim3_W(omg, sigma):
    theta2 = jnp.dot(omg, omg)
    theta = jnp.sqrt(theta2 + _EPS * _EPS)
    K = hat(omg)
    s = jnp.exp(sigma)
    sigma2 = sigma * sigma
    small_sigma = jnp.abs(sigma) < 1e-5
    small_theta = theta < 1e-4
    C = jnp.where(small_sigma, 1.0 + sigma / 2.0 + sigma2 / 6.0, (s - 1.0) / jnp.where(small_sigma, 1.0, sigma))
    denom_t2 = jnp.maximum(theta2, _EPS * _EPS)
    denom_s = jnp.where(small_sigma, 1.0, sigma)
    sig2_t2 = sigma2 + theta2
    a_gen = (s * jnp.sin(theta) * sigma + (1.0 - s * jnp.cos(theta)) * theta) / jnp.maximum(theta * sig2_t2, _EPS)
    b_gen = (
        C - ((s * jnp.cos(theta) - 1.0) * sigma + s * jnp.sin(theta) * theta) / jnp.maximum(sig2_t2, _EPS)
    ) / denom_t2
    a_sig0 = jnp.where(small_theta, 0.5 - theta2 / 24.0, (1.0 - jnp.cos(theta)) / denom_t2)
    b_sig0 = jnp.where(
        small_theta, 1.0 / 6.0 - theta2 / 120.0, (theta - jnp.sin(theta)) / jnp.maximum(theta2 * theta, _EPS)
    )
    a_th0 = jnp.where(small_sigma, 0.5, ((sigma - 1.0) * s + 1.0) / jnp.maximum(sigma2, _EPS))
    b_th0 = jnp.where(
        small_sigma,
        1.0 / 6.0,
        (s * 0.5 * sigma2 + s - 1.0 - sigma * s) / jnp.maximum(sigma2 * denom_s, _EPS),
    )
    A = jnp.where(small_sigma, a_sig0, jnp.where(small_theta, a_th0, a_gen))
    B = jnp.where(small_sigma, b_sig0, jnp.where(small_theta, b_th0, b_gen))
    return C * jnp.eye(3) + A * K + B * (K @ K)


# Batched variants -----------------------------------------------------------

so3_exp_b = jax.vmap(so3_exp)
so3_log_b = jax.vmap(so3_log)
se3_exp_b = jax.vmap(se3_exp)
se3_log_b = jax.vmap(se3_log)
se3_inverse_b = jax.vmap(se3_inverse)
sim3_exp_b = jax.vmap(sim3_exp)
sim3_log_b = jax.vmap(sim3_log)
sim3_inverse_b = jax.vmap(sim3_inverse)


def rotation_to_quaternion(R):
    """Rotation matrix -> quaternion (x, y, z, w), TUM trajectory order.

    Replaces reference Converter::toQuaternion (src/Converter.cc:139-151).
    Branch-free Shepperd-style selection of the most stable component.
    """
    m00, m01, m02 = R[0, 0], R[0, 1], R[0, 2]
    m10, m11, m12 = R[1, 0], R[1, 1], R[1, 2]
    m20, m21, m22 = R[2, 0], R[2, 1], R[2, 2]
    tr = m00 + m11 + m22

    def case_w(_):
        S = jnp.sqrt(jnp.maximum(tr + 1.0, 1e-12)) * 2.0
        return jnp.array([(m21 - m12) / S, (m02 - m20) / S, (m10 - m01) / S, 0.25 * S])

    def case_x(_):
        S = jnp.sqrt(jnp.maximum(1.0 + m00 - m11 - m22, 1e-12)) * 2.0
        return jnp.array([0.25 * S, (m01 + m10) / S, (m02 + m20) / S, (m21 - m12) / S])

    def case_y(_):
        S = jnp.sqrt(jnp.maximum(1.0 + m11 - m00 - m22, 1e-12)) * 2.0
        return jnp.array([(m01 + m10) / S, 0.25 * S, (m12 + m21) / S, (m02 - m20) / S])

    def case_z(_):
        S = jnp.sqrt(jnp.maximum(1.0 + m22 - m00 - m11, 1e-12)) * 2.0
        return jnp.array([(m02 + m20) / S, (m12 + m21) / S, 0.25 * S, (m10 - m01) / S])

    idx = jnp.where(
        tr > 0.0,
        0,
        jnp.where((m00 > m11) & (m00 > m22), 1, jnp.where(m11 > m22, 2, 3)),
    )
    return jax.lax.switch(idx, [case_w, case_x, case_y, case_z], None)
