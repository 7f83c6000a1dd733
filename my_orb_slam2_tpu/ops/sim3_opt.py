"""Sim3 relative-pose optimization between two keyframes.

Replaces reference Optimizer::OptimizeSim3 (src/Optimizer.cc:1070-1265):
a single 7-dof Sim3 vertex with paired forward/inverse projection edges —
matched MapPoints expressed in each camera frame, projected into the other
image through S12 / S12^-1. Huber IRLS, LM, with a chi2 prune (th2 = 10)
between two stages, exactly mirroring the reference's 5 -> prune -> 10/5
iteration schedule.

Jacobians come from forward-mode autodiff of the residual wrt the
left-multiplied tangent increment (7 params, 4 residuals per pair — ideal
jacfwd shape), vmapped over all pairs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie

CHI2_TH = 10.0  # reference th2 (src/Optimizer.cc:1180)


def _residual_pair(delta, S12, p1_c1, p2_c2, uv1, uv2, fx, fy, cx, cy, fix_scale):
    """4-vector residual for one matched pair under S = exp(delta) @ S12."""
    d = jnp.where(fix_scale, delta.at[6].set(0.0), delta)
    S = lie.sim3_mul(lie.sim3_exp(d), S12)
    S_inv = lie.sim3_inverse(S)

    def proj(p):
        z = jnp.where(jnp.abs(p[2]) > 1e-9, p[2], 1e-9)
        return jnp.array([fx * p[0] / z + cx, fy * p[1] / z + cy])

    e1 = proj(lie.sim3_apply(S, p2_c2)) - uv1
    e2 = proj(lie.sim3_apply(S_inv, p1_c1)) - uv2
    return jnp.concatenate([e1, e2])


@functools.partial(jax.jit, static_argnames=("n_iters1", "n_iters2", "fix_scale"))
def optimize_sim3(
    S12_0,
    p1_c1,
    p2_c2,
    uv1,
    uv2,
    inv_sigma2_1,
    inv_sigma2_2,
    mask,
    fx,
    fy,
    cx,
    cy,
    fix_scale: bool = False,
    n_iters1: int = 5,
    n_iters2: int = 10,
):
    """Returns dict(S12, inliers, n_inliers).

    Args:
      p1_c1/p2_c2: (M, 3) matched MapPoints in camera-1 / camera-2 frames.
      uv1/uv2: (M, 2) observed pixels in image 1 / image 2.
      inv_sigma2_*: (M,) octave information weights.
    """
    M = p1_c1.shape[0]
    zero = jnp.zeros(7)

    res_fn = lambda d, i: _residual_pair(
        d, jnp.eye(4), p1_c1[i], p2_c2[i], uv1[i], uv2[i], fx, fy, cx, cy, fix_scale
    )

    def residuals_and_J(S12):
        def one(p1, p2, u1, u2):
            f = lambda d: _residual_pair(d, S12, p1, p2, u1, u2, fx, fy, cx, cy, fix_scale)
            r = f(zero)
            J = jax.jacfwd(f)(zero)
            return r, J

        return jax.vmap(one)(p1_c1, p2_c2, uv1, uv2)

    def chi2_parts(r):
        c1 = (r[:, 0] ** 2 + r[:, 1] ** 2) * inv_sigma2_1
        c2 = (r[:, 2] ** 2 + r[:, 3] ** 2) * inv_sigma2_2
        return c1, c2

    delta_h = jnp.sqrt(CHI2_TH)

    def lm_stage(S12, active, n_iters):
        def step(_, carry):
            S12, lam = carry
            r, J = residuals_and_J(S12)  # (M,4), (M,4,7)
            c1, c2 = chi2_parts(r)
            w1 = inv_sigma2_1 * active
            w2 = inv_sigma2_2 * active
            e1 = jnp.sqrt(jnp.maximum(c1, 1e-12))
            e2 = jnp.sqrt(jnp.maximum(c2, 1e-12))
            w1 = w1 * jnp.where(e1 > delta_h, delta_h / e1, 1.0)
            w2 = w2 * jnp.where(e2 > delta_h, delta_h / e2, 1.0)
            row_w = jnp.stack([w1, w1, w2, w2], axis=1)  # (M,4)
            Jw = J * row_w[:, :, None]
            H = jnp.einsum("mij,mik->jk", Jw, J)
            b = -jnp.einsum("mij,mi->j", Jw, r)
            H = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(7)
            d = jnp.linalg.solve(H, b)
            d = jnp.where(fix_scale, d.at[6].set(0.0), d)
            S_new = lie.sim3_mul(lie.sim3_exp(d), S12)

            def cost(S):
                r2, _ = residuals_and_J(S)
                c1n, c2n = chi2_parts(r2)
                h = lambda c: jnp.where(
                    jnp.sqrt(jnp.maximum(c, 1e-12)) > delta_h,
                    2 * delta_h * jnp.sqrt(jnp.maximum(c, 1e-12)) - CHI2_TH,
                    c,
                )
                return jnp.sum((h(c1n) + h(c2n)) * active)

            improved = cost(S_new) < cost(S12)
            S12 = jnp.where(improved, S_new, S12)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            return (S12, lam)

        S12, _ = jax.lax.fori_loop(0, n_iters, step, (S12, jnp.float32(1e-4)))
        return S12

    active = mask.astype(jnp.float32)
    S12 = lm_stage(S12_0, active, n_iters1)
    r, _ = residuals_and_J(S12)
    c1, c2 = chi2_parts(r)
    inlier = mask & (c1 <= CHI2_TH) & (c2 <= CHI2_TH)
    S12 = lm_stage(S12, inlier.astype(jnp.float32), n_iters2)
    r, _ = residuals_and_J(S12)
    c1, c2 = chi2_parts(r)
    inliers = mask & (c1 <= CHI2_TH) & (c2 <= CHI2_TH)
    return {"S12": S12, "inliers": inliers, "n_inliers": jnp.sum(inliers)}
