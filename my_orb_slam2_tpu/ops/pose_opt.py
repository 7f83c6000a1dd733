"""Single-pose optimization: batched Levenberg-Marquardt over reprojection
residuals (replaces reference Optimizer::PoseOptimization,
src/Optimizer.cc:245-457, which drives g2o with unary SE3 edges).

The reference runs 4 rounds x 10 LM iterations, reclassifying inliers by
chi2 between rounds (thresholds 5.991 mono / 7.815 stereo) and dropping the
Huber kernel for the final round. Here each round is a lax.fori_loop of LM
steps over *all* residuals at once: per-observation 2x6 (mono) or 3x6
(stereo) analytic Jacobians, IRLS Huber weights, a 6x6 normal-equation solve,
and a left-multiplicative se3 update T <- exp(dx) @ T.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815

# Position of H[j, l] within the packed 21-entry upper-triangular sum list.
import numpy as _np

_H_IDX = _np.zeros((6, 6), _np.int32)
_k = 0
for _j in range(6):
    for _l in range(_j, 6):
        _H_IDX[_j, _l] = _k
        _H_IDX[_l, _j] = _k
        _k += 1


def _residuals_and_jac(Tcw, pts_w, uv, ur, fx, fy, cx, cy, bf):
    """Per-observation residual (3,) and Jacobian (3, 6) wrt left-mult xi.

    Row 2 (the stereo u_r residual) is valid only where ur >= 0; the caller
    masks it. Residual = prediction - measurement.
    """
    R = Tcw[:3, :3]
    t = Tcw[:3, 3]
    pc = pts_w @ R.T + t  # (N, 3)
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u_pred = fx * x * iz + cx
    v_pred = fy * y * iz + cy
    ur_pred = u_pred - bf * iz
    r = jnp.stack([u_pred - uv[:, 0], v_pred - uv[:, 1], ur_pred - ur], axis=1)

    # d(pc)/d(xi) with xi = [ups, omega], T <- exp(xi) T: dpc = dups + domega x pc
    # => J_pc = [I_3 | -hat(pc)] per point.
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    # J_proj: rows du/dpc, dv/dpc, dur/dpc  (N, 3, 3)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=1)
    dur = du + jnp.stack([zero, zero, bf * iz2], axis=1)
    J_proj = jnp.stack([du, dv, dur], axis=1)  # (N, 3, 3)
    # J_pc: (N, 3, 6)
    hat_pc = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=1),
            jnp.stack([z, zero, -x], axis=1),
            jnp.stack([-y, x, zero], axis=1),
        ],
        axis=1,
    )
    I3 = jnp.broadcast_to(jnp.eye(3), hat_pc.shape)
    J_pc = jnp.concatenate([I3, -hat_pc], axis=2)  # (N, 3, 6)
    J = J_proj @ J_pc  # (N, 3, 6)
    return r, J, z


def _inv3(M):
    """Closed-form 3x3 inverse (adjugate) — pure elementwise, fuses."""
    a, b, c = M[0, 0], M[0, 1], M[0, 2]
    d, e, f = M[1, 0], M[1, 1], M[1, 2]
    g, h, i = M[2, 0], M[2, 1], M[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.array(
        [
            [A, -(b * i - c * h), b * f - c * e],
            [B, a * i - c * g, -(a * f - c * d)],
            [C, -(a * h - b * g), a * e - b * d],
        ]
    )
    return adj * inv_det


def _solve6(H, b):
    """Solve the damped 6x6 normal system by 3x3 block Schur elimination:
    jnp.linalg.solve lowers to a serial LU custom-call that cannot fuse —
    at 40 unrolled LM iterations per pose optimization those calls were the
    long tail of the tracking dispatch. The block form is pure elementwise
    math that fuses into the surrounding iteration."""
    A = H[:3, :3]
    B = H[:3, 3:]
    C = H[3:, 3:]
    b1, b2 = b[:3], b[3:]
    Ai = _inv3(A)
    S = C - B.T @ Ai @ B
    Si = _inv3(S)
    x2 = Si @ (b2 - B.T @ (Ai @ b1))
    x1 = Ai @ (b1 - B @ x2)
    return jnp.concatenate([x1, x2])


def _chi2(r, inv_sigma2, is_stereo):
    """Per-observation chi2: mono uses rows 0-1, stereo rows 0-2."""
    e2 = r[:, 0] ** 2 + r[:, 1] ** 2 + jnp.where(is_stereo, r[:, 2] ** 2, 0.0)
    return e2 * inv_sigma2


@partial(jax.jit, static_argnames=("n_rounds", "n_iters"))
def pose_optimization(
    Tcw0,
    pts_w,
    uv,
    ur,
    inv_sigma2,
    mask,
    fx,
    fy,
    cx,
    cy,
    bf,
    n_rounds: int = 4,
    n_iters: int = 10,
):
    """Optimize a world->camera pose against fixed 3D points.

    Args:
      Tcw0: (4,4) initial pose.
      pts_w: (N,3) matched MapPoint positions.
      uv: (N,2) observed pixels; ur: (N,) observed right-u (-1 if mono).
      inv_sigma2: (N,) information weight of the keypoint octave.
      mask: (N,) valid-match mask.

    Returns dict(Tcw, inliers (N,), n_inliers, chi2 (N,)).
    """
    is_stereo = ur >= 0.0
    chi2_th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    delta_huber = jnp.sqrt(chi2_th)

    def lm_round(round_i, state):
        Tcw, inlier = state
        use_huber = round_i < (n_rounds - 1)  # final round: plain LSQ

        def lm_iter(inner):
            # Damping-feedback LM with ONE residual pass per iteration: the
            # cost at the trial pose comes from the pass that also builds
            # the normal equations, lambda adapts against the previous
            # iteration's cost, and a worsening trial rolls back to the
            # backup pose (reusing the stale linearization for one damped
            # step — see ops/ba.py lm_step for the same scheme).
            #
            # All per-observation quantities are (N,) PLANES: (N, 3, 6)
            # Jacobian tensors tile-pad their trailing dims to the (8, 128)
            # lane layout on the target chip (~18x the logical bytes), and
            # this body runs 40 unrolled times per pose — the plane form
            # moves only the logical bytes (see ops/ba.py lm_step for the
            # measured effect on the dense BA step).
            Tcw, Tcw_bak, cost_prev, lam, it, last_dx = inner
            R = Tcw[:3, :3]
            t = Tcw[:3, 3]
            pc = pts_w @ R.T + t  # (N, 3)
            x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
            z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
            iz = 1.0 / z_safe
            iz2 = iz * iz
            ru = fx * x * iz + cx - uv[:, 0]
            rv = fy * y * iz + cy - uv[:, 1]
            rr = fx * x * iz + cx - bf * iz - ur
            r3 = (ru, rv, rr)
            c2 = (ru * ru + rv * rv + jnp.where(is_stereo, rr * rr, 0.0)) * inv_sigma2
            e = jnp.sqrt(jnp.maximum(c2, 1e-12))
            rho = jnp.where(
                use_huber & (e > delta_huber),
                2.0 * delta_huber * e - delta_huber * delta_huber,
                c2,
            )
            cost_now = jnp.sum(rho * mask * inlier * (z > 0))
            improved = cost_now <= cost_prev
            Tcw = jnp.where(improved, Tcw, Tcw_bak)
            lam = jnp.where(improved, lam * 0.5, lam * 4.0)
            cost_best = jnp.minimum(cost_now, cost_prev)
            # Huber IRLS weight on the residual norm (rho'(s) implemented as
            # w = delta/|e| beyond the kink).
            w_huber = jnp.where(use_huber & (e > delta_huber), delta_huber / e, 1.0)
            w = inv_sigma2 * w_huber * mask * inlier * (z > 0)
            roww = (w, w, w * is_stereo)
            # J rows as planes: translational cols = projection Jacobian,
            # rotational cols j = -(g . hat(pc)[:, j]).
            zero = jnp.zeros_like(x)
            g_rows = (
                (fx * iz, zero, -fx * x * iz2),
                (zero, fy * iz, -fy * y * iz2),
                (fx * iz, zero, -fx * x * iz2 + bf * iz2),
            )
            hat = ((zero, -z, y), (z, zero, -x), (-y, x, zero))
            J_pl = [[None] * 6 for _ in range(3)]
            for i in range(3):
                g = g_rows[i]
                for j in range(3):
                    J_pl[i][j] = g[j]
                for j in range(3):
                    J_pl[i][3 + j] = -(
                        g[0] * hat[0][j] + g[1] * hat[1][j] + g[2] * hat[2][j]
                    )
            # H (21 upper entries) + b (6): one stacked (27, N) reduction.
            planes = [
                sum(roww[i] * J_pl[i][j] * J_pl[i][l] for i in range(3))
                for j in range(6)
                for l in range(j, 6)
            ] + [
                -sum(roww[i] * J_pl[i][j] * r3[i] for i in range(3))
                for j in range(6)
            ]
            red = jnp.sum(jnp.stack(planes), axis=1)  # (27,)
            H = red[_H_IDX]  # (6, 6) symmetric gather from the 21 triu sums
            b = red[21:27]
            H_lm = H + lam * jnp.diag(jnp.diagonal(H)) + 1e-9 * jnp.eye(6)
            dx = _solve6(H_lm, b)
            T_new = lie.se3_exp(dx) @ Tcw
            dx_norm = jnp.where(improved, jnp.linalg.norm(dx), last_dx)
            return (T_new, Tcw, cost_best, lam, it + 1, dx_norm)

        # UNROLLED (n_iters static): a lax.while_loop iteration carries a
        # fixed ~0.25 ms of loop overhead on the target chip — 10x the
        # body's actual math at N=2048 — so the early-exit "optimization"
        # cost more than the tail it saved. Straight-line iterations fuse
        # into a handful of kernels.
        big = jnp.float32(3.4e38)
        carry = (Tcw, Tcw, big, jnp.float32(1e-4), jnp.int32(0),
                 jnp.float32(1.0))
        for _ in range(n_iters):
            carry = lm_iter(carry)
        _trial, Tcw, _, _, _, _ = carry
        # Reclassify inliers for the next round (reference
        # src/Optimizer.cc:390-444: outliers by chi2, depth must be positive).
        r, _, z = _residuals_and_jac(Tcw, pts_w, uv, ur, fx, fy, cx, cy, bf)
        c2 = _chi2(r, inv_sigma2, is_stereo)
        inlier = (c2 <= chi2_th) & (z > 0) & mask
        return (Tcw, inlier.astype(jnp.float32))

    # Outer rounds unrolled too: `use_huber` becomes static per round, so
    # the final round's plain-LSQ branch constant-folds instead of being
    # selected per element.
    state = (Tcw0, mask.astype(jnp.float32))
    for round_i in range(n_rounds):
        state = lm_round(round_i, state)
    Tcw, inlier = state
    r, _, z = _residuals_and_jac(Tcw, pts_w, uv, ur, fx, fy, cx, cy, bf)
    c2 = _chi2(r, inv_sigma2, is_stereo)
    inliers = (c2 <= chi2_th) & (z > 0) & mask
    return {
        "Tcw": Tcw,
        "inliers": inliers,
        "n_inliers": jnp.sum(inliers),
        "chi2": c2,
    }
