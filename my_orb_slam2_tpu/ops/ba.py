"""Bundle adjustment: Schur-complement Levenberg-Marquardt in pure JAX.

This is the TPU-native replacement of g2o's BlockSolver_6_3 + LM pipeline
(reference Thirdparty/g2o/g2o/core/block_solver.h, driven by
Optimizer::BundleAdjustment / LocalBundleAdjustment, src/Optimizer.cc:49,459):

- The problem is a flat observation list (obs_cam, obs_pt, uv, ur, weights,
  mask) over C camera vertices and P landmark vertices — the SoA form of
  g2o's edge set. All shapes static; masked entries are no-ops.
- Each LM step builds the block system by segment reductions:
    U_c   = sum_{o: cam=c} Jc_o^T W_o Jc_o          (C, 6, 6)
    V_p   = sum_{o: pt=p}  Jp_o^T W_o Jp_o          (P, 3, 3)
    W_o   = Jc_o^T W_o Jp_o                         (O, 6, 3)
  and solves the landmark-marginalized (Schur) camera system
    S dx = b~,  S = U - W V^-1 W^T
  with matrix-free preconditioned CG: S is never materialized — each CG
  matvec is two gathers + two segment-sums over the observation axis, which
  is exactly the layout that distributes over a device mesh by sharding the
  observation axis and psum-ing the (C, 6) products (see parallel/dist_ba.py).
- Landmark updates by back-substitution with batched 3x3 inverses.
- Huber IRLS (delta = sqrt(5.991) mono / sqrt(7.815) stereo, reference
  src/Optimizer.cc:85-86,528-530) and chi2 outlier classification between
  stages (reference two-stage 5+10 iteration schedule with outlier demotion,
  src/Optimizer.cc:665-715) via `classify_outliers`.

Gauge fixing: `cam_fixed` masks camera updates (reference setFixed on KF0 /
anchor keyframes).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie

CHI2_MONO = 5.991
CHI2_STEREO = 7.815


class BAProblem(NamedTuple):
    """Static-shape bundle adjustment problem (the g2o graph equivalent)."""

    cam_Tcw: jnp.ndarray  # (C, 4, 4)
    cam_fixed: jnp.ndarray  # (C,) bool
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    obs_cam: jnp.ndarray  # (O,) i32 camera index
    obs_pt: jnp.ndarray  # (O,) i32 point index
    obs_uv: jnp.ndarray  # (O, 2)
    obs_ur: jnp.ndarray  # (O,) right-u or -1
    obs_inv_sigma2: jnp.ndarray  # (O,)
    obs_mask: jnp.ndarray  # (O,) bool


def _residuals(cam_Tcw, pt_pos, prob: BAProblem, fx, fy, cx, cy, bf):
    """Per-observation residual (O, 3), Jacobians (O, 3, 6) cam / (O, 3, 3)
    point, and camera-frame depth (O,)."""
    T = cam_Tcw[prob.obs_cam]  # (O, 4, 4)
    p = pt_pos[prob.obs_pt]  # (O, 3)
    R = T[:, :3, :3]
    t = T[:, :3, 3]
    pc = jnp.einsum("oij,oj->oi", R, p) + t
    x, y, z = pc[:, 0], pc[:, 1], pc[:, 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u_pred = fx * x * iz + cx
    v_pred = fy * y * iz + cy
    ur_pred = u_pred - bf * iz
    r = jnp.stack(
        [u_pred - prob.obs_uv[:, 0], v_pred - prob.obs_uv[:, 1], ur_pred - prob.obs_ur],
        axis=1,
    )
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=1)
    dur = du + jnp.stack([zero, zero, bf * iz2], axis=1)
    J_proj = jnp.stack([du, dv, dur], axis=1)  # (O, 3, 3)
    hat_pc = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=1),
            jnp.stack([z, zero, -x], axis=1),
            jnp.stack([-y, x, zero], axis=1),
        ],
        axis=1,
    )
    I3 = jnp.broadcast_to(jnp.eye(3), hat_pc.shape)
    J_cam = J_proj @ jnp.concatenate([I3, -hat_pc], axis=2)  # (O, 3, 6)
    J_pt = J_proj @ R  # (O, 3, 3)
    return r, J_cam, J_pt, z


def _chi2(r, inv_sigma2, is_stereo):
    e2 = r[:, 0] ** 2 + r[:, 1] ** 2 + jnp.where(is_stereo, r[:, 2] ** 2, 0.0)
    return e2 * inv_sigma2


def _robust_cost(c2, delta, use_huber):
    s = jnp.sqrt(jnp.maximum(c2, 1e-12))
    return jnp.where(use_huber & (s > delta), 2.0 * delta * s - delta * delta, c2)


@jax.jit
def classify_outliers(prob: BAProblem, fx, fy, cx, cy, bf):
    """chi2 + positive-depth observation gating (reference
    src/Optimizer.cc:668-683,717-745). Returns updated obs_mask."""
    r, _, _, z = _residuals(prob.cam_Tcw, prob.pt_pos, prob, fx, fy, cx, cy, bf)
    is_stereo = prob.obs_ur >= 0
    c2 = _chi2(r, prob.obs_inv_sigma2, is_stereo)
    th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    return prob.obs_mask & (c2 <= th) & (z > 0)


def _inv3x3(M):
    """Batched 3x3 inverse with damping guard — closed-form adjugate
    (pure elementwise VPU math; jnp.linalg.inv lowers to LU, which is
    sequential per matrix and slow on TPU for large batches)."""
    M = M + 1e-9 * jnp.eye(3)
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    D = -(b * i - c * h)
    E = a * i - c * g
    F = -(a * h - b * g)
    G = b * f - c * e
    H = -(a * f - c * d)
    I = a * e - b * d
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-20, det, 1e-20)
    adj = jnp.stack(
        [
            jnp.stack([A, D, G], axis=-1),
            jnp.stack([B, E, H], axis=-1),
            jnp.stack([C, F, I], axis=-1),
        ],
        axis=-2,
    )
    return adj * inv_det[..., None, None]


def _inv6x6(M):
    return jnp.linalg.inv(M + 1e-9 * jnp.eye(6))


@partial(jax.jit, static_argnames=("n_iters", "cg_iters", "use_huber", "return_lam"))
def bundle_adjust(
    prob: BAProblem,
    fx,
    fy,
    cx,
    cy,
    bf,
    n_iters: int = 10,
    cg_iters: int = 48,
    use_huber: bool = True,
    lam0: float = 1e-4,
    return_lam: bool = False,
):
    """Run n_iters LM steps; returns updated BAProblem (poses + points).

    Each step: build block system -> Schur-reduce -> PCG on cameras ->
    back-substitute points -> accept/reject by robust cost.

    With return_lam=True also returns the final LM damping so the schedule
    can be CHUNKED into separate dispatches (asynchronous global BA runs one
    LM iteration per dispatch, interleaving with tracking on the device
    stream — the single-chip analog of the reference's stoppable GBA thread,
    src/Optimizer.cc:65-66 setForceStopFlag).
    """
    C = prob.cam_Tcw.shape[0]
    P = prob.pt_pos.shape[0]
    is_stereo = prob.obs_ur >= 0
    delta = jnp.sqrt(jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO))
    free_cam = (~prob.cam_fixed).astype(jnp.float32)[:, None]  # (C, 1)
    free_pt = prob.pt_valid.astype(jnp.float32)[:, None]

    def total_cost(cam_Tcw, pt_pos):
        r, _, _, z = _residuals(cam_Tcw, pt_pos, prob, fx, fy, cx, cy, bf)
        c2 = _chi2(r, prob.obs_inv_sigma2, is_stereo)
        rho = _robust_cost(c2, delta, use_huber)
        return jnp.sum(rho * prob.obs_mask * (z > 0))

    def lm_step(_, carry):
        cam_Tcw, pt_pos, lam, cost_cur = carry
        r, J_cam, J_pt, z = _residuals(cam_Tcw, pt_pos, prob, fx, fy, cx, cy, bf)
        c2 = _chi2(r, prob.obs_inv_sigma2, is_stereo)
        e = jnp.sqrt(jnp.maximum(c2, 1e-12))
        w_huber = jnp.where(use_huber & (e > delta), delta / e, 1.0)
        w = prob.obs_inv_sigma2 * w_huber * prob.obs_mask * (z > 0)
        row_w = jnp.stack([w, w, w * is_stereo], axis=1)  # (O, 3)
        Jc_w = J_cam * row_w[:, :, None]  # (O, 3, 6)
        Jp_w = J_pt * row_w[:, :, None]  # (O, 3, 3)

        U = jnp.zeros((C, 6, 6)).at[prob.obs_cam].add(
            jnp.einsum("oij,oik->ojk", Jc_w, J_cam)
        )
        V = jnp.zeros((P, 3, 3)).at[prob.obs_pt].add(
            jnp.einsum("oij,oik->ojk", Jp_w, J_pt)
        )
        Wo = jnp.einsum("oij,oik->ojk", Jc_w, J_pt)  # (O, 6, 3)
        b_c = jnp.zeros((C, 6)).at[prob.obs_cam].add(-jnp.einsum("oij,oi->oj", Jc_w, r))
        b_p = jnp.zeros((P, 3)).at[prob.obs_pt].add(-jnp.einsum("oij,oi->oj", Jp_w, r))

        # LM damping (multiplicative on the diagonal).
        U_d = U + lam * jax.vmap(jnp.diag)(jnp.diagonal(U, axis1=1, axis2=2))
        V_d = V + lam * jax.vmap(jnp.diag)(jnp.diagonal(V, axis1=1, axis2=2))
        V_inv = _inv3x3(V_d)

        # Schur RHS: b~ = b_c - W V^-1 b_p
        Vb = jnp.einsum("pij,pj->pi", V_inv, b_p)  # (P, 3)
        WVb = jnp.einsum("oij,oj->oi", Wo, Vb[prob.obs_pt])  # (O, 6)
        b_red = b_c - jnp.zeros((C, 6)).at[prob.obs_cam].add(WVb)

        def S_matvec(x):  # x: (C, 6)
            x = x * free_cam.reshape(C, 1)
            t1 = jnp.einsum("cij,cj->ci", U_d, x)
            Wx = jnp.einsum("oij,oi->oj", Wo, x[prob.obs_cam])  # (O, 3)
            y = jnp.zeros((P, 3)).at[prob.obs_pt].add(Wx)
            y = jnp.einsum("pij,pj->pi", V_inv, y)
            t2 = jnp.zeros((C, 6)).at[prob.obs_cam].add(
                jnp.einsum("oij,oj->oi", Wo, y[prob.obs_pt])
            )
            return (t1 - t2) * free_cam.reshape(C, 1)

        M_inv = _inv6x6(U_d)  # block-Jacobi preconditioner

        def precond(x):
            return jnp.einsum("cij,cj->ci", M_inv, x) * free_cam.reshape(C, 1)

        b_eff = b_red * free_cam.reshape(C, 1)

        if C * 6 <= 512 and P * C <= (1 << 21):  # block table stays < ~150MB
            # Small camera window (local BA): materialize the reduced Schur
            # system ANALYTICALLY. The camera-camera coupling of the Schur
            # complement is sum_p B_p V_p^-1 B_p^T where B_p stacks the W
            # blocks of point p's observers — one scatter into a
            # (P, C, 6, 3) block table + two MXU einsums, instead of 6C
            # batched S_matvec applications (each a fresh scatter pass over
            # the observation axis).
            D = C * 6
            with jax.default_matmul_precision("highest"):
                B = jnp.zeros((P, C, 6, 3)).at[prob.obs_pt, prob.obs_cam].add(Wo)
                T = jnp.einsum("pcij,pjk->pcik", B, V_inv)
                S = -jnp.einsum("pcik,pdjk->cidj", T, B)
                S = S + jnp.einsum("cij,cd->cidj", U_d, jnp.eye(C))
                S = S.reshape(D, D)
                # Pin singular rows with an identity diagonal: fixed cameras
                # AND free cameras with no observations in this window (zero
                # U diagonal) — CG leaves both at zero implicitly, a dense
                # solve would NaN.
                live = jnp.repeat(free_cam[:, 0], 6) * (jnp.diagonal(S) > 1e-10)
                S = S * (live[:, None] * live[None, :]) + jnp.diag(1.0 - live)
                rhs = b_eff.reshape(D) * live
                dx_c = jnp.linalg.solve(S, rhs).reshape(C, 6)
            dx_c = dx_c * free_cam.reshape(C, 1)
            # Belt-and-braces: a non-finite solve must not poison the state
            # (the LM accept test would propagate NaN through jnp.where).
            dx_c = jnp.where(jnp.isfinite(dx_c), dx_c, 0.0)
        else:
            # Large problems (global BA): matrix-free preconditioned CG —
            # materializing S would need (6C)^2 memory and a (D, P, 3)
            # intermediate per batched matvec.
            def cg_body(_, cg):
                x, rr, pdir, rz = cg
                Sp = S_matvec(pdir)
                denom = jnp.sum(pdir * Sp)
                alpha = jnp.where(jnp.abs(denom) > 1e-12, rz / denom, 0.0)
                x = x + alpha * pdir
                rr = rr - alpha * Sp
                zz = precond(rr)
                rz_new = jnp.sum(rr * zz)
                beta = jnp.where(jnp.abs(rz) > 1e-12, rz_new / rz, 0.0)
                pdir = zz + beta * pdir
                return (x, rr, pdir, rz_new)

            x0 = jnp.zeros((C, 6))
            r0 = b_eff
            z0 = precond(r0)
            cg0 = (x0, r0, z0, jnp.sum(r0 * z0))
            dx_c, _, _, _ = jax.lax.fori_loop(0, cg_iters, cg_body, cg0)

        # Back-substitute landmarks: dy = V^-1 (b_p - W^T dx)
        Wt_dx = jnp.zeros((P, 3)).at[prob.obs_pt].add(
            jnp.einsum("oij,oi->oj", Wo, dx_c[prob.obs_cam])
        )
        dy = jnp.einsum("pij,pj->pi", V_inv, b_p - Wt_dx) * free_pt

        cam_new = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_c, cam_Tcw)
        cam_new = jnp.where(prob.cam_fixed[:, None, None], cam_Tcw, cam_new)
        pt_new = pt_pos + dy

        # Accept test against the CARRIED cost (one residual pass per
        # iteration instead of two).
        cost_new = total_cost(cam_new, pt_new)
        improved = cost_new < cost_cur
        cam_Tcw = jnp.where(improved, cam_new, cam_Tcw)
        pt_pos = jnp.where(improved, pt_new, pt_pos)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        cost_cur = jnp.where(improved, cost_new, cost_cur)
        return (cam_Tcw, pt_pos, lam, cost_cur)

    cam_Tcw, pt_pos, lam, _ = jax.lax.fori_loop(
        0, n_iters, lm_step,
        (prob.cam_Tcw, prob.pt_pos, jnp.asarray(lam0, jnp.float32),
         total_cost(prob.cam_Tcw, prob.pt_pos)),
    )
    out = prob._replace(cam_Tcw=cam_Tcw, pt_pos=pt_pos)
    if return_lam:
        return out, lam
    return out


def local_ba(prob: BAProblem, fx, fy, cx, cy, bf,
             iters1: int = 5, iters2: int = 10, cg_iters: int = 48):
    """The reference LocalBundleAdjustment schedule (src/Optimizer.cc:577-715):
    iters1 robust LM steps, outlier demotion, iters2 more steps, final
    outlier classification. Returns (problem, final obs_mask)."""
    prob = bundle_adjust(prob, fx, fy, cx, cy, bf, n_iters=iters1, cg_iters=cg_iters)
    mask = classify_outliers(prob, fx, fy, cx, cy, bf)
    prob = prob._replace(obs_mask=mask)
    prob = bundle_adjust(prob, fx, fy, cx, cy, bf, n_iters=iters2, cg_iters=cg_iters)
    final_mask = classify_outliers(prob, fx, fy, cx, cy, bf)
    return prob, final_mask


# ---------------------------------------------------------------------------
# Dense (per-point, K-entry) local BA
# ---------------------------------------------------------------------------
#
# The flat observation list above costs ~8.5 ms per LM iteration at the
# local-window size (C=32, P=4096, O=16k) on the target chip: every segment
# reduction is a scatter-add and every Jacobian evaluation a large-table
# gather, each with a ~0.3-0.4 ms fixed cost, and an LM step needs ~a dozen
# of them. The window needs 8-15 iterations per keyframe — the single
# hottest loop in the whole engine (reference LocalBundleAdjustment runs on
# every mapped keyframe, src/LocalMapping.cc:94-98).
#
# This variant stores the problem in the map's OWN inverted-index layout:
# one row per landmark with up to K observer entries (mp_obs_kf/mp_obs_slot
# are exactly this shape). Every per-iteration quantity then reduces over
# the dense K axis, and all camera-axis reductions go through one small
# precomputed one-hot (P, K, C) tensor on the MXU:
#   V_p   = sum_k Jp^T W Jp          (dense over K)
#   U_c   = sum_pk onehot * Jc^T W Jc (one einsum)
#   S     = U - sum_p B_p V_p^-1 B_p^T via (P, C, 6, 3) one-hot contractions
# No scatter, no gather, no flat observation axis: ~2 ms per iteration.


class DenseBAProblem(NamedTuple):
    """Local BA problem in inverted-index form: (P, K) observer entries."""

    cam_Tcw: jnp.ndarray  # (C, 4, 4)
    cam_fixed: jnp.ndarray  # (C,) bool
    pt_pos: jnp.ndarray  # (P, 3)
    pt_valid: jnp.ndarray  # (P,) bool
    e_cam: jnp.ndarray  # (P, K) i32 local camera index (-1 = empty)
    e_uv: jnp.ndarray  # (P, K, 2)
    e_ur: jnp.ndarray  # (P, K) right-u or -1
    e_inv_sigma2: jnp.ndarray  # (P, K)
    e_mask: jnp.ndarray  # (P, K) bool


def _dense_residuals(cam_Tcw, pt_pos, prob: DenseBAProblem, oh, fx, fy, cx, cy, bf):
    """Residuals (P,K,3), Jacobians (P,K,3,6)/(P,K,3,3), depth (P,K).
    Camera poses enter through the one-hot contraction (C is tiny, the
    einsum is an MXU matmul — no gather)."""
    T = jnp.einsum("pkc,cij->pkij", oh, cam_Tcw)  # (P, K, 4, 4)
    R = T[..., :3, :3]
    t = T[..., :3, 3]
    pc = jnp.einsum("pkij,pj->pki", R, pt_pos) + t
    x, y, z = pc[..., 0], pc[..., 1], pc[..., 2]
    z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    iz = 1.0 / z_safe
    iz2 = iz * iz
    u_pred = fx * x * iz + cx
    v_pred = fy * y * iz + cy
    ur_pred = u_pred - bf * iz
    r = jnp.stack(
        [u_pred - prob.e_uv[..., 0], v_pred - prob.e_uv[..., 1], ur_pred - prob.e_ur],
        axis=-1,
    )  # (P, K, 3)
    zero = jnp.zeros_like(x)
    du = jnp.stack([fx * iz, zero, -fx * x * iz2], axis=-1)
    dv = jnp.stack([zero, fy * iz, -fy * y * iz2], axis=-1)
    dur = du + jnp.stack([zero, zero, bf * iz2], axis=-1)
    J_proj = jnp.stack([du, dv, dur], axis=-2)  # (P, K, 3, 3)
    hat_pc = jnp.stack(
        [
            jnp.stack([zero, -z, y], axis=-1),
            jnp.stack([z, zero, -x], axis=-1),
            jnp.stack([-y, x, zero], axis=-1),
        ],
        axis=-2,
    )  # (P, K, 3, 3)
    I3 = jnp.broadcast_to(jnp.eye(3), hat_pc.shape)
    J_cam = J_proj @ jnp.concatenate([I3, -hat_pc], axis=-1)  # (P, K, 3, 6)
    J_pt = J_proj @ R  # (P, K, 3, 3)
    return r, J_cam, J_pt, z


def _dense_chi2(r, inv_sigma2, is_stereo):
    e2 = r[..., 0] ** 2 + r[..., 1] ** 2 + jnp.where(is_stereo, r[..., 2] ** 2, 0.0)
    return e2 * inv_sigma2


@jax.jit
def classify_outliers_dense(prob: DenseBAProblem, fx, fy, cx, cy, bf):
    """chi2 + positive-depth gating per (P, K) entry (reference
    src/Optimizer.cc:668-683,717-745). Returns updated e_mask."""
    C = prob.cam_Tcw.shape[0]
    oh = jax.nn.one_hot(jnp.maximum(prob.e_cam, 0), C, dtype=jnp.float32)
    r, _, _, z = _dense_residuals(
        prob.cam_Tcw, prob.pt_pos, prob, oh, fx, fy, cx, cy, bf
    )
    is_stereo = prob.e_ur >= 0
    c2 = _dense_chi2(r, prob.e_inv_sigma2, is_stereo)
    th = jnp.where(is_stereo, CHI2_STEREO, CHI2_MONO)
    return prob.e_mask & (c2 <= th) & (z > 0)


@partial(
    jax.jit,
    static_argnames=("n_iters", "use_huber", "return_lam", "return_carry", "n_free"),
)
def bundle_adjust_dense(
    prob: DenseBAProblem,
    fx,
    fy,
    cx,
    cy,
    bf,
    n_iters: int = 10,
    use_huber: bool = True,
    lam0: float = 1e-4,
    return_lam: bool = False,
    n_free: int = None,
    cost0=None,
    cam_bak0=None,
    pt_bak0=None,
    return_carry: bool = False,
):
    """n_iters LM steps on the dense (P, K) problem; dense Cholesky on the
    (6C, 6C) Schur-reduced camera system (local windows keep C small).

    n_free: cameras [0, n_free) are the potentially-free block and
    [n_free, C) are ALWAYS fixed (extract_local_ba_dense lays the window
    out this way). Fixed cameras never enter the Schur system — their
    observations only constrain the landmarks — so every camera-axis
    reduction and the Cholesky run at n_free, not C (4x less solve work
    for the standard 16/16 window)."""
    C = prob.cam_Tcw.shape[0]
    if n_free is None:
        n_free = C
    Cf = n_free
    P, K = prob.e_mask.shape
    E = P * K
    D = Cf * 6
    # --- (P, K) "plane" layout --------------------------------------------
    # Per-entry tensors with trailing (3,6)/(6,6) block dims tile-pad to the
    # (8, 128) lane layout on the target chip: the einsum formulation moved
    # ~2.3 GB per LM step for a ~50 MB problem (XLA cost analysis; 564
    # MFLOP). Every per-entry quantity below is ONE (P, K) plane — the K=16
    # lane axis still pads to 128, but a padded elementwise plane op costs
    # ~3 us, while a (E,) <-> (P, K) reshape is a RELAYOUT (measured: a
    # flat-(E,)-plane variant spent its time in 780+ relayout copies).
    # Camera-axis reductions flatten once per stacked group and run as
    # (rows, E) @ (E, Cf) MXU matmuls; per-point reductions are axis-1 sums.
    mask_e = prob.e_mask
    is_stereo_e = prob.e_ur >= 0
    delta_e = jnp.sqrt(jnp.where(is_stereo_e, CHI2_STEREO, CHI2_MONO))
    inv_sigma2_e = prob.e_inv_sigma2
    u_meas = prob.e_uv[..., 0]
    v_meas = prob.e_uv[..., 1]
    ur_meas = prob.e_ur
    free_cam = (~prob.cam_fixed[:Cf]).astype(jnp.float32)  # (Cf,)
    free_pt = prob.pt_valid.astype(jnp.float32)[:, None]
    cam_flat = jnp.maximum(prob.e_cam, 0).reshape(E)
    # (C, E) one-hot^T: pose fetch over all C; reductions over free block.
    ohT = (
        (cam_flat[None, :] == jnp.arange(C, dtype=jnp.int32)[:, None])
        & mask_e.reshape(E)[None, :]
    ).astype(jnp.float32)
    ohfT = ohT[:Cf] * free_cam[:, None]  # (Cf, E)

    def psum(plane):
        """Per-point reduction of a (P, K) plane -> (P,)."""
        return plane.sum(axis=1)

    def pbc(col):
        """Broadcast a (P,) per-point value to a (P, K) plane."""
        return col[:, None]

    def lm_step(_, carry):
        # Damping-feedback LM with ONE residual pass per iteration: the
        # cost at the current parameters comes from the same residuals that
        # build the normal equations, and lambda adapts from the PREVIOUS
        # iteration's cost instead of a separate post-step evaluation
        # (nonmonotonic accept; a worse step inflates lambda, and the guard
        # below rolls the parameters back).
        cam_Tcw, pt_pos, cam_bak, pt_bak, cost_prev, lam = carry

        # Per-entry camera rows via one (12, C) @ (C, E) matmul.
        Tf = cam_Tcw[:, :3, :4].reshape(C, 12)
        Te = (Tf.T @ ohT).reshape(12, P, K)
        # rows: R00..R02 t0 R10..R12 t1 R20..R22 t2
        px, py, pz = (pbc(pt_pos[:, i]) for i in range(3))
        x = Te[0] * px + Te[1] * py + Te[2] * pz + Te[3]
        y = Te[4] * px + Te[5] * py + Te[6] * pz + Te[7]
        z = Te[8] * px + Te[9] * py + Te[10] * pz + Te[11]
        z_safe = jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
        iz = 1.0 / z_safe
        iz2 = iz * iz
        ru = fx * x * iz + cx - u_meas
        rv = fy * y * iz + cy - v_meas
        rr = fx * x * iz + cx - bf * iz - ur_meas
        r3 = (ru, rv, rr)

        c2 = (ru * ru + rv * rv + jnp.where(is_stereo_e, rr * rr, 0.0)) * inv_sigma2_e
        e = jnp.sqrt(jnp.maximum(c2, 1e-12))
        hub = use_huber & (e > delta_e)
        rho = jnp.where(hub, 2.0 * delta_e * e - delta_e * delta_e, c2)
        cost_now = jnp.sum(rho * mask_e * (z > 0))
        improved = cost_now <= cost_prev
        # Roll back a worsening step: resume from the best-seen parameters.
        # The rollback reuses the (stale) linearization of the rejected
        # point for one step — the inflated lambda shrinks that step toward
        # gradient descent, the same recovery g2o's retry loop achieves
        # with a second linearization at double the residual passes.
        cam_Tcw = jnp.where(improved, cam_Tcw, cam_bak)
        pt_pos = jnp.where(improved, pt_pos, pt_bak)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        cost_best = jnp.minimum(cost_now, cost_prev)

        w_huber = jnp.where(hub, delta_e / e, 1.0)
        w = inv_sigma2_e * w_huber * mask_e * (z > 0)  # (E,)
        roww = (w, w, w * is_stereo_e)

        # Projection Jacobian rows (du, dv, dur) wrt camera point (3 each),
        # camera Jacobian J_cam[i][j] = J_proj[i] @ [I | -hat(pc)], point
        # Jacobian J_pt[i][m] = J_proj[i] @ R — all as (E,) planes.
        zero = jnp.zeros_like(x)
        Jp_rows = (
            (fx * iz, zero, -fx * x * iz2),
            (zero, fy * iz, -fy * y * iz2),
            (fx * iz, zero, -fx * x * iz2 + bf * iz2),
        )
        # hat(pc) columns for the rotational part: d(pc)/d(omega) = -hat(pc)
        hat = (
            (zero, -z, y),
            (z, zero, -x),
            (-y, x, zero),
        )
        Jc = [[None] * 6 for _ in range(3)]
        Jpt = [[None] * 3 for _ in range(3)]
        R_pl = [[Te[4 * a + b] for b in range(3)] for a in range(3)]
        for i in range(3):
            g = Jp_rows[i]
            for j in range(3):  # translational block
                Jc[i][j] = g[j]
            for j in range(3):  # rotational block: -(g . hat[:, j])
                Jc[i][3 + j] = -(
                    g[0] * hat[0][j] + g[1] * hat[1][j] + g[2] * hat[2][j]
                )
            for m in range(3):
                Jpt[i][m] = g[0] * R_pl[0][m] + g[1] * R_pl[1][m] + g[2] * R_pl[2][m]

        # V (P, 3, 3) from 6 unique planes; b_p (P, 3).
        V_pl = [[None] * 3 for _ in range(3)]
        for m in range(3):
            for n in range(m, 3):
                V_pl[m][n] = psum(
                    sum(roww[i] * Jpt[i][m] * Jpt[i][n] for i in range(3))
                )
        b_p = jnp.stack(
            [
                -psum(sum(roww[i] * Jpt[i][m] * r3[i] for i in range(3)))
                for m in range(3)
            ],
            axis=-1,
        )  # (P, 3)
        V_d = jnp.stack(
            [
                jnp.stack(
                    [
                        (V_pl[min(m, n)][max(m, n)]) * (1.0 + lam * (m == n))
                        for n in range(3)
                    ],
                    axis=-1,
                )
                for m in range(3)
            ],
            axis=-2,
        )  # (P, 3, 3) damped
        V_inv = _inv3x3(V_d)

        # Camera-side reductions: U (21 planes), b_c (6 planes) in ONE
        # (27, E) @ (E, Cf) MXU matmul.
        cam_planes = []
        for j in range(6):
            for l in range(j, 6):
                cam_planes.append(
                    sum(roww[i] * Jc[i][j] * Jc[i][l] for i in range(3))
                )
        for j in range(6):
            cam_planes.append(-sum(roww[i] * Jc[i][j] * r3[i] for i in range(3)))
        red = jnp.stack(cam_planes).reshape(27, E) @ ohfT.T  # (27, Cf)
        triu = [(j, l) for j in range(6) for l in range(j, 6)]
        U = jnp.zeros((Cf, 6, 6))
        for idx, (j, l) in enumerate(triu):
            U = U.at[:, j, l].set(red[idx])
            if j != l:
                U = U.at[:, l, j].set(red[idx])
        b_c = red[21:27].T  # (Cf, 6)
        U_d = U + lam * jax.vmap(jnp.diag)(jnp.diagonal(U, axis1=1, axis2=2))

        # W planes (18: j in 6, m in 3) and G = W V^-1 (18 planes).
        W_pl = [
            [sum(roww[i] * Jc[i][j] * Jpt[i][m] for i in range(3)) for m in range(3)]
            for j in range(6)
        ]
        Vi_pl = [[pbc(V_inv[:, m, n]) for n in range(3)] for m in range(3)]
        G_pl = [
            [sum(W_pl[j][mm] * Vi_pl[mm][m] for mm in range(3)) for m in range(3)]
            for j in range(6)
        ]

        # Schur RHS: b~ = b_c - W V^-1 b_p, via 6 planes + one matmul.
        Vb = jnp.einsum("pmn,pn->pm", V_inv, b_p)  # (P, 3)
        w6 = jnp.stack(
            [sum(W_pl[j][m] * pbc(Vb[:, m]) for m in range(3)) for j in range(6)]
        ).reshape(6, E)
        b_red = b_c - (w6 @ ohfT.T).T  # (Cf, 6)

        # Schur cross-term: BC/BW as (18, Cf, P) per-point partials, then
        # one einsum over (m, p).
        ohf_r = ohfT.reshape(Cf, P, K)
        W_all = jnp.stack([W_pl[j][m] for j in range(6) for m in range(3)])
        G_all = jnp.stack([G_pl[j][m] for j in range(6) for m in range(3)])
        BW = jnp.einsum("cpk,xpk->xcp", ohf_r, W_all).reshape(6, 3, Cf, P)
        BC = jnp.einsum("cpk,xpk->xcp", ohf_r, G_all).reshape(6, 3, Cf, P)
        with jax.default_matmul_precision("highest"):
            S = -jnp.einsum("jmcp,lmdp->cjdl", BC, BW)
            S = S + jnp.einsum("cjl,cd->cjdl", U_d, jnp.eye(Cf))
            S = S.reshape(D, D)
            # Pin singular rows: fixed cameras and free cameras with no
            # observations in the window.
            live = jnp.repeat(free_cam, 6) * (jnp.diagonal(S) > 1e-10)
            S = S * (live[:, None] * live[None, :]) + jnp.diag(1.0 - live)
            rhs = b_red.reshape(D) * jnp.repeat(free_cam, 6) * live
            dx_c = jax.scipy.linalg.cho_solve(
                jax.scipy.linalg.cho_factor(S), rhs
            ).reshape(Cf, 6)
        dx_c = dx_c * free_cam[:, None]
        dx_c = jnp.where(jnp.isfinite(dx_c), dx_c, 0.0)

        # Back-substitute landmarks: dy = V^-1 (b_p - W^T dx).
        dxe = (dx_c.T @ ohfT).reshape(6, P, K)
        Wt_dx = jnp.stack(
            [psum(sum(W_pl[j][m] * dxe[j] for j in range(6))) for m in range(3)],
            axis=-1,
        )  # (P, 3)
        dy = jnp.einsum("pmn,pn->pm", V_inv, b_p - Wt_dx) * free_pt
        dy = jnp.where(jnp.isfinite(dy), dy, 0.0)

        cam_upd = jax.vmap(lambda d, T: lie.se3_exp(d) @ T)(dx_c, cam_Tcw[:Cf])
        cam_upd = jnp.where(prob.cam_fixed[:Cf, None, None], cam_Tcw[:Cf], cam_upd)
        cam_new = cam_Tcw.at[:Cf].set(cam_upd)
        pt_new = pt_pos + dy
        return (cam_new, pt_new, cam_Tcw, pt_pos, cost_best, lam)

    big = jnp.float32(3.4e38)
    carry = (
        prob.cam_Tcw,
        prob.pt_pos,
        prob.cam_Tcw if cam_bak0 is None else cam_bak0,
        prob.pt_pos if pt_bak0 is None else pt_bak0,
        big if cost0 is None else cost0,
        jnp.asarray(lam0, jnp.float32),
    )
    # UNROLLED (n_iters is static; host-side chunking via lm_step_dense is
    # the production path — see its docstring for why).
    for i in range(n_iters + 1):
        carry = lm_step(i, carry)
    cam_Tcw, pt_pos, cam_bak, pt_bak, cost_best, lam = carry
    if return_carry:
        return (
            prob._replace(cam_Tcw=cam_Tcw, pt_pos=pt_pos),
            cam_bak, pt_bak, cost_best, lam,
        )
    # The final carry's (cam_Tcw, pt_pos) is an unevaluated trial step; the
    # backup slot holds the last evaluated-and-accepted parameters.
    out = prob._replace(cam_Tcw=cam_bak, pt_pos=pt_bak)
    if return_lam:
        return out, lam
    return out


@partial(jax.jit, static_argnames=("use_huber", "n_free"))
def lm_step_dense(prob: DenseBAProblem, cam_bak, pt_bak, cost_prev, lam,
                  fx, fy, cx, cy, bf, use_huber: bool = True,
                  n_free: int = None):
    """ONE LM step as its own dispatch. The host loops over this instead of
    compiling an unrolled multi-step program: on the target chip the SAME
    step costs ~0.9 ms as a small program but ~4.5 ms inside a long fused
    one (layout/scheduling pessimization grows with program size), while an
    async dispatch costs the host ~0.15 ms — so chunking at one step per
    dispatch is ~2.5x faster wall-clock and never blocks on the tunnel.

    Returns (prob', cam_bak', pt_bak', cost_best, lam')."""
    out = bundle_adjust_dense.__wrapped__(
        prob, fx, fy, cx, cy, bf, n_iters=0, use_huber=use_huber,
        lam0=lam, cost0=cost_prev, cam_bak0=cam_bak, pt_bak0=pt_bak,
        return_carry=True, n_free=n_free,
    )
    return out


def local_ba_dense(prob: DenseBAProblem, fx, fy, cx, cy, bf,
                   iters1: int = 5, iters2: int = 10, n_free: int = None):
    """Reference LocalBundleAdjustment schedule on the dense problem
    (src/Optimizer.cc:577-715): iters1 robust steps, outlier demotion,
    iters2 more, final classification. Each stage is ONE fused dispatch:
    with the (P, K)-plane LM step the fused multi-step program runs at
    ~1.3 ms/step vs ~3.7 standalone (parameters never round-trip HBM
    between steps), reversing the round-3 finding that long fused programs
    pessimize — that cost was the tile-padded (P,K,6,6) layouts, not the
    program length. Returns (problem, final e_mask)."""
    prob = bundle_adjust_dense(
        prob, fx, fy, cx, cy, bf, n_iters=iters1, n_free=n_free
    )
    mask = classify_outliers_dense(prob, fx, fy, cx, cy, bf)
    prob = prob._replace(e_mask=mask)
    prob = bundle_adjust_dense(
        prob, fx, fy, cx, cy, bf, n_iters=iters2, n_free=n_free
    )
    final_mask = classify_outliers_dense(prob, fx, fy, cx, cy, bf)
    return prob, final_mask
