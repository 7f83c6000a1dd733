"""Two-view geometry estimation: homography / fundamental / essential.

TPU-native replacement of the reference's monocular Initializer
(src/Initializer.cc): instead of 200 sequential RANSAC iterations in two host
threads, all hypotheses are scored in one batched computation (`vmap` over the
hypothesis axis), and both models (H and F) can be estimated inside a single
jit. Model selection and reconstruction (Faugeras homography decomposition,
essential-matrix decomposition + cheirality) are pure functions as well.

All point arguments are pixel coordinates; masks select valid correspondences
(static-shape padding).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops.projection import triangulate_dlt
from my_orb_slam2_tpu.ops import lie

# Chi-square thresholds (1 dof 3.841, 2 dof 5.991), as in reference
# src/Initializer.cc:347,433-442.
CHI2_1DOF = 3.841
CHI2_2DOF = 5.991


def normalize_points(uv, mask):
    """Zero-mean, unit mean-absolute-deviation normalization.

    Same scheme as reference Initializer::Normalize (src/Initializer.cc:749)
    but masked: padding rows do not perturb the statistics.

    Returns (uv_norm, T) with T the 3x3 transform uv_norm_h = T @ uv_h.
    """
    w = mask.astype(uv.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(uv * w[:, None], axis=0) / n
    d = jnp.abs(uv - mean) * w[:, None]
    mean_dev = jnp.sum(d, axis=0) / n
    s = 1.0 / jnp.maximum(mean_dev, 1e-9)
    uv_n = (uv - mean) * s
    T = jnp.array(
        [
            [s[0], 0.0, -mean[0] * s[0]],
            [0.0, s[1], -mean[1] * s[1]],
            [0.0, 0.0, 1.0],
        ]
    )
    return uv_n, T


def _dlt_h(uv1, uv2, w=None):
    """Homography from >=4 correspondences by DLT (reference ComputeH21,
    src/Initializer.cc:226-266). uv1/uv2: (n, 2) normalized points.
    Optional row weights `w` allow masked all-inlier refinement."""
    n = uv1.shape[0]
    u1, v1 = uv1[:, 0], uv1[:, 1]
    u2, v2 = uv2[:, 0], uv2[:, 1]
    z = jnp.zeros(n)
    o = jnp.ones(n)
    r1 = jnp.stack([z, z, z, -u1, -v1, -o, v2 * u1, v2 * v1, v2], axis=1)
    r2 = jnp.stack([u1, v1, o, z, z, z, -u2 * u1, -u2 * v1, -u2], axis=1)
    A = jnp.concatenate([r1, r2], axis=0)  # (2n, 9)
    if w is not None:
        A = A * jnp.concatenate([w, w])[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    return vt[8].reshape(3, 3)


def _dlt_f(uv1, uv2, w=None):
    """Fundamental matrix by the 8-point algorithm with rank-2 projection
    (reference ComputeF21, src/Initializer.cc:268-303)."""
    u1, v1 = uv1[:, 0], uv1[:, 1]
    u2, v2 = uv2[:, 0], uv2[:, 1]
    o = jnp.ones_like(u1)
    A = jnp.stack([u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, o], axis=1)
    if w is not None:
        A = A * w[:, None]
    _, _, vt = jnp.linalg.svd(A, full_matrices=True)
    F = vt[8].reshape(3, 3)
    U, S, Vt = jnp.linalg.svd(F)
    S = S.at[2].set(0.0)
    return U @ jnp.diag(S) @ Vt


def homography_from_minimal(uv1, uv2, T1, T2):
    """H21 in pixel space from a normalized minimal (or larger) set."""
    Hn = _dlt_h(uv1, uv2)
    T2inv = jnp.linalg.inv(T2)
    return T2inv @ Hn @ T1


def fundamental_from_minimal(uv1, uv2, T1, T2):
    Fn = _dlt_f(uv1, uv2)
    return T2.T @ Fn @ T1


def score_homography(H21, uv1, uv2, mask, sigma: float = 1.0):
    """Symmetric-transfer chi2 score (reference CheckHomography,
    src/Initializer.cc:305-388). Returns (score, inlier_mask)."""
    H12 = jnp.linalg.inv(H21)
    inv_s2 = 1.0 / (sigma * sigma)

    def transfer(H, a, b):
        x, y = a[:, 0], a[:, 1]
        w = H[2, 0] * x + H[2, 1] * y + H[2, 2]
        iw = 1.0 / jnp.where(jnp.abs(w) > 1e-12, w, 1e-12)
        px = (H[0, 0] * x + H[0, 1] * y + H[0, 2]) * iw
        py = (H[1, 0] * x + H[1, 1] * y + H[1, 2]) * iw
        return ((b[:, 0] - px) ** 2 + (b[:, 1] - py) ** 2) * inv_s2

    chi2_1 = transfer(H12, uv2, uv1)
    chi2_2 = transfer(H21, uv1, uv2)
    th = 5.991
    ok1 = chi2_1 < th
    ok2 = chi2_2 < th
    sc = jnp.where(ok1, th - chi2_1, 0.0) + jnp.where(ok2, th - chi2_2, 0.0)
    inl = ok1 & ok2 & mask
    return jnp.sum(sc * mask), inl


def score_fundamental(F21, uv1, uv2, mask, sigma: float = 1.0):
    """Symmetric epipolar chi2 score (reference CheckFundamental,
    src/Initializer.cc:390-468): inlier test at 3.841 (1 dof), score
    contribution capped at 5.991 to be comparable with H."""
    inv_s2 = 1.0 / (sigma * sigma)

    def epi(F, a, b):
        # line in image b for point a: l = F @ a_h
        la = F[0, 0] * a[:, 0] + F[0, 1] * a[:, 1] + F[0, 2]
        lb = F[1, 0] * a[:, 0] + F[1, 1] * a[:, 1] + F[1, 2]
        lc = F[2, 0] * a[:, 0] + F[2, 1] * a[:, 1] + F[2, 2]
        num = la * b[:, 0] + lb * b[:, 1] + lc
        return num * num / jnp.maximum(la * la + lb * lb, 1e-12) * inv_s2

    chi2_2 = epi(F21, uv1, uv2)
    chi2_1 = epi(F21.T, uv2, uv1)
    th, th_score = 3.841, 5.991
    ok1 = chi2_1 < th
    ok2 = chi2_2 < th
    sc = jnp.where(ok1, th_score - chi2_1, 0.0) + jnp.where(ok2, th_score - chi2_2, 0.0)
    inl = ok1 & ok2 & mask
    return jnp.sum(sc * mask), inl


@partial(jax.jit, static_argnames=("n_iters",))
def ransac_h_f(key, uv1, uv2, mask, n_iters: int = 200, sigma: float = 1.0):
    """Batched RANSAC for H and F simultaneously.

    Replaces the reference's two threads x 200 sequential iterations
    (src/Initializer.cc:104-109) with a single vmapped hypothesis batch per
    model: sample n_iters 8-point sets, solve all models, score all models
    against all correspondences, argmax.

    Returns dict with H21, F21, their scores and inlier masks, and RH.
    """
    n = uv1.shape[0]
    uv1n, T1 = normalize_points(uv1, mask)
    uv2n, T2 = normalize_points(uv2, mask)

    # Sample minimal sets only among valid correspondences: draw from the
    # valid-index list with replacement-free-ish sampling (random scores).
    def sample(k):
        r = jax.random.uniform(k, (n,))
        r = jnp.where(mask, r, -1.0)
        return jax.lax.top_k(r, 8)[1]

    keys = jax.random.split(key, n_iters)
    idx = jax.vmap(sample)(keys)  # (iters, 8)

    def one_h(ids):
        return homography_from_minimal(uv1n[ids], uv2n[ids], T1, T2)

    def one_f(ids):
        return fundamental_from_minimal(uv1n[ids], uv2n[ids], T1, T2)

    Hs = jax.vmap(one_h)(idx)
    Fs = jax.vmap(one_f)(idx)
    h_scores, h_inls = jax.vmap(lambda H: score_homography(H, uv1, uv2, mask, sigma))(Hs)
    f_scores, f_inls = jax.vmap(lambda F: score_fundamental(F, uv1, uv2, mask, sigma))(Fs)
    bh = jnp.argmax(h_scores)
    bf_ = jnp.argmax(f_scores)

    # All-inlier refinement: re-estimate each winning model on its consensus
    # set (weighted DLT rows); keep the refit only if its score improves.
    # (The reference keeps the raw minimal-set model; the refit measurably
    # tightens the recovered motion at no behavioral cost.)
    def refit_h(inl):
        w = inl.astype(uv1.dtype)
        Hn = _dlt_h(uv1n, uv2n, w)
        return jnp.linalg.inv(T2) @ Hn @ T1

    def refit_f(inl):
        w = inl.astype(uv1.dtype)
        Fn = _dlt_f(uv1n, uv2n, w)
        return T2.T @ Fn @ T1

    H_ref = refit_h(h_inls[bh])
    F_ref = refit_f(f_inls[bf_])
    sh_ref, h_inl_ref = score_homography(H_ref, uv1, uv2, mask, sigma)
    sf_ref, f_inl_ref = score_fundamental(F_ref, uv1, uv2, mask, sigma)
    use_h_ref = sh_ref > h_scores[bh]
    use_f_ref = sf_ref > f_scores[bf_]
    H_best = jnp.where(use_h_ref, H_ref, Hs[bh])
    F_best = jnp.where(use_f_ref, F_ref, Fs[bf_])
    h_inl_best = jnp.where(use_h_ref, h_inl_ref, h_inls[bh])
    f_inl_best = jnp.where(use_f_ref, f_inl_ref, f_inls[bf_])
    SH = jnp.maximum(sh_ref, h_scores[bh])
    SF = jnp.maximum(sf_ref, f_scores[bf_])
    rh = SH / jnp.maximum(SH + SF, 1e-9)
    return {
        "H21": H_best,
        "F21": F_best,
        "score_h": SH,
        "score_f": SF,
        "inliers_h": h_inl_best,
        "inliers_f": f_inl_best,
        "rh": rh,
    }


# ---------------------------------------------------------------------------
# Reconstruction
# ---------------------------------------------------------------------------


def check_rt(R, t, uv1, uv2, mask, fx, fy, cx, cy, sigma2: float = 1.0):
    """Count correspondences supporting motion (R, t): triangulate, test
    parallax, cheirality in both cameras, and reprojection error < 4 sigma^2
    in both views (reference CheckRT, src/Initializer.cc:798-907).

    Returns (n_good, good_mask, parallax_deg, pts3d).
    """
    T1 = jnp.eye(4)
    T2 = lie.se3_from_Rt(R, t)
    pts, okw = triangulate_dlt(T1, T2, uv1, uv2, fx, fy, cx, cy)
    finite = jnp.all(jnp.isfinite(pts), axis=-1) & okw

    O1 = jnp.zeros(3)
    O2 = -(R.T @ t)
    n1v = pts - O1
    n2v = pts - O2
    d1 = jnp.linalg.norm(n1v, axis=-1)
    d2 = jnp.linalg.norm(n2v, axis=-1)
    cos_par = jnp.sum(n1v * n2v, axis=-1) / jnp.maximum(d1 * d2, 1e-9)

    z1 = pts[:, 2]
    pc2 = pts @ R.T + t
    z2 = pc2[:, 2]
    # Cheirality (allow low-parallax points to skip the depth test as the
    # reference does: points with cos_par >= 0.99998 are not counted anyway).
    has_par = cos_par < 0.99998
    pos_depth = (z1 > 0) & (z2 > 0)

    inv_z1 = 1.0 / jnp.where(jnp.abs(z1) > 1e-9, z1, 1e-9)
    u1p = fx * pts[:, 0] * inv_z1 + cx
    v1p = fy * pts[:, 1] * inv_z1 + cy
    e1 = (uv1[:, 0] - u1p) ** 2 + (uv1[:, 1] - v1p) ** 2
    inv_z2 = 1.0 / jnp.where(jnp.abs(z2) > 1e-9, z2, 1e-9)
    u2p = fx * pc2[:, 0] * inv_z2 + cx
    v2p = fy * pc2[:, 1] * inv_z2 + cy
    e2 = (uv2[:, 0] - u2p) ** 2 + (uv2[:, 1] - v2p) ** 2
    th = 4.0 * sigma2
    good = mask & finite & has_par & pos_depth & (e1 < th) & (e2 < th)
    n_good = jnp.sum(good)

    # Parallax statistic: the reference sorts the good points' parallax
    # COSINES ascending and takes index min(50, n-1) — i.e. the 51st-LARGEST
    # parallax angle (src/Initializer.cc:898-905). Taking the other tail
    # (smallest angles) makes the gate unreachable whenever any far points
    # triangulate, however strong the near-field parallax is.
    par_deg = jnp.degrees(jnp.arccos(jnp.clip(cos_par, -1.0, 1.0)))
    desc = -jnp.sort(-jnp.where(good, par_deg, -1e9))  # descending angles
    k = jnp.minimum(50, jnp.maximum(n_good, 1) - 1)
    parallax = jnp.clip(desc[k], 0.0, 90.0)
    return n_good, good, parallax, pts


def decompose_essential(E):
    """E -> (R1, R2, t) candidates (reference DecomposeE,
    src/Initializer.cc:909-930)."""
    U, _, Vt = jnp.linalg.svd(E)
    t = U[:, 2]
    t = t / jnp.maximum(jnp.linalg.norm(t), 1e-9)
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]])
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    R1 = jnp.where(jnp.linalg.det(R1) < 0, -R1, R1)
    R2 = jnp.where(jnp.linalg.det(R2) < 0, -R2, R2)
    return R1, R2, t

def reconstruct_f(F21, uv1, uv2, mask, fx, fy, cx, cy, sigma: float = 1.0,
                  min_parallax: float = 1.0, min_triangulated: int = 50):
    """Select (R, t) from F by testing the 4 essential decompositions
    (reference ReconstructF, src/Initializer.cc:470-570).

    Returns dict(success, R, t, pts3d, good_mask).
    """
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    E = K.T @ F21 @ K
    R1, R2, t = decompose_essential(E)
    cands_R = jnp.stack([R1, R2, R1, R2])
    cands_t = jnp.stack([t, t, -t, -t])

    def chk(Rt):
        R, tt = Rt
        return check_rt(R, tt, uv1, uv2, mask, fx, fy, cx, cy, sigma * sigma)

    n_good, good, par, pts = jax.vmap(chk)((cands_R, cands_t))
    max_good = jnp.max(n_good)
    best = jnp.argmax(n_good)
    n_inl = jnp.sum(mask & True)
    n_min_good = jnp.maximum(jnp.array(0.9, jnp.float32) * jnp.sum(mask), min_triangulated)
    n_similar = jnp.sum(n_good > 0.7 * max_good)
    success = (
        (max_good >= n_min_good)
        & (n_similar == 1)
        & (par[best] > min_parallax)
        & (n_good[best] > min_triangulated)
    )
    del n_inl
    return {
        "success": success,
        "R": cands_R[best],
        "t": cands_t[best],
        "pts3d": pts[best],
        "good": good[best],
        "parallax": par[best],
        "n_good": n_good[best],
    }


def _faugeras_motions(H21, fx, fy, cx, cy):
    """The 8 candidate motions of the Faugeras SVD-based homography
    decomposition (reference ReconstructH, src/Initializer.cc:572-732).

    Returns (Rs (8,3,3), ts (8,3), ok) where ok=False when the homography is
    degenerate (singular values too close).
    """
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    Kinv = jnp.linalg.inv(K)
    A = Kinv @ H21 @ K
    U, w, Vt = jnp.linalg.svd(A)
    V = Vt.T
    s = jnp.linalg.det(U) * jnp.linalg.det(V)
    d1, d2, d3 = w[0], w[1], w[2]
    ok = (d1 / jnp.maximum(d2, 1e-12) > 1.00001) & (d2 / jnp.maximum(d3, 1e-12) > 1.00001)

    aux1 = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    aux3 = jnp.sqrt(jnp.maximum((d2 * d2 - d3 * d3) / jnp.maximum(d1 * d1 - d3 * d3, 1e-12), 0.0))
    x1s = jnp.array([aux1, aux1, -aux1, -aux1])
    x3s = jnp.array([aux3, -aux3, aux3, -aux3])

    # Case d' = d2 (positive):
    aux_st = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 + d3) * d2, 1e-12
    )
    ct = (d2 * d2 + d1 * d3) / jnp.maximum((d1 + d3) * d2, 1e-12)
    sts = jnp.array([aux_st, -aux_st, -aux_st, aux_st])

    def pos_motion(i):
        st = sts[i]
        Rp = jnp.array([[ct, 0.0, -st], [0.0, 1.0, 0.0], [st, 0.0, ct]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, -x3s[i]]) * (d1 - d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    # Case d' = -d2:
    aux_sp = jnp.sqrt(jnp.maximum((d1 * d1 - d2 * d2) * (d2 * d2 - d3 * d3), 0.0)) / jnp.maximum(
        (d1 - d3) * d2, 1e-12
    )
    cp = (d1 * d3 - d2 * d2) / jnp.maximum((d1 - d3) * d2, 1e-12)
    sps = jnp.array([aux_sp, -aux_sp, -aux_sp, aux_sp])

    def neg_motion(i):
        sp = sps[i]
        Rp = jnp.array([[cp, 0.0, sp], [0.0, -1.0, 0.0], [sp, 0.0, -cp]])
        R = s * U @ Rp @ Vt
        tp = jnp.array([x1s[i], 0.0, x3s[i]]) * (d1 + d3)
        t = U @ tp
        return R, t / jnp.maximum(jnp.linalg.norm(t), 1e-12)

    Rs, ts = [], []
    for i in range(4):
        R, t = pos_motion(i)
        Rs.append(R)
        ts.append(t)
    for i in range(4):
        R, t = neg_motion(i)
        Rs.append(R)
        ts.append(t)
    return jnp.stack(Rs), jnp.stack(ts), ok


def reconstruct_h(H21, uv1, uv2, mask, fx, fy, cx, cy, sigma: float = 1.0,
                  min_parallax: float = 1.0, min_triangulated: int = 50):
    """Select (R, t) among the 8 Faugeras motions (reference ReconstructH
    acceptance rule src/Initializer.cc:721: clear winner + parallax +
    support)."""
    Rs, ts, ok_h = _faugeras_motions(H21, fx, fy, cx, cy)

    def chk(Rt):
        R, tt = Rt
        return check_rt(R, tt, uv1, uv2, mask, fx, fy, cx, cy, sigma * sigma)

    n_good, good, par, pts = jax.vmap(chk)((Rs, ts))
    order = jnp.argsort(-n_good)
    best = order[0]
    best_good = n_good[best]
    second_good = n_good[order[1]]
    n = jnp.sum(mask)
    success = (
        ok_h
        & (second_good < 0.75 * best_good)
        & (par[best] >= min_parallax)
        & (best_good > min_triangulated)
        & (best_good > 0.9 * n)
    )
    return {
        "success": success,
        "R": Rs[best],
        "t": ts[best],
        "pts3d": pts[best],
        "good": good[best],
        "parallax": par[best],
        "n_good": best_good,
    }
