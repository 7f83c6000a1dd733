"""EPnP (Lepetit et al. 2009) perspective-n-point solver in batched JAX.

TPU-native replacement of the reference PnPsolver (src/PnPsolver.cc), which
wraps EPnP in a sequential RANSAC. Here the closed-form EPnP estimate is a
pure function evaluated over the whole hypothesis batch at once
(`ransac_epnp`), and inlier classification uses the same per-octave chi2
reprojection gates (reference src/PnPsolver.cc:154-156,219-249).

Implementation follows the published algorithm: 4 control points from the
PCA frame of the reference points (reference choose_control_points,
src/PnPsolver.cc:375-409), barycentric coordinates, the 2n x 12 M matrix,
eigenvectors of M^T M, the beta initializations for N=1,2,3 nullspace
dimensions, Gauss-Newton refinement of the betas, and absolute orientation
(Horn) to recover (R, t) from world/camera control-point pairs.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops.horn import horn_align


def _control_points(pts_w, w):
    """c0 = weighted centroid; c1..c3 along PCA axes (scaled by sqrt var)."""
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c0 = jnp.sum(pts_w * wn[:, None], axis=0)
    d = (pts_w - c0) * jnp.sqrt(wn)[:, None]
    C = d.T @ d  # (3,3) covariance * n
    evals, evecs = jnp.linalg.eigh(C)
    # ascending order -> use all three; guard tiny eigenvalues (planar sets)
    scale = jnp.sqrt(jnp.maximum(evals, 1e-8))
    axes = evecs * scale[None, :]
    c1 = c0 + axes[:, 2]
    c2 = c0 + axes[:, 1]
    c3 = c0 + axes[:, 0]
    return jnp.stack([c0, c1, c2, c3])  # (4, 3)


def _barycentric(pts_w, ctrl):
    """alphas (n, 4) with sum = 1: p = sum_j alpha_j c_j."""
    B = (ctrl[1:] - ctrl[0]).T  # (3,3)
    Binv = jnp.linalg.inv(B + 1e-12 * jnp.eye(3))
    a123 = (pts_w - ctrl[0]) @ Binv.T  # (n, 3)
    a0 = 1.0 - jnp.sum(a123, axis=1, keepdims=True)
    return jnp.concatenate([a0, a123], axis=1)


def _build_MtM(alphas, uv, w, fx, fy, cx, cy):
    """M^T M (12 x 12) accumulated with per-row weights (mask)."""
    n = uv.shape[0]
    # Row pair per point: for control j, columns 3j..3j+2
    # r_u = [a_j fx, 0, a_j (cx - u)], r_v = [0, a_j fy, a_j (cy - v)]
    a = alphas  # (n, 4)
    u, v = uv[:, 0], uv[:, 1]
    ru = jnp.zeros((n, 12))
    rv = jnp.zeros((n, 12))
    for j in range(4):
        ru = ru.at[:, 3 * j + 0].set(a[:, j] * fx)
        ru = ru.at[:, 3 * j + 2].set(a[:, j] * (cx - u))
        rv = rv.at[:, 3 * j + 1].set(a[:, j] * fy)
        rv = rv.at[:, 3 * j + 2].set(a[:, j] * (cy - v))
    ru = ru * w[:, None]
    rv = rv * w[:, None]
    return ru.T @ ru + rv.T @ rv


_PAIRS = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)]


def _rho(ctrl_w):
    return jnp.array([jnp.sum((ctrl_w[i] - ctrl_w[j]) ** 2) for i, j in _PAIRS])


def _L6x10(V):
    """V: (12, 4) nullspace basis (columns = v1..v4, ascending eigenvalue).
    dv[k][pair] = v_k[i] - v_k[j] as 3-vectors; L rows follow the classic
    10-term expansion for betas (b11,b12,b22,b13,b23,b33,b14,b24,b34,b44)."""
    vs = [V[:, k].reshape(4, 3) for k in range(4)]
    rows = []
    for (i, j) in _PAIRS:
        dv = [vk[i] - vk[j] for vk in vs]
        row = jnp.array(
            [
                jnp.dot(dv[0], dv[0]),
                2.0 * jnp.dot(dv[0], dv[1]),
                jnp.dot(dv[1], dv[1]),
                2.0 * jnp.dot(dv[0], dv[2]),
                2.0 * jnp.dot(dv[1], dv[2]),
                jnp.dot(dv[2], dv[2]),
                2.0 * jnp.dot(dv[0], dv[3]),
                2.0 * jnp.dot(dv[1], dv[3]),
                2.0 * jnp.dot(dv[2], dv[3]),
                jnp.dot(dv[3], dv[3]),
            ]
        )
        rows.append(row)
    return jnp.stack(rows)  # (6, 10)


def _solve_lsq(A, b):
    """Least squares via normal equations with Tikhonov guard."""
    AtA = A.T @ A + 1e-9 * jnp.eye(A.shape[1])
    return jnp.linalg.solve(AtA, A.T @ b)


def _betas_case1(L, rho):
    # x = [b11, b12, b13, b14] using columns (0, 1, 3, 6)
    A = L[:, jnp.array([0, 1, 3, 6])]
    x = _solve_lsq(A, rho)
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b1 = jnp.where(x[0] < 0, b1, b1)  # magnitude; sign fixed by depth later
    return jnp.array([b1, x[1] / b1, x[2] / b1, x[3] / b1])


def _betas_case2(L, rho):
    # x = [b11, b12, b22] using columns (0, 1, 2)
    A = L[:, jnp.array([0, 1, 2])]
    x = _solve_lsq(A, rho)
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(x[2]), 1e-12))
    b2 = jnp.where(x[1] < 0, -b2, b2)
    return jnp.array([b1, b2, 0.0, 0.0])


def _betas_case3(L, rho):
    # x = [b11, b12, b22, b13, b23] using columns (0, 1, 2, 3, 4)
    A = L[:, :5]
    x = _solve_lsq(A, rho)
    b1 = jnp.sqrt(jnp.maximum(jnp.abs(x[0]), 1e-12))
    b2 = jnp.sqrt(jnp.maximum(jnp.abs(x[2]), 1e-12))
    b2 = jnp.where(x[1] < 0, -b2, b2)
    b3 = x[3] / b1
    return jnp.array([b1, b2, b3, 0.0])


def _gauss_newton_betas(L, rho, betas, iters: int = 5):
    """Refine betas minimizing ||L @ q(betas) - rho|| (reference
    gauss_newton, src/PnPsolver.cc:812-858)."""

    def q_and_J(b):
        b1, b2, b3, b4 = b[0], b[1], b[2], b[3]
        q = jnp.array(
            [b1 * b1, b1 * b2, b2 * b2, b1 * b3, b2 * b3, b3 * b3, b1 * b4, b2 * b4, b3 * b4, b4 * b4]
        )
        J = jnp.array(
            [
                [2 * b1, 0.0, 0.0, 0.0],
                [b2, b1, 0.0, 0.0],
                [0.0, 2 * b2, 0.0, 0.0],
                [b3, 0.0, b1, 0.0],
                [0.0, b3, b2, 0.0],
                [0.0, 0.0, 2 * b3, 0.0],
                [b4, 0.0, 0.0, b1],
                [0.0, b4, 0.0, b2],
                [0.0, 0.0, b4, b3],
                [0.0, 0.0, 0.0, 2 * b4],
            ]
        )
        return q, J

    def body(_, b):
        q, Jq = q_and_J(b)
        r = rho - L @ q
        J = L @ Jq  # (6, 4)
        db = _solve_lsq(J, r)
        return b + db

    return jax.lax.fori_loop(0, iters, body, betas)


def _pose_from_betas(V, betas, alphas, pts_w, w):
    """Camera control points = sum_k beta_k v_k; recover (R, t) via Horn."""
    x = V @ betas  # (12,)
    cc = x.reshape(4, 3)
    pc = alphas @ cc  # camera-frame points (n, 3)
    # Enforce positive depth: flip sign if weighted mean z < 0
    mean_z = jnp.sum(pc[:, 2] * w) / jnp.maximum(jnp.sum(w), 1e-9)
    sgn = jnp.where(mean_z < 0, -1.0, 1.0)
    pc = pc * sgn
    R, t, _ = horn_align(pc, pts_w, w=w, fix_scale=True)
    return R, t


def _reproj_err(R, t, pts_w, uv, w, fx, fy, cx, cy):
    pc = pts_w @ R.T + t
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
    u = fx * pc[:, 0] / z + cx
    v = fy * pc[:, 1] / z + cy
    e = (u - uv[:, 0]) ** 2 + (v - uv[:, 1]) ** 2
    return jnp.sum(e * w) / jnp.maximum(jnp.sum(w), 1e-9)


def epnp(pts_w, uv, w, fx, fy, cx, cy):
    """EPnP on weighted correspondences. w is a 0/1 mask (or weights).

    Returns (R, t, err): world->camera pose minimizing reprojection among the
    three beta cases (reference compute_pose, src/PnPsolver.cc:477-525).
    """
    ctrl_w = _control_points(pts_w, w)
    alphas = _barycentric(pts_w, ctrl_w)
    MtM = _build_MtM(alphas, uv, w, fx, fy, cx, cy)
    evals, evecs = jnp.linalg.eigh(MtM)
    V = evecs[:, :4]  # 4 smallest (v1 = smallest)
    L = _L6x10(V)
    rho = _rho(ctrl_w)

    candidates = []
    for init in (_betas_case1, _betas_case2, _betas_case3):
        b0 = init(L, rho)
        b = _gauss_newton_betas(L, rho, b0)
        R, t = _pose_from_betas(V, b, alphas, pts_w, w)
        err = _reproj_err(R, t, pts_w, uv, w, fx, fy, cx, cy)
        candidates.append((R, t, err))
    Rs = jnp.stack([c[0] for c in candidates])
    ts = jnp.stack([c[1] for c in candidates])
    errs = jnp.stack([c[2] for c in candidates])
    best = jnp.argmin(errs)
    return Rs[best], ts[best], errs[best]


@partial(jax.jit, static_argnames=("n_iters", "min_set"))
def ransac_epnp(
    key,
    pts_w,
    uv,
    mask,
    max_err2,
    fx,
    fy,
    cx,
    cy,
    n_iters: int = 300,
    min_set: int = 4,
):
    """Batched EPnP RANSAC (replaces reference PnPsolver::iterate,
    src/PnPsolver.cc:165-258, params from src/Tracking.cc:1495).

    Args:
      pts_w: (N, 3) candidate MapPoint positions.
      uv: (N, 2) matched keypoint pixels.
      mask: (N,) valid-correspondence mask.
      max_err2: (N,) per-correspondence squared-pixel gate
        (5.991 * sigma2 of the keypoint octave).

    Returns dict(R, t, inliers, n_inliers): the best hypothesis refined on
    its inlier set (reference Refine, src/PnPsolver.cc:260-305).
    """
    n = pts_w.shape[0]

    def sample(k):
        r = jax.random.uniform(k, (n,))
        r = jnp.where(mask, r, -1.0)
        return jax.lax.top_k(r, min_set)[1]

    keys = jax.random.split(key, n_iters)
    idx = jax.vmap(sample)(keys)

    def hyp(ids):
        w = jnp.ones(min_set)
        R, t, _ = epnp(pts_w[ids], uv[ids], w, fx, fy, cx, cy)
        pc = pts_w @ R.T + t
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
        pu = fx * pc[:, 0] / z + cx
        pv = fy * pc[:, 1] / z + cy
        e = (pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2
        inl = (e < max_err2) & (pc[:, 2] > 0) & mask
        return jnp.sum(inl), inl, R, t

    n_inl, inls, Rs, ts = jax.vmap(hyp)(idx)
    best = jnp.argmax(n_inl)
    best_inl = inls[best]
    # Refine on all inliers of the best hypothesis.
    Rr, tr, _ = epnp(pts_w, uv, best_inl.astype(pts_w.dtype), fx, fy, cx, cy)
    pc = pts_w @ Rr.T + tr
    z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
    pu = fx * pc[:, 0] / z + cx
    pv = fy * pc[:, 1] / z + cy
    e = (pu - uv[:, 0]) ** 2 + (pv - uv[:, 1]) ** 2
    inl_r = (e < max_err2) & (pc[:, 2] > 0) & mask
    # Keep refined pose only if it did not lose inliers.
    better = jnp.sum(inl_r) >= n_inl[best]
    R = jnp.where(better, Rr, Rs[best])
    t = jnp.where(better, tr, ts[best])
    inliers = jnp.where(better, inl_r, best_inl)
    return {"R": R, "t": t, "inliers": inliers, "n_inliers": jnp.sum(inliers)}
