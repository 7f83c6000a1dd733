"""Horn 1987 closed-form absolute orientation (3D-3D alignment) in JAX.

TPU-native replacement of the reference Sim3Solver (src/Sim3Solver.cc):
the closed-form quaternion solution is evaluated for *all* RANSAC minimal
sets at once (vmap over the hypothesis axis + batched 4x4 eigen-
decomposition), and inliers are counted by mutual reprojection just like
reference Sim3Solver::CheckInliers (src/Sim3Solver.cc:340-365).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import lie


def horn_align(p1, p2, w=None, fix_scale: bool = False):
    """Solve p1 ~= s * R @ p2 + t in closed form.

    Args:
      p1, p2: (N, 3) corresponding 3D points.
      w: optional (N,) weights/mask.
      fix_scale: if True force s = 1 (stereo/RGB-D loop closing,
        reference mbFixScale, src/Sim3Solver.cc:292-309).

    Returns (R (3,3), t (3,), s scalar).
    """
    if w is None:
        w = jnp.ones(p1.shape[0], p1.dtype)
    wn = w / jnp.maximum(jnp.sum(w), 1e-9)
    c1 = jnp.sum(p1 * wn[:, None], axis=0)
    c2 = jnp.sum(p2 * wn[:, None], axis=0)
    q1 = p1 - c1
    q2 = p2 - c2
    # Cross-covariance M = sum w q1 q2^T
    M = (q1 * w[:, None]).T @ q2
    Sxx, Sxy, Sxz = M[0, 0], M[0, 1], M[0, 2]
    Syx, Syy, Syz = M[1, 0], M[1, 1], M[1, 2]
    Szx, Szy, Szz = M[2, 0], M[2, 1], M[2, 2]
    N = jnp.array(
        [
            [Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx],
            [Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz],
            [Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy],
            [Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz],
        ]
    )
    evals, evecs = jnp.linalg.eigh(N)
    q = evecs[:, 3]  # largest eigenvalue (eigh sorts ascending)
    qw, qx, qy, qz = q[0], q[1], q[2], q[3]
    # R(q) for this N-matrix convention maps p1->p2; transpose for p2->p1.
    R = jnp.array(
        [
            [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz), 2 * (qx * qz + qw * qy)],
            [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz), 2 * (qy * qz - qw * qx)],
            [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx), 1 - 2 * (qx * qx + qy * qy)],
        ]
    ).T
    rq2 = q2 @ R.T
    num = jnp.sum(jnp.sum(q1 * rq2, axis=-1) * w)
    den = jnp.sum(jnp.sum(rq2 * rq2, axis=-1) * w)
    s = jnp.where(fix_scale, 1.0, num / jnp.maximum(den, 1e-12))
    t = c1 - s * (R @ c2)
    return R, t, s


@partial(jax.jit, static_argnames=("n_iters", "fix_scale"))
def ransac_sim3(
    key,
    pts1_cam,
    pts2_cam,
    uv1,
    uv2,
    mask,
    max_err1,
    max_err2,
    fx,
    fy,
    cx,
    cy,
    n_iters: int = 300,
    fix_scale: bool = False,
):
    """Batched Sim3 RANSAC between two sets of camera-frame 3D points.

    Args mirror reference Sim3Solver: pts{1,2}_cam are the matched MapPoints
    expressed in each keyframe's camera frame (src/Sim3Solver.cc:57-81);
    max_err{1,2} are the per-match chi2*sigma2 gates (9.210 * sigma^2,
    src/Sim3Solver.cc:87-88); inliers require BOTH reprojections to pass
    (src/Sim3Solver.cc:340-365).

    Returns dict(S12 (4,4) sim3, inliers (N,), n_inliers, R, t, s).
    """
    n = pts1_cam.shape[0]

    def sample(k):
        r = jax.random.uniform(k, (n,))
        r = jnp.where(mask, r, -1.0)
        return jax.lax.top_k(r, 3)[1]

    keys = jax.random.split(key, n_iters)
    idx = jax.vmap(sample)(keys)

    def hyp(ids):
        R, t, s = horn_align(pts1_cam[ids], pts2_cam[ids], fix_scale=fix_scale)
        return R, t, s

    Rs, ts, ss = jax.vmap(hyp)(idx)

    def count_inliers(Rts):
        R, t, s = Rts
        # project p2 through S12 into camera 1 and p1 through S21 into cam 2
        p2_in1 = s * (pts2_cam @ R.T) + t
        p1_in2 = (pts1_cam - t) @ R / jnp.maximum(s, 1e-12)  # R^T @ (p-t)/s
        def proj(p):
            z = jnp.where(jnp.abs(p[:, 2]) > 1e-9, p[:, 2], 1e-9)
            return jnp.stack([fx * p[:, 0] / z + cx, fy * p[:, 1] / z + cy], axis=1)
        e1 = jnp.sum((proj(p2_in1) - uv1) ** 2, axis=1)
        e2 = jnp.sum((proj(p1_in2) - uv2) ** 2, axis=1)
        inl = (e1 < max_err1) & (e2 < max_err2) & mask
        return jnp.sum(inl), inl

    n_inl, inls = jax.vmap(count_inliers)((Rs, ts, ss))
    best = jnp.argmax(n_inl)
    R, t, s = Rs[best], ts[best], ss[best]
    return {
        "S12": lie.sim3_from_Rts(R, t, s),
        "R": R,
        "t": t,
        "s": s,
        "inliers": inls[best],
        "n_inliers": n_inl[best],
    }
