"""Camera projection / unprojection / triangulation as batched JAX ops.

Replaces the scattered per-point projection code of the reference
(Frame::isInFrustum reference src/Frame.cc:285-349, Frame::UnprojectStereo
src/Frame.cc:713-727, LocalMapping DLT triangulation src/LocalMapping.cc:396)
with array-level functions over whole point sets.

Conventions: Tcw maps world -> camera; pixel = K @ (Xc / z). Stereo right
coordinate u_r = u - bf / z (virtual right camera at baseline b = bf/fx).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def project(Tcw, pts_w, fx, fy, cx, cy):
    """Project world points into pixels.

    Args:
      Tcw: (4,4) world->camera.
      pts_w: (..., 3) world points.
    Returns:
      uv: (..., 2) pixel coords; z: (...,) camera depth.
    """
    pc = pts_w @ Tcw[:3, :3].T + Tcw[:3, 3]
    z = pc[..., 2]
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    u = fx * pc[..., 0] * inv_z + cx
    v = fy * pc[..., 1] * inv_z + cy
    return jnp.stack([u, v], axis=-1), z


def project_stereo(Tcw, pts_w, fx, fy, cx, cy, bf):
    """Project returning (u, v, u_right)."""
    uv, z = project(Tcw, pts_w, fx, fy, cx, cy)
    inv_z = 1.0 / jnp.where(jnp.abs(z) > 1e-9, z, 1e-9)
    ur = uv[..., 0] - bf * inv_z
    return jnp.concatenate([uv, ur[..., None]], axis=-1), z


def backproject(uv, z, fx, fy, cx, cy):
    """Pixels + depth -> camera-frame 3D points (reference src/Frame.cc:713)."""
    x = (uv[..., 0] - cx) * z / fx
    y = (uv[..., 1] - cy) * z / fy
    return jnp.stack([x, y, z], axis=-1)


def undistort_points(uv, fx, fy, cx, cy, k1, k2, p1, p2, k3, iters: int = 5):
    """Iterative radial-tangential undistortion (cv::undistortPoints model).

    Replaces Frame::UndistortKeyPoints (reference src/Frame.cc:429-459).
    No-op when all coefficients are zero (rectified input), matching the
    reference early-out at src/Frame.cc:432-436.
    """
    x0 = (uv[..., 0] - cx) / fx
    y0 = (uv[..., 1] - cy) / fy

    def body(_, xy):
        x, y = xy
        r2 = x * x + y * y
        rad = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
        dy = p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
        inv = 1.0 / jnp.maximum(rad, 1e-9)
        return ((x0 - dx) * inv, (y0 - dy) * inv)

    x, y = jax.lax.fori_loop(0, iters, body, (x0, y0))
    return jnp.stack([x * fx + cx, y * fy + cy], axis=-1)


def frustum_check(
    Tcw,
    pts_w,
    normals,
    min_dist,
    max_dist,
    fx,
    fy,
    cx,
    cy,
    min_x,
    max_x,
    min_y,
    max_y,
    view_cos_limit: float = 0.5,
):
    """Vectorized Frame::isInFrustum (reference src/Frame.cc:285-349).

    Args:
      pts_w: (N, 3) candidate map points.
      normals: (N, 3) mean viewing directions.
      min_dist/max_dist: (N,) scale-invariance distance ring (x0.8 / x1.2
        slack applied by the caller, matching MapPoint::GetMin/MaxDistance
        invariance factors reference src/MapPoint.cc:394-404).
    Returns:
      ok: (N,) bool; uv: (N, 2); z: (N,); dist: (N,); view_cos: (N,)
    """
    uv, z = project(Tcw, pts_w, fx, fy, cx, cy)
    in_img = (uv[..., 0] >= min_x) & (uv[..., 0] < max_x) & (uv[..., 1] >= min_y) & (uv[..., 1] < max_y)
    # Camera center in world = -R^T t
    Ow = -(Tcw[:3, :3].T @ Tcw[:3, 3])
    po = pts_w - Ow
    dist = jnp.linalg.norm(po, axis=-1)
    in_ring = (dist >= min_dist) & (dist <= max_dist)
    view_cos = jnp.sum(po * normals, axis=-1) / jnp.maximum(dist, 1e-9)
    ok = (z > 0.0) & in_img & in_ring & (view_cos > view_cos_limit)
    return ok, uv, z, dist, view_cos


def predict_scale(dist, max_dist, log_scale_factor, n_levels):
    """MapPoint::PredictScale (reference src/MapPoint.cc:406-444):
    level = ceil(log(max_dist / dist) / log(scale_factor)), clamped."""
    ratio = jnp.maximum(max_dist, 1e-9) / jnp.maximum(dist, 1e-9)
    level = jnp.ceil(jnp.log(jnp.maximum(ratio, 1e-9)) / log_scale_factor).astype(jnp.int32)
    return jnp.clip(level, 0, n_levels - 1)


def triangulate_dlt(T1, T2, uv1, uv2, fx, fy, cx, cy):
    """Two-view DLT triangulation via SVD of the 4x4 design matrix.

    Same construction as the reference (Initializer::Triangulate,
    src/Initializer.cc:734-747, and LocalMapping src/LocalMapping.cc:396-415)
    but batched: uv1/uv2 are (..., 2).

    Returns world points (..., 3) and a validity mask (nonzero w).
    """
    # Normalized camera rays (premultiply K^-1 so A rows are well-scaled).
    x1 = (uv1[..., 0] - cx) / fx
    y1 = (uv1[..., 1] - cy) / fy
    x2 = (uv2[..., 0] - cx) / fx
    y2 = (uv2[..., 1] - cy) / fy
    P1 = T1[:3, :]  # world->cam normalized projection
    P2 = T2[:3, :]

    def rows(P, x, y):
        r0 = x[..., None] * P[2] - P[0]
        r1 = y[..., None] * P[2] - P[1]
        return r0, r1

    a0, a1 = rows(P1, x1, y1)
    a2, a3 = rows(P2, x2, y2)
    A = jnp.stack([a0, a1, a2, a3], axis=-2)  # (..., 4, 4)
    # Null vector = right singular vector of smallest singular value.
    _, _, vt = jnp.linalg.svd(A)
    Xh = vt[..., 3, :]
    w = Xh[..., 3]
    ok = jnp.abs(w) > 1e-9
    X = Xh[..., :3] / jnp.where(ok, w, 1.0)[..., None]
    return X, ok


def parallax_cos(T1, T2, pts_w):
    """Cosine of the ray angle between the two camera centers and the point
    (used for the stereo-vs-triangulation decision, reference
    src/LocalMapping.cc:358-394)."""
    O1 = -(T1[:3, :3].T @ T1[:3, 3])
    O2 = -(T2[:3, :3].T @ T2[:3, 3])
    r1 = pts_w - O1
    r2 = pts_w - O2
    n1 = jnp.linalg.norm(r1, axis=-1)
    n2 = jnp.linalg.norm(r2, axis=-1)
    return jnp.sum(r1 * r2, axis=-1) / jnp.maximum(n1 * n2, 1e-9)


def fundamental_from_poses(T1w, T2w, fx, fy, cx, cy):
    """F12 from two world->cam poses and shared intrinsics
    (LocalMapping::ComputeF12, reference src/LocalMapping.cc:612-629)."""
    R1w, t1w = T1w[:3, :3], T1w[:3, 3]
    R2w, t2w = T2w[:3, :3], T2w[:3, 3]
    R12 = R1w @ R2w.T
    t12 = -R12 @ t2w + t1w
    t12x = jnp.array(
        [
            [0.0, -t12[2], t12[1]],
            [t12[2], 0.0, -t12[0]],
            [-t12[1], t12[0], 0.0],
        ]
    )
    K = jnp.array([[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]])
    Kinv = jnp.array(
        [[1.0 / fx, 0.0, -cx / fx], [0.0, 1.0 / fy, -cy / fy], [0.0, 0.0, 1.0]]
    )
    return Kinv.T @ t12x @ R12 @ Kinv


def epipolar_dist_sq(F12, uv1, uv2):
    """Squared distance of uv2 to the epipolar line of uv1 under F12
    (ORBmatcher::CheckDistEpipolarLine, reference src/ORBmatcher.cc:147-167).

    uv1: (..., 2) points in image 1; uv2: (..., 2) points in image 2.
    """
    a = uv1[..., 0] * F12[0, 0] + uv1[..., 1] * F12[1, 0] + F12[2, 0]
    b = uv1[..., 0] * F12[0, 1] + uv1[..., 1] * F12[1, 1] + F12[2, 1]
    c = uv1[..., 0] * F12[0, 2] + uv1[..., 1] * F12[1, 2] + F12[2, 2]
    num = a * uv2[..., 0] + b * uv2[..., 1] + c
    den = a * a + b * b
    return num * num / jnp.maximum(den, 1e-12)
