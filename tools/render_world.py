"""Shared synthetic-image renderer for offline tools and slow tests.

Renders grayscale views of procedurally generated "blob worlds" (textured
square patches at random 3D positions over a low-frequency background) —
the image-domain counterpart of utils/synthetic.SyntheticWorld, used where
the FULL front-end chain (pyramid -> FAST -> BRIEF) must run on real pixel
data: vocabulary training (tools/make_vocab.py), place-recognition scale
gates, and the on-disk dataset synthesis of tools/make_dataset.py.

Host-side numpy only (no jax): callers feed the images to FrameFactory.
"""

from __future__ import annotations

import numpy as np


class BlobWorld:
    def __init__(self, pts, tex, sizes, seed, background):
        self.pts = pts
        self.tex = tex  # (n_pts, T, T) per-blob texture patch
        self.sizes = sizes
        self.seed = seed
        self.background = background  # (32, 32) coarse luminance field


TEX = 16  # per-blob texture resolution


def make_world(seed: int = 0, n_pts: int = 900, extent=(8.0, 5.0, 28.0),
               z_near: float = 3.0) -> BlobWorld:
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [
            rng.uniform(-extent[0], extent[0], n_pts),
            rng.uniform(-extent[1], extent[1], n_pts),
            rng.uniform(z_near, extent[2], n_pts),
        ],
        axis=1,
    )
    # Per-blob random texture: distinct local appearance per landmark so
    # descriptors identify PLACES (flat squares made every corner in every
    # world look alike — BoW recall collapsed to chance).
    tex = rng.uniform(20, 255, (n_pts, TEX, TEX)).astype(np.float32)
    # smooth so gradients survive scale resampling (aliased texture makes
    # the same blob look different at different distances, killing
    # descriptor repeatability)
    for _ in range(3):
        tex = (tex + np.roll(tex, 1, 1) + np.roll(tex, 1, 2)
               + np.roll(tex, -1, 1) + np.roll(tex, -1, 2)) / 5.0
    # stretch contrast back after smoothing
    tex = 20 + (tex - tex.min(axis=(1, 2), keepdims=True)) * (
        235.0 / np.maximum(np.ptp(tex, axis=(1, 2)).reshape(-1, 1, 1), 1e-3)
    )
    # Blob pixel size ~ sizes*6/z: BRIEF patches span 31 px, so blobs must
    # be large enough that descriptors sample BLOB texture, not the
    # (world-independent) background — small blobs collapsed cross-world
    # BoW separation to chance.
    sizes = rng.integers(6, 14, n_pts)
    # Per-world random smooth background (a shared sinusoid across worlds
    # fed every frame the same peripheral gradients, diluting place
    # distinctiveness).
    bg = rng.uniform(25, 70, (32, 32)).astype(np.float32)
    for _ in range(2):
        bg = (bg + np.roll(bg, 1, 0) + np.roll(bg, 1, 1)
              + np.roll(bg, -1, 0) + np.roll(bg, -1, 1)) / 5.0
    return BlobWorld(pts, tex, sizes, seed, bg)


def pose_for_view(view: int, orbit: float = 0.12, step: float = 0.35,
                  phase: float = 0.0):
    """A deterministic camera pose per view index: slow forward motion with
    yaw sweep, so consecutive views overlap (SLAM-like) while distant view
    indices see distinct parts of the world. `phase` decorrelates
    trajectories ACROSS worlds — identical per-view poses in every world
    made same-view-index frames alias on raw shared-word counts."""
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import lie

    yaw = orbit * np.sin(view * 0.31 + phase)
    xi = np.array([0.12 * view * np.cos(view * 0.13 + phase),
                   0.05 * np.sin(view * 0.7 + phase),
                   step * view, 0.03 * np.sin(view * 0.5 + phase), yaw, 0.0],
                  np.float32)
    Twc = np.asarray(lie.se3_exp(jnp.asarray(xi)))
    return np.linalg.inv(Twc).astype(np.float32)


def render_with_depth(world: BlobWorld, cam, H: int, W: int,
                      Tcw: np.ndarray, right_shift: float = 0.0):
    """Render one grayscale uint8 view + z-buffer depth map (meters; 0
    where only background). right_shift > 0 renders the right stereo
    camera (shift along +x in the camera frame by the baseline)."""
    pc = world.pts @ Tcw[:3, :3].T + Tcw[:3, 3]
    pc = pc.copy()
    pc[:, 0] -= right_shift
    z = pc[:, 2]
    with np.errstate(divide="ignore", invalid="ignore"):
        u = cam.fx * pc[:, 0] / z + cam.cx
        v = cam.fy * pc[:, 1] / z + cam.cy
    # bilinear-upsampled per-world background
    gy = np.linspace(0, 31, H)
    gx = np.linspace(0, 31, W)
    y0b = np.floor(gy).astype(int); x0b = np.floor(gx).astype(int)
    y1b = np.minimum(y0b + 1, 31); x1b = np.minimum(x0b + 1, 31)
    wyb = (gy - y0b)[:, None]; wxb = (gx - x0b)[None, :]
    B = world.background
    img = (B[np.ix_(y0b, x0b)] * (1 - wyb) * (1 - wxb)
           + B[np.ix_(y1b, x0b)] * wyb * (1 - wxb)
           + B[np.ix_(y0b, x1b)] * (1 - wyb) * wxb
           + B[np.ix_(y1b, x1b)] * wyb * wxb)
    depth = np.zeros((H, W), np.float32)
    ok = (z > 0.5) & (u > 4) & (u < W - 4) & (v > 4) & (v < H - 4)
    order = np.argsort(-z[np.nonzero(ok)[0]])  # far-to-near painter
    idx = np.nonzero(ok)[0][order]
    for i in idx:
        ui, vi = int(u[i]), int(v[i])
        s = max(1, int(round(world.sizes[i] * 6.0 / max(z[i], 1.0))))
        y0, y1 = max(0, vi - s), min(H, vi + s + 1)
        x0, x1 = max(0, ui - s), min(W, ui + s + 1)
        th, tw = y1 - y0, x1 - x0
        if th <= 0 or tw <= 0:
            continue
        # bilinear resample of the blob's texture to its pixel size
        fy = (np.arange(th) + 0.5) * TEX / max(2 * s + 1, 1) - 0.5
        fx = (np.arange(tw) + 0.5) * TEX / max(2 * s + 1, 1) - 0.5
        y0i = np.clip(np.floor(fy).astype(int), 0, TEX - 1)
        x0i = np.clip(np.floor(fx).astype(int), 0, TEX - 1)
        y1i = np.minimum(y0i + 1, TEX - 1)
        x1i = np.minimum(x0i + 1, TEX - 1)
        wy = np.clip(fy - y0i, 0, 1)[:, None]
        wx = np.clip(fx - x0i, 0, 1)[None, :]
        t = world.tex[i]
        img[y0:y1, x0:x1] = (
            t[np.ix_(y0i, x0i)] * (1 - wy) * (1 - wx)
            + t[np.ix_(y1i, x0i)] * wy * (1 - wx)
            + t[np.ix_(y0i, x1i)] * (1 - wy) * wx
            + t[np.ix_(y1i, x1i)] * wy * wx
        )
        depth[y0:y1, x0:x1] = z[i]
    return np.clip(img, 0, 255).astype(np.uint8), depth


def render_view(world: BlobWorld, cam, H: int, W: int, Tcw: np.ndarray,
                right_shift: float = 0.0) -> np.ndarray:
    return render_with_depth(world, cam, H, W, Tcw, right_shift)[0]


def render_frame(world: BlobWorld, cam, H: int, W: int, view: int) -> np.ndarray:
    return render_view(world, cam, H, W,
                       pose_for_view(view, phase=world.seed * 0.777))


def render_stereo(world: BlobWorld, cam, H: int, W: int, Tcw: np.ndarray):
    left = render_view(world, cam, H, W, Tcw)
    right = render_view(world, cam, H, W, Tcw, right_shift=cam.baseline)
    return left, right
