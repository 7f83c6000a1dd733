"""ORB feature extraction as vectorized JAX/XLA ops (the ORBextractor
replacement, reference src/ORBextractor.cc).

TPU-first design notes (vs the reference's per-pixel C++ loops):

- FAST is computed as a dense whole-image test: the 16-pixel Bresenham ring
  is materialized as 16 shifted copies of the image and the "9 contiguous
  brighter/darker" arc test becomes a reduction over the 16 cyclic arc
  starts — all VPU elementwise work, no scalar loops.
- The corner score is OpenCV's V-value: the largest threshold for which the
  pixel stays a corner, computed as max over arcs of the min arc contrast.
- Spatial uniformity: the reference runs a quadtree NMS keeping the best
  point per node (DistributeOctTree, src/ORBextractor.cc:539-765). We
  reproduce that contract with dense 3x3 NMS followed by per-cell top-m
  selection and a per-level global top-k by response — a fixed-shape,
  sort-based formulation.
- **Pyramid atlas**: all pyramid levels are packed into one 2D canvas
  (levels stacked vertically with reflected-border gaps). Orientation
  moments, BRIEF sampling and stereo SAD refinement then gather from the
  atlas with per-keypoint level offsets — one fused gather across all
  levels instead of a per-level loop. This replaces the reference's
  per-level cv::Mat vector + 19px EDGE_THRESHOLD borders
  (src/ORBextractor.cc:1129-1154) with the same geometry in a single
  TPU-friendly buffer.
- Orientation (IC_Angle, src/ORBextractor.cc:77-104) is a masked-moment
  reduction over gathered 31x31 patches.
- Descriptors: 256-pair rotated BRIEF over the 7x7 sigma=2 Gaussian-blurred
  atlas (src/ORBextractor.cc:108-147). The sampling pattern is a fixed
  deterministic Gaussian pattern (BRIEF-style, seed 42) rather than
  OpenCV's learned table: the engine is self-consistent (matcher,
  vocabulary and loop closing all use these descriptors), so
  cross-compatibility with OpenCV descriptors is not required. Descriptors
  are packed as 8 x uint32 words for XOR-popcount Hamming matching.

Per-level arrays have static shapes derived from the config; keypoints are
padded to fixed capacity with a validity mask.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.utils.config import OrbConfig

# FAST Bresenham circle of radius 3 (dy, dx), OpenCV 9_16 order.
FAST_RING = np.array(
    [
        (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
        (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
    ],
    dtype=np.int32,
)

EDGE = 19  # detection margin: all patch gathers stay inside the level
GAP = 8  # atlas inter-level gap (> blur radius + SAD slide margin bleed)


def _brief_pattern(seed: int = 42, n_bits: int = 256, radius: int = 13) -> np.ndarray:
    """Deterministic BRIEF sampling pattern: pairs ~ N(0, (patch/5)^2),
    clipped to `radius` so rotated samples stay inside the 31x31 patch.
    Returns int32 (n_bits, 4) = (x1, y1, x2, y2)."""
    rng = np.random.default_rng(seed)
    sigma = 31 / 5.0
    pts = rng.normal(0.0, sigma, size=(n_bits, 4))
    pts = np.clip(np.round(pts), -radius, radius).astype(np.int32)
    same = (pts[:, 0] == pts[:, 2]) & (pts[:, 1] == pts[:, 3])
    pts[same, 2] += 1
    return pts


def _gauss_kernel_1d(ksize: int = 7, sigma: float = 2.0) -> np.ndarray:
    r = ksize // 2
    x = np.arange(-r, r + 1, dtype=np.float64)
    k = np.exp(-(x * x) / (2 * sigma * sigma))
    return (k / k.sum()).astype(np.float32)


def blur_shift_add(img: jnp.ndarray, ksize: int = 7, sigma: float = 2.0) -> jnp.ndarray:
    """Separable Gaussian blur as shift-and-accumulate (pure VPU adds;
    single-channel conv layouts are slow on the MXU). Edges see zero
    padding — callers keep content away from edges (atlas gap rows)."""
    k = _gauss_kernel_1d(ksize, sigma)
    r = ksize // 2
    h, w = img.shape
    out = jnp.zeros_like(img)
    for i, ki in enumerate(k):
        s = i - r
        if s < 0:
            shifted = jnp.pad(img[:s, :], ((-s, 0), (0, 0)))
        elif s > 0:
            shifted = jnp.pad(img[s:, :], ((0, s), (0, 0)))
        else:
            shifted = img
        out = out + float(ki) * shifted
    img2 = out
    out = jnp.zeros_like(img2)
    for i, ki in enumerate(k):
        s = i - r
        if s < 0:
            shifted = jnp.pad(img2[:, :s], ((0, 0), (-s, 0)))
        elif s > 0:
            shifted = jnp.pad(img2[:, s:], ((0, 0), (0, s)))
        else:
            shifted = img2
        out = out + float(ki) * shifted
    return out


# Back-compat name used by tests/tools.
gaussian_blur = blur_shift_add


def fast_score_map(img: jnp.ndarray, threshold: float, arc: int = 9) -> jnp.ndarray:
    """Dense FAST-9/16 corner response over the full image.

    Returns (H, W) float32 score map: 0 for non-corners, else the OpenCV
    V-score (max threshold at which the pixel remains a corner).
    Border pixels (3px) score 0.
    """
    h, w = img.shape
    center = img
    rings = []
    for dy, dx in FAST_RING:
        rings.append(jnp.roll(img, (-int(dy), -int(dx)), axis=(0, 1)))
    ring = jnp.stack(rings)  # (16, H, W)
    diff = ring - center[None]

    def arc_max_min(d):
        """max over the 16 cyclic starts of (min over `arc` consecutive
        entries) — sliding-window min via log-step doubling (4 tensor mins
        instead of 16x9)."""
        m = d
        # m_k[i] = min(d[i .. i+2^k-1]) on the cyclic axis
        m = jnp.minimum(m, jnp.roll(m, -1, axis=0))  # window 2
        m = jnp.minimum(m, jnp.roll(m, -2, axis=0))  # window 4
        m = jnp.minimum(m, jnp.roll(m, -4, axis=0))  # window 8
        w9 = jnp.minimum(m, jnp.roll(d, -(arc - 1), axis=0))  # window 9
        return jnp.max(w9, axis=0)

    bright = arc_max_min(diff)
    dark = arc_max_min(-diff)
    score = jnp.maximum(bright, dark)
    is_corner = score > threshold
    score = jnp.where(is_corner, score, 0.0)
    ys = jnp.arange(h)[:, None]
    xs = jnp.arange(w)[None, :]
    interior = (ys >= 3) & (ys < h - 3) & (xs >= 3) & (xs < w - 3)
    return jnp.where(interior, score, 0.0)


def nms3x3(score: jnp.ndarray) -> jnp.ndarray:
    """Keep pixels that are the max of their 3x3 neighborhood."""
    neigh = jax.lax.reduce_window(score, -jnp.inf, jax.lax.max, (3, 3), (1, 1), "SAME")
    return jnp.where(score >= neigh, score, 0.0)


def fast_nms(img: jnp.ndarray, threshold: float, arc: int = 9) -> jnp.ndarray:
    """Dense FAST V-score + 3x3 NMS. On TPU this runs the fused Pallas
    kernel (ops/fast_pallas.py, ~4x faster, bit-exact); the XLA formulation
    remains the CPU/test path."""
    if jax.default_backend() in ("tpu", "axon"):
        from my_orb_slam2_tpu.ops.fast_pallas import fast_nms_pallas

        return fast_nms_pallas(img, threshold, arc)
    return nms3x3(fast_score_map(img, threshold, arc))


class LevelSpec(NamedTuple):
    h: int
    w: int
    scale: float  # multiply level coords by this to get level-0 coords
    n_cells_y: int
    n_cells_x: int
    quota: int  # number of keypoints retained at this level
    atlas_off: int  # row offset of this level inside the atlas


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (padded; `valid` masks live entries)."""

    uv: jnp.ndarray  # (K, 2) float32, level-0 pixel coords (x, y)
    uv_level: jnp.ndarray  # (K, 2) float32, own-level pixel coords
    response: jnp.ndarray  # (K,)
    octave: jnp.ndarray  # (K,) int32
    angle: jnp.ndarray  # (K,) float32 radians
    desc: jnp.ndarray  # (K, 8) uint32 packed 256-bit BRIEF
    valid: jnp.ndarray  # (K,) bool


class OrbExtractor:
    """Precomputes static pyramid/pattern metadata; `extract` is jitted.

    Usage: ex = OrbExtractor(cfg, height, width)
           kps, atlas, blurred_atlas = ex(image)
    """

    def __init__(self, cfg: OrbConfig, height: int, width: int, cell: int | None = None):
        self.cfg = cfg
        self.h0, self.w0 = height, width
        self.cell = cell or cfg.cell_size
        s = cfg.scale_factor
        inv = 1.0 / s
        total = (1.0 - inv ** cfg.n_levels) / (1.0 - inv)
        per0 = cfg.n_features / total
        quotas = [int(round(per0 * inv ** l)) for l in range(cfg.n_levels)]
        quotas[-1] = max(cfg.n_features - sum(quotas[:-1]), 8)
        self.levels = []
        off = GAP
        for l in range(cfg.n_levels):
            sc = s ** l
            h = int(round(height / sc))
            w = int(round(width / sc))
            self.levels.append(
                LevelSpec(
                    h=h,
                    w=w,
                    scale=sc,
                    n_cells_y=max(1, math.ceil(h / self.cell)),
                    n_cells_x=max(1, math.ceil(w / self.cell)),
                    quota=quotas[l],
                    atlas_off=off,
                )
            )
            off += h + GAP
        # Round atlas height up to a lane-friendly multiple. Columns get a
        # GAP margin on both sides so patch slices (radius PATCH_R, which
        # exceeds the EDGE detection margin by blur radius) stay in-bounds
        # with reflected-border content.
        self.atlas_h = ((off + 7) // 8) * 8
        self.atlas_w = width + 2 * GAP
        self.capacity = ((sum(q.quota for q in self.levels) + 127) // 128) * 128
        self.pattern = jnp.asarray(_brief_pattern())  # (256, 4)
        # Patch geometry: one raw (PATCH, PATCH) slice per keypoint serves
        # BOTH the orientation moments (circle radius 15) and the rotated
        # BRIEF samples. The 7x7 sigma=2 Gaussian blur that BRIEF reads
        # through is LINEAR, so it is folded into the selection matrix D
        # (each +-1 endpoint becomes a +-blur-kernel stamp): no blurred
        # atlas, no second gather. Required patch radius = pattern radius
        # 13 * sqrt2 (~18.4 -> 18) + blur radius 3 = 21.
        self.PATCH_R = 21
        self.PATCH = 2 * self.PATCH_R + 2  # 44
        P2 = self.PATCH * self.PATCH
        r = cfg.half_patch_size
        yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
        circ = (xx * xx + yy * yy) <= r * r
        # Moment matrix: patch_flat @ M -> (m10, m01).
        M = np.zeros((P2, 2), np.float32)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                if circ[dy + r, dx + r]:
                    f = (dy + self.PATCH_R) * self.PATCH + (dx + self.PATCH_R)
                    M[f, 0] = dx
                    M[f, 1] = dy
        self.moment_M = jnp.asarray(M)
        # Blur-folded BRIEF-as-matmul: bit_j = (raw_patch @ D[:, a*256+j])>0
        # where column (a*256+j) carries +blur2d stamped at the rotated
        # second endpoint and -blur2d at the first.
        self.N_ANGLE_BINS = 64
        pat = _brief_pattern().astype(np.float64)
        k1d = _gauss_kernel_1d(7, 2.0).astype(np.float64)
        blur2d = np.outer(k1d, k1d)  # (7, 7)
        D = np.zeros((P2, self.N_ANGLE_BINS * 256), np.float32)
        cols = np.arange(256)
        for a in range(self.N_ANGLE_BINS):
            th = 2.0 * np.pi * a / self.N_ANGLE_BINS
            ca, sa = np.cos(th), np.sin(th)
            x1 = np.round(pat[:, 0] * ca - pat[:, 1] * sa).astype(int)
            y1 = np.round(pat[:, 0] * sa + pat[:, 1] * ca).astype(int)
            x2 = np.round(pat[:, 2] * ca - pat[:, 3] * sa).astype(int)
            y2 = np.round(pat[:, 2] * sa + pat[:, 3] * ca).astype(int)
            for dy in range(-3, 4):
                for dx in range(-3, 4):
                    wgt = blur2d[dy + 3, dx + 3]
                    f1 = (y1 + dy + self.PATCH_R) * self.PATCH + (x1 + dx + self.PATCH_R)
                    f2 = (y2 + dy + self.PATCH_R) * self.PATCH + (x2 + dx + self.PATCH_R)
                    np.add.at(D, (f2, a * 256 + cols), wgt)
                    np.add.at(D, (f1, a * 256 + cols), -wgt)
        self.desc_D = jnp.asarray(D, jnp.bfloat16)
        self.scale_factors = jnp.asarray([lv.scale for lv in self.levels], jnp.float32)
        self.level_offsets = jnp.asarray([lv.atlas_off for lv in self.levels], jnp.int32)
        self.level_h = jnp.asarray([lv.h for lv in self.levels], jnp.int32)
        self.level_w = jnp.asarray([lv.w for lv in self.levels], jnp.int32)
        self._extract = jax.jit(self._extract_impl)

    # -- atlas -------------------------------------------------------------

    def build_atlas(self, img: jnp.ndarray) -> jnp.ndarray:
        """Pyramid levels stacked into one canvas with 3px reflected borders
        written into the gap (so blur near level edges behaves like
        BORDER_REFLECT, matching the reference's border handling)."""
        atlas = jnp.zeros((self.atlas_h, self.atlas_w), jnp.float32)
        G = GAP
        for l, spec in enumerate(self.levels):
            # Each level resizes directly from level 0 (independent ops the
            # compiler can overlap; avoids the serial resize chain and
            # compounding interpolation of the reference's pyramid).
            cur = img if l == 0 else jax.image.resize(img, (spec.h, spec.w), method="linear")
            o = spec.atlas_off
            atlas = atlas.at[o : o + spec.h, G : G + spec.w].set(cur)
            # 3px reflected borders into the gaps (rows and columns).
            atlas = atlas.at[o - 3 : o, G : G + spec.w].set(cur[1:4][::-1])
            atlas = atlas.at[o + spec.h : o + spec.h + 3, G : G + spec.w].set(cur[-4:-1][::-1])
            atlas = atlas.at[o : o + spec.h, G - 3 : G].set(cur[:, 1:4][:, ::-1])
            atlas = atlas.at[o : o + spec.h, G + spec.w : G + spec.w + 3].set(
                cur[:, -4:-1][:, ::-1]
            )
        return atlas

    # -- per level detection ----------------------------------------------

    def _detect_level(self, score_atlas, spec: LevelSpec, per_cell: int = 4):
        """Per-cell top-m + global top-quota on one level of the
        already-computed (atlas-wide) NMS'd FAST score map.

        Returns (xy (q, 2) int32 level coords, resp (q,), valid (q,)).
        """
        score = score_atlas[
            spec.atlas_off : spec.atlas_off + spec.h, GAP : GAP + spec.w
        ]
        h, w = spec.h, spec.w
        ys = jnp.arange(h)[:, None]
        xs = jnp.arange(w)[None, :]
        margin = EDGE
        ok = (ys >= margin) & (ys < h - margin) & (xs >= margin) & (xs < w - margin)
        score = jnp.where(ok, score, 0.0)
        Hc, Wc = spec.n_cells_y, spec.n_cells_x
        ph, pw = Hc * self.cell, Wc * self.cell
        sp = jnp.zeros((ph, pw), score.dtype).at[:h, :w].set(score)
        cells = sp.reshape(Hc, self.cell, Wc, self.cell).transpose(0, 2, 1, 3).reshape(
            Hc * Wc, self.cell * self.cell
        )
        vals, idx = jax.lax.top_k(cells, per_cell)
        cy = jax.lax.broadcasted_iota(jnp.int32, (Hc * Wc, per_cell), 0) // Wc
        cx = jax.lax.broadcasted_iota(jnp.int32, (Hc * Wc, per_cell), 0) % Wc
        py = idx // self.cell
        px = idx % self.cell
        y = (cy * self.cell + py).reshape(-1)
        x = (cx * self.cell + px).reshape(-1)
        vals = vals.reshape(-1)
        q = min(spec.quota, vals.shape[0])
        top_vals, top_i = jax.lax.top_k(vals, q)
        xy = jnp.stack([x[top_i], y[top_i]], axis=1)
        return xy, top_vals, top_vals > 0.0

    # -- keypoint-level ops on the atlas ----------------------------------

    def _gather_patches(self, atlas, ax, ay):
        """(K, PATCH*PATCH) contiguous patch slices around atlas coords
        (vmapped dynamic_slice lowers to a slice-gather — ~4x faster than
        element gathers on TPU)."""
        P = self.PATCH
        R = self.PATCH_R

        def one(y, x):
            return jax.lax.dynamic_slice(atlas, (y - R, x - R), (P, P))

        return jax.vmap(one)(ay, ax).reshape(ax.shape[0], P * P)

    def _orientation_from_patches(self, patches_flat):
        """IC_Angle via moment matmul: (K,) angles in radians."""
        m = patches_flat @ self.moment_M  # (K, 2) = (m10, m01)
        return jnp.arctan2(m[:, 1], m[:, 0])

    def _descriptors_from_patches(self, patches_flat, angle):
        """Rotated BRIEF as one MXU matmul over all angle bins + per-kp bin
        selection; packed to (K, 8) uint32."""
        K = patches_flat.shape[0]
        A = self.N_ANGLE_BINS
        two_pi = 2.0 * jnp.pi
        ang = jnp.mod(angle, two_pi)
        bin_ = jnp.round(ang * (A / two_pi)).astype(jnp.int32) % A
        diffs = jax.lax.dot_general(
            patches_flat.astype(jnp.bfloat16),
            self.desc_D,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (K, A*256)
        sel = jax.vmap(
            lambda row, b: jax.lax.dynamic_slice(row, (b * 256,), (256,))
        )(diffs, bin_)
        bits = (sel > 0).astype(jnp.uint32).reshape(K, 8, 32)
        weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
        return jnp.sum(bits * weights, axis=2, dtype=jnp.uint32)

    # -- whole image -------------------------------------------------------

    def _extract_impl(self, image):
        """image: (H, W) float32 grayscale in [0, 255].

        Returns (Keypoints, atlas, blurred_atlas).
        """
        img = image.astype(jnp.float32)
        atlas = self.build_atlas(img)
        # FAST + NMS once over the whole atlas (gap rows carry reflected
        # borders, so level-edge responses behave like per-level reflect
        # padding; the EDGE detection margin excludes them regardless).
        score_atlas = fast_nms(atlas, float(self.cfg.min_th_fast), self.cfg.fast_arc)

        xs, ys, resps, octs, valids = [], [], [], [], []
        for l, spec in enumerate(self.levels):
            xy, resp, valid = self._detect_level(score_atlas, spec)
            xs.append(xy[:, 0])
            ys.append(xy[:, 1])
            resps.append(resp)
            octs.append(jnp.full(xy.shape[0], l, jnp.int32))
            valids.append(valid)
        x = jnp.concatenate(xs)
        y = jnp.concatenate(ys)
        resp = jnp.concatenate(resps)
        octv = jnp.concatenate(octs)
        valid = jnp.concatenate(valids)

        off = jnp.take(self.level_offsets, octv)
        ax = x + GAP
        ay = y + off
        # ONE raw-patch gather feeds both moments and (blur-folded) BRIEF.
        raw_patches = self._gather_patches(atlas, ax, ay)
        ang = self._orientation_from_patches(raw_patches)
        desc = self._descriptors_from_patches(raw_patches, ang)
        sc = jnp.take(self.scale_factors, octv)
        uv0 = jnp.stack([x.astype(jnp.float32) * sc, y.astype(jnp.float32) * sc], axis=1)
        uv_level = jnp.stack([x, y], axis=1).astype(jnp.float32)

        pad = self.capacity - uv0.shape[0]
        if pad > 0:
            uv0 = jnp.pad(uv0, ((0, pad), (0, 0)))
            uv_level = jnp.pad(uv_level, ((0, pad), (0, 0)))
            resp = jnp.pad(resp, (0, pad))
            octv = jnp.pad(octv, (0, pad))
            ang = jnp.pad(ang, (0, pad))
            desc = jnp.pad(desc, ((0, pad), (0, 0)))
            valid = jnp.pad(valid, (0, pad))
        kps = Keypoints(
            uv=uv0, uv_level=uv_level, response=resp, octave=octv,
            angle=ang, desc=desc, valid=valid,
        )
        return kps, atlas

    def __call__(self, image):
        return self._extract(image)


def unpack_pm1(desc: jnp.ndarray) -> jnp.ndarray:
    """Unpack (N, 8) uint32 descriptors to (N, 256) int8 in {-1, +1}."""
    bits = (desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]) & 1
    return (bits.astype(jnp.int8) * 2 - 1).reshape(desc.shape[0], 256)


def hamming_distance(desc1: jnp.ndarray, desc2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise Hamming distance matrix between packed descriptors.

    desc1: (N, 8) uint32, desc2: (M, 8) uint32 -> (N, M) int32 in [0, 256].
    Replaces reference ORBmatcher::DescriptorDistance
    (src/ORBmatcher.cc:1715-1731). Computed on the MXU as an int8 {-1,+1}
    dot product: hamming = (256 - s1.s2) / 2 — exact, and faster than the
    VPU xor+popcount over the (N, M, 8) cube for the sizes the matchers use.
    """
    s1 = unpack_pm1(desc1)
    s2 = unpack_pm1(desc2)
    dot = jax.lax.dot_general(
        s1, s2, (((1,), (1,)), ((), ())), preferred_element_type=jnp.int32
    )
    return (256 - dot) >> 1
