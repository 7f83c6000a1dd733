"""Correspondence search kernels (the ORBmatcher replacement).

Every search in the reference (src/ORBmatcher.cc, 9 SearchBy* variants + 2
Fuse variants) reduces to the same TPU-friendly shape: build a (queries x
candidates) Hamming-distance matrix, mask it by the variant's geometric
gates (projection window, scale window, epipolar band, stereo-u consistency,
viewing angle), reduce with best/second-best + ratio test, then enforce
one-to-one assignment and optionally rotation consistency. This module
provides those building blocks plus the assembled variants.

All shapes are static; invalid rows/columns are masked with a large
sentinel distance (BIG).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops.frontend import hamming_distance

BIG = jnp.float32(1e9)
TH_HIGH = 100.0
TH_LOW = 50.0
HISTO_LENGTH = 30


def masked_best2(dist, mask):
    """Best and second-best over axis 1 under mask.

    Returns (best_idx, best, second): `best`/`second` are BIG where no
    candidate passes the mask.
    """
    d = jnp.where(mask, dist, BIG)
    best_idx = jnp.argmin(d, axis=1)
    best = jnp.take_along_axis(d, best_idx[:, None], 1)[:, 0]
    # Second-best WITHOUT the row scatter: .at[rows, best].set(BIG) forces a
    # full copy of the (Q, M) matrix (hundreds of MB at fuse/track shapes);
    # the where-mask fuses into the reduction and materializes nothing.
    cols = jnp.arange(d.shape[1], dtype=best_idx.dtype)
    second = jnp.min(
        jnp.where(cols[None, :] == best_idx[:, None], BIG, d), axis=1
    )
    return best_idx, best, second


def ratio_test(best, second, ratio):
    """Lowe ratio: accept if best < ratio * second (reference applies it as
    bestDist <= ratio * bestDist2, e.g. src/ORBmatcher.cc:112)."""
    return best <= ratio * second


def one_to_one(match_idx, match_dist, ok, n_targets: int):
    """Resolve duplicate target assignments, keeping the lowest distance.

    The reference does this incrementally (erasing the previous match when a
    better one arrives, e.g. Fuse src/ORBmatcher.cc:1006-1025); here it's a
    scatter-min: for each target, find the best source, then keep only
    sources that are their target's argmin.
    """
    src = jnp.arange(match_idx.shape[0])
    d = jnp.where(ok, match_dist, BIG)
    # scatter-min distance per target
    tgt_best = jnp.full((n_targets,), BIG).at[match_idx].min(d)
    mine = jnp.take(tgt_best, match_idx)
    keep = ok & (d <= mine)
    # Tie-break duplicates with equal distance: keep lowest source index.
    first_src = (
        jnp.full((n_targets,), match_idx.shape[0], dtype=src.dtype)
        .at[match_idx]
        .min(jnp.where(keep, src, match_idx.shape[0]))
    )
    keep = keep & (jnp.take(first_src, match_idx) == src)
    return keep


def rotation_consistency(dangle, ok, histo_length: int = HISTO_LENGTH, keep_top: int = 3):
    """30-bin rotation histogram filter (reference ComputeThreeMaxima,
    src/ORBmatcher.cc:1669-1710): keep matches whose angle difference falls
    in one of the 3 most populated bins.

    dangle: (N,) angle differences in radians; ok: (N,) current validity.
    """
    two_pi = 2.0 * jnp.pi
    a = jnp.mod(dangle, two_pi)  # [0, 2pi)
    bin_f = a * (histo_length / two_pi)
    bins = jnp.clip(jnp.round(bin_f).astype(jnp.int32), 0, histo_length)
    bins = jnp.where(bins == histo_length, 0, bins)
    counts = jnp.zeros(histo_length, jnp.int32).at[bins].add(ok.astype(jnp.int32))
    top_vals, top_idx = jax.lax.top_k(counts, keep_top)
    # Reference drops bins 2/3 when much smaller than max (0.1 * max).
    th = 0.1 * top_vals[0].astype(jnp.float32)
    sel = jnp.where(top_vals.astype(jnp.float32) > th, top_idx, -1)
    in_top = (bins[:, None] == sel[None, :]).any(axis=1)
    return ok & in_top


def word_bucket_mask(words1, words2, bucket_div: int):
    """Direct-index gate (DBoW2 FeatureVector analog, reference
    src/ORBmatcher.cc:702-877 joins matches per vocabulary node at a fixed
    level): candidates must share the vocabulary node `word // bucket_div`
    (= the ancestor bucket_div==k^levels_up levels above the leaves of the
    packed k-ary tree). Entries with word < 0 (no vocabulary at insertion,
    e.g. monocular-init keyframes) stay unrestricted.

    Returns a (N1, N2) bool mask.
    """
    b1 = jnp.where(words1 >= 0, words1 // bucket_div, -1)
    b2 = jnp.where(words2 >= 0, words2 // bucket_div, -1)
    same = b1[:, None] == b2[None, :]
    return same | (b1 < 0)[:, None] | (b2 < 0)[None, :]


# ---------------------------------------------------------------------------
# Assembled search variants
# ---------------------------------------------------------------------------


def search_by_projection(
    pred_uv,
    pred_level,
    pred_valid,
    pt_desc,
    radius,
    kp_uv,
    kp_octave,
    kp_valid,
    kp_desc,
    kp_ur=None,
    pred_ur=None,
    level_lo=None,
    level_hi=None,
    max_dist: float = TH_HIGH,
    ratio: float = 0.9,
    kp_taken=None,
):
    """Generic projection-window search: one query row per map point.

    Covers reference SearchByProjection variants (1), (2), (3), (4)
    (src/ORBmatcher.cc:46,1392,1540,321): the caller supplies the predicted
    projection, per-point search radius (already scaled by octave / view
    angle), and the allowed octave window.

    Args:
      pred_uv: (P, 2) predicted pixel positions of map points.
      pred_level: (P,) predicted octave.
      radius: (P,) search radius in level-0 pixels.
      level_lo/level_hi: (P,) inclusive octave window (defaults pred-1..pred).
      pred_ur/kp_ur: optional stereo right-u consistency (within radius)
        (reference src/ORBmatcher.cc:1475-1481).
      kp_taken: (K,) bool — keypoints already bound to a map point (skipped),
        reference src/ORBmatcher.cc:67-72.

    Returns (match_idx (P,), ok (P,), dist (P,)).
    """
    if level_lo is None:
        level_lo = pred_level - 1
    if level_hi is None:
        level_hi = pred_level
    du = kp_uv[None, :, 0] - pred_uv[:, None, 0]
    dv = kp_uv[None, :, 1] - pred_uv[:, None, 1]
    r = radius[:, None]
    window = (jnp.abs(du) < r) & (jnp.abs(dv) < r)
    lvl = (kp_octave[None, :] >= level_lo[:, None]) & (kp_octave[None, :] <= level_hi[:, None])
    mask = window & lvl & kp_valid[None, :] & pred_valid[:, None]
    if kp_taken is not None:
        mask = mask & ~kp_taken[None, :]
    if pred_ur is not None and kp_ur is not None:
        has_stereo = kp_ur[None, :] >= 0
        er = jnp.abs(pred_ur[:, None] - kp_ur[None, :])
        mask = mask & (~has_stereo | (er < r))
    dist = hamming_distance(pt_desc, kp_desc).astype(jnp.float32)
    idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & pred_valid
    # Ratio test only applies when best and second are on the same octave in
    # the reference (src/ORBmatcher.cc:117-121); we apply it unconditionally
    # (slightly stricter, protects against ambiguous matches).
    ok = ok & (ratio_test(best, second, ratio) | (second >= BIG))
    keep = one_to_one(idx, best, ok, kp_uv.shape[0])
    return idx, keep, best


def search_brute(
    desc1,
    valid1,
    desc2,
    valid2,
    angle1=None,
    angle2=None,
    max_dist: float = TH_LOW,
    ratio: float = 0.7,
    check_rotation: bool = True,
    words1=None,
    words2=None,
    bucket_div: int = 0,
):
    """Descriptor-only matching between two feature sets.

    Plays the role of reference SearchByBoW (src/ORBmatcher.cc:182,563).
    The reference restricts candidate pairs to shared vocabulary nodes (the
    DBoW2 "direct index", FeatureVector at levelsup=4) — a CPU pruning
    trick that skips Hamming evaluations. On TPU the full distance matrix
    is ONE MXU matmul whose cost a sparsity mask cannot reduce (the matmul
    runs either way), so the engine deliberately has no direct index:
    where candidate-set size matters (triangulation, fuse, local-map
    search) the candidate axis is COMPACTED instead (nonzero + static
    bound), which shrinks the matmul itself.

    Returns (idx (N1,), ok (N1,), dist (N1,)).
    """
    dist = hamming_distance(desc1, desc2).astype(jnp.float32)
    mask = valid1[:, None] & valid2[None, :]
    if bucket_div and words1 is not None and words2 is not None:
        mask = mask & word_bucket_mask(words1, words2, bucket_div)
    idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & ratio_test(best, second, ratio) & valid1
    if check_rotation and angle1 is not None and angle2 is not None:
        dang = angle1 - jnp.take(angle2, idx)
        ok = rotation_consistency(dang, ok)
    keep = one_to_one(idx, best, ok, desc2.shape[0])
    return idx, keep, best


def search_for_initialization(
    kp1_uv,
    kp1_valid,
    desc1,
    angle1,
    kp2_uv,
    kp2_octave,
    kp2_valid,
    desc2,
    angle2,
    prev_matched_uv,
    window: float = 100.0,
    max_dist: float = TH_LOW,
    ratio: float = 0.9,
):
    """Monocular initialization matching (reference SearchForInitialization,
    src/ORBmatcher.cc:446-561): level-0 keypoints only, window around the
    previously matched position, ratio + rotation checks.
    """
    du = kp2_uv[None, :, 0] - prev_matched_uv[:, None, 0]
    dv = kp2_uv[None, :, 1] - prev_matched_uv[:, None, 1]
    mask = (
        (jnp.abs(du) < window)
        & (jnp.abs(dv) < window)
        & (kp2_octave[None, :] == 0)
        & kp2_valid[None, :]
        & kp1_valid[:, None]
    )
    dist = hamming_distance(desc1, desc2).astype(jnp.float32)
    idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & ratio_test(best, second, ratio) & kp1_valid
    dang = angle1 - jnp.take(angle2, idx)
    ok = rotation_consistency(dang, ok)
    keep = one_to_one(idx, best, ok, kp2_uv.shape[0])
    return idx, keep, best


def search_for_triangulation(
    kp1_uv,
    kp1_valid,
    kp1_has_mp,
    desc1,
    angle1,
    kp1_ur,
    kp2_uv,
    kp2_octave,
    kp2_valid,
    kp2_has_mp,
    desc2,
    angle2,
    kp2_ur,
    F12,
    epipole_uv,
    sigma2_level2,
    max_dist: float = TH_LOW,
    check_rotation: bool = False,
    words1=None,
    words2=None,
    bucket_div: int = 0,
):
    """Epipolar-constrained matching between two keyframes for new-point
    triangulation (reference SearchForTriangulation, src/ORBmatcher.cc:702):
    skips keypoints that already have MapPoints, requires the match to lie
    near the epipolar line (chi2 3.84 * sigma2 of the octave), and rejects
    matches too close to the epipole of the second image
    (src/ORBmatcher.cc:789-800).

    sigma2_level2: (K2,) sigma^2 of each kp2's octave.
    """
    from my_orb_slam2_tpu.ops.projection import epipolar_dist_sq

    # Epipolar distance of each kp2 to line of each kp1: (K1, K2)
    d_epi = epipolar_dist_sq(F12, kp1_uv[:, None, :], kp2_uv[None, :, :])
    epi_ok = d_epi < 3.84 * sigma2_level2[None, :]
    # Epipole proximity rejection (only applies to mono kp1: stereo kp1 can
    # triangulate close points reliably, src/ORBmatcher.cc:788-800).
    de = kp2_uv - epipole_uv[None, :]
    dist_e2 = de[:, 0] ** 2 + de[:, 1] ** 2
    # threshold 100 * scale of kp2's octave (reference ex2+ey2 < 100*sf)
    from my_orb_slam2_tpu.ops.frontend import OrbExtractor  # noqa: F401 (doc ref)

    mask = (
        kp1_valid[:, None]
        & kp2_valid[None, :]
        & ~kp1_has_mp[:, None]
        & ~kp2_has_mp[None, :]
        & epi_ok
    )
    mono1 = kp1_ur[:, None] < 0
    scale2 = jnp.power(1.2, kp2_octave.astype(jnp.float32))
    far_from_epipole = dist_e2[None, :] >= 100.0 * scale2[None, :]
    mask = mask & (~mono1 | far_from_epipole)
    if bucket_div and words1 is not None and words2 is not None:
        mask = mask & word_bucket_mask(words1, words2, bucket_div)

    dist = hamming_distance(desc1, desc2).astype(jnp.float32)
    idx, best, second = masked_best2(dist, mask)
    ok = (best <= max_dist) & kp1_valid
    if check_rotation:
        dang = angle1 - jnp.take(angle2, idx)
        ok = rotation_consistency(dang, ok)
    keep = one_to_one(idx, best, ok, kp2_uv.shape[0])
    return idx, keep, best


def search_by_sim3(
    pts1_w,
    valid1,
    desc1,
    pts2_w,
    valid2,
    desc2,
    T1w,
    T2w,
    S12,
    kp1_uv,
    kp1_octave,
    kp2_uv,
    kp2_octave,
    scale_factors,
    fx,
    fy,
    cx,
    cy,
    th: float = 7.5,
    max_dist: float = TH_HIGH,
):
    """Mutual projection matching under a Sim3 guess (reference SearchBySim3,
    src/ORBmatcher.cc:1158-1390): project KF2's points into KF1 via S12 and
    KF1's into KF2 via S21; accept agreements.

    pts{1,2}_w are the MapPoints observed by each keyframe (aligned with its
    keypoint slots). Returns a match per kp1 slot.
    """
    from my_orb_slam2_tpu.ops import lie

    S21 = lie.sim3_inverse(S12)

    def project_set(T_cw, S, pts, kp_uv_t, kp_oct_t):
        # world -> camera of other KF -> sim3 into this KF's camera
        pc = lie.se3_apply(T_cw, pts)
        pc = lie.sim3_apply(S, pc)
        z = jnp.where(jnp.abs(pc[:, 2]) > 1e-9, pc[:, 2], 1e-9)
        u = fx * pc[:, 0] / z + cx
        v = fy * pc[:, 1] / z + cy
        return jnp.stack([u, v], axis=1), pc[:, 2]

    # Project pts2 into camera 1 through S12 (and T2w first).
    uv2_in1, z2 = project_set(T2w, S12, pts2_w, kp1_uv, kp1_octave)
    # Search window radius by the candidate keypoint octave.
    r1 = th * scale_factors[kp1_octave]
    du = uv2_in1[None, :, 0] - kp1_uv[:, None, 0] * 0  # placeholder alignment
    # (K1 queries) x (P2 candidates): distance between kp1 and projected pts2
    d_u = kp1_uv[:, None, 0] - uv2_in1[None, :, 0]
    d_v = kp1_uv[:, None, 1] - uv2_in1[None, :, 1]
    win = (jnp.abs(d_u) < r1[:, None]) & (jnp.abs(d_v) < r1[:, None])
    mask = win & valid2[None, :] & (z2[None, :] > 0)
    dist = hamming_distance(desc1, desc2).astype(jnp.float32)
    idx12, best12, second12 = masked_best2(dist, mask)
    ok12 = best12 <= max_dist

    # Reverse direction: project pts1 into camera 2 through S21.
    uv1_in2, z1 = project_set(T1w, S21, pts1_w, kp2_uv, kp2_octave)
    r2 = th * scale_factors[kp2_octave]
    d_u2 = kp2_uv[:, None, 0] - uv1_in2[None, :, 0]
    d_v2 = kp2_uv[:, None, 1] - uv1_in2[None, :, 1]
    win2 = (jnp.abs(d_u2) < r2[:, None]) & (jnp.abs(d_v2) < r2[:, None])
    mask2 = win2 & valid1[None, :] & (z1[None, :] > 0)
    idx21, best21, _ = masked_best2(dist.T, mask2)
    ok21 = best21 <= max_dist

    # Agreement: kp1 i matched to j, and kp2 j matched back to i.
    back = jnp.take(idx21, idx12)
    agree = ok12 & jnp.take(ok21, idx12) & (back == jnp.arange(idx12.shape[0]))
    return idx12, agree & valid1, best12
