"""Stereo keypoint matching + RGB-D depth association.

Replaces Frame::ComputeStereoMatches (reference src/Frame.cc:496-686) and
Frame::ComputeStereoFromRGBD (src/Frame.cc:689-710) with dense masked array
ops: a full left-x-right Hamming matrix masked by the row band / disparity
range / octave constraints, argmin-reduced, then refined to sub-pixel by a
batched +-5 slide of 11x11 SAD windows gathered **from the pyramid atlas at
each keypoint's own level** with parabola interpolation — the same
algorithm as the reference's per-row candidate loop, expressed as
fixed-shape batch ops with a single gather per window.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.ops.frontend import hamming_distance

SAD_W = 5  # 11x11 window
SLIDE = 5  # +-5 sub-pixel search


def match_stereo(
    kpL_uv,
    kpL_uv_level,
    kpL_octave,
    kpL_valid,
    kpR_uv,
    kpR_octave,
    kpR_valid,
    descL,
    descR,
    atlasL,
    atlasR,
    level_offsets,
    level_w,
    level_h,
    scale_factors,
    min_d,
    max_d,
    bf,
    th_desc: float = 75.0,
    col_offset: int = 0,
):
    """Row-band stereo correspondence for all left keypoints at once.

    Args:
      kpL_uv/kpR_uv: (N,2)/(M,2) level-0 keypoint coords.
      kpL_uv_level: (N,2) left keypoints in their own level's pixels.
      atlasL/atlasR: packed pyramid atlases of both images.
      level_offsets/level_w/level_h: (L,) atlas row offset + level dims.
      min_d/max_d: disparity search range (reference: [0, fx], i.e. depth
        >= baseline, src/Frame.cc:534-536).
      th_desc: Hamming acceptance = (TH_HIGH + TH_LOW) / 2 (src/Frame.cc:547).

    Returns (u_right (N,), depth (N,)): -1 where unmatched.
    """
    N = kpL_uv.shape[0]
    dist = hamming_distance(descL, descR).astype(jnp.float32)  # (N, M)

    # Row band: |vR - vL| <= 2 * scale of the left keypoint's octave
    # (reference src/Frame.cc:518-531).
    rL = 2.0 * scale_factors[kpL_octave]
    dv = jnp.abs(kpR_uv[None, :, 1] - kpL_uv[:, None, 1])
    band = dv <= rL[:, None]
    d_oct = jnp.abs(kpR_octave[None, :] - kpL_octave[:, None])
    oct_ok = d_oct <= 1
    disp = kpL_uv[:, None, 0] - kpR_uv[None, :, 0]
    disp_ok = (disp >= min_d) & (disp <= max_d)
    valid = kpL_valid[:, None] & kpR_valid[None, :]
    mask = band & oct_ok & disp_ok & valid
    dist = jnp.where(mask, dist, 1e9)
    best_r = jnp.argmin(dist, axis=1)
    best_d = jnp.take_along_axis(dist, best_r[:, None], axis=1)[:, 0]
    matched = best_d < th_desc

    # --- SAD sub-pixel refinement on the atlas ----------------------------
    u_r0 = kpR_uv[best_r, 0]  # level-0 right u of best candidate
    inv_s = 1.0 / scale_factors[kpL_octave]
    off = jnp.take(level_offsets, kpL_octave)
    wl = jnp.take(level_w, kpL_octave)
    hl = jnp.take(level_h, kpL_octave)
    mrg = SAD_W + SLIDE + 1
    uL = jnp.clip(jnp.round(kpL_uv_level[:, 0]).astype(jnp.int32), mrg, wl - mrg - 1)
    vL = jnp.clip(jnp.round(kpL_uv_level[:, 1]).astype(jnp.int32), mrg, hl - mrg - 1)
    u0 = jnp.clip(jnp.round(u_r0 * inv_s).astype(jnp.int32), mrg, wl - mrg - 1)

    W11 = 2 * SAD_W + 1
    ayL = vL + off
    axL = uL + col_offset
    axR = u0 + col_offset
    winL = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(atlasL, (y - SAD_W, x - SAD_W), (W11, W11))
    )(ayL, axL)  # (N, 11, 11)
    winL = winL - winL[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]
    # Right: one wide window (11, 11 + 2*SLIDE) per keypoint, sliced below.
    wideR = jax.vmap(
        lambda y, x: jax.lax.dynamic_slice(
            atlasR, (y - SAD_W, x - SAD_W - SLIDE), (W11, W11 + 2 * SLIDE)
        )
    )(ayL, axR)  # (N, 11, 21)
    sads = []
    for s in range(2 * SLIDE + 1):
        winR = wideR[:, :, s : s + 2 * SAD_W + 1]
        winR = winR - winR[:, SAD_W : SAD_W + 1, SAD_W : SAD_W + 1]
        sads.append(jnp.sum(jnp.abs(winL - winR), axis=(1, 2)))
    sad = jnp.stack(sads, axis=1)  # (N, 11)
    best = jnp.argmin(sad, axis=1)
    bi = jnp.clip(best, 1, 2 * SLIDE - 1)
    s_m = jnp.take_along_axis(sad, (bi - 1)[:, None], 1)[:, 0]
    s_0 = jnp.take_along_axis(sad, bi[:, None], 1)[:, 0]
    s_p = jnp.take_along_axis(sad, (bi + 1)[:, None], 1)[:, 0]
    denom = jnp.maximum(2.0 * (s_m + s_p - 2.0 * s_0), 1e-6)
    delta = jnp.clip((s_m - s_p) / denom, -1.0, 1.0)
    at_edge = (best == 0) | (best == 2 * SLIDE)
    u_best = u0.astype(jnp.float32) + (bi - SLIDE).astype(jnp.float32) + delta
    u_right = u_best * scale_factors[kpL_octave]

    disp_final = kpL_uv[:, 0] - u_right
    ok = matched & ~at_edge & (disp_final >= min_d) & (disp_final < max_d)
    # Median SAD outlier cut (reference src/Frame.cc:670-685): sort accepted
    # matches by their best SAD cost and drop everything above
    # 1.5 * 1.4 * median — bad stereo depths would otherwise seed bad
    # map points directly.
    sad_best = jnp.take_along_axis(sad, best[:, None], 1)[:, 0]
    med = jnp.nanmedian(jnp.where(ok, sad_best, jnp.nan))
    thr = 1.5 * 1.4 * med
    ok = ok & jnp.where(jnp.isfinite(thr), sad_best <= thr, True)
    depth = jnp.where(ok, bf / jnp.maximum(disp_final, 1e-6), -1.0)
    u_right = jnp.where(ok, u_right, -1.0)
    return u_right, depth


def depth_to_uright(kp_uv, kp_valid, depth_map, depth_factor, bf):
    """RGB-D: read depth at each keypoint, synthesize virtual right u
    (reference ComputeStereoFromRGBD, src/Frame.cc:689-710)."""
    x = jnp.round(kp_uv[:, 0]).astype(jnp.int32)
    y = jnp.round(kp_uv[:, 1]).astype(jnp.int32)
    h, w = depth_map.shape
    x = jnp.clip(x, 0, w - 1)
    y = jnp.clip(y, 0, h - 1)
    d = depth_map[y, x] / depth_factor
    ok = (d > 0) & kp_valid
    u_right = jnp.where(ok, kp_uv[:, 0] - bf / jnp.maximum(d, 1e-9), -1.0)
    depth = jnp.where(ok, d, -1.0)
    return u_right, depth
