"""Relocalization: recover the pose of a lost frame from the keyframe
database (reference Tracking::Relocalization, src/Tracking.cc:1444-1635).

Pipeline per candidate keyframe (batched where possible):
  BoW candidates -> descriptor matching (>=15) -> EPnP RANSAC over the
  matched MapPoints -> pose optimization (>=10 inliers) -> projection
  rescue against the candidate's map points (th=10, ORBdist=100) ->
  pose optimization again, accept at >=50 inliers.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models import keyframe_db as kdb
from my_orb_slam2_tpu.models.frame import FrameData
from my_orb_slam2_tpu.ops import matching, pose_opt
from my_orb_slam2_tpu.ops.epnp import ransac_epnp
from my_orb_slam2_tpu.utils.config import SlamConfig


@functools.partial(jax.jit, static_argnames=("cfg",))
def _try_candidate(cfg: SlamConfig, state: ms.MapState, frame: FrameData, kf_id, key):
    """Attempt relocalization against one candidate keyframe.

    Returns (ok, Tcw, cur_mp, n_inliers).
    """
    cam = cfg.camera
    MP = state.mp_pos.shape[0]
    kf_mp = state.kf_mp[kf_id]
    has_mp = kf_mp >= 0
    # 1. descriptor matching frame -> candidate keypoints with map points
    idx, ok, dist = matching.search_brute(
        frame.desc,
        frame.valid,
        state.kf_desc[kf_id],
        state.kf_kp_valid[kf_id] & has_mp,
        frame.angle,
        state.kf_angle[kf_id],
        max_dist=float(cfg.matcher.th_low),
        ratio=0.75,
    )
    cur_mp = jnp.where(ok, jnp.take(kf_mp, idx), ms.INVALID)
    lm = jnp.where(cur_mp >= 0, cur_mp, 0)
    match_ok = (cur_mp >= 0) & jnp.take(state.mp_valid, lm)
    n_matches = jnp.sum(match_ok)

    # 2. EPnP RANSAC (reference params src/Tracking.cc:1495: 300 iters,
    # minSet 4, chi2 5.991 * sigma2).
    sf = cfg.orb.scale_factor
    sigma2 = jnp.asarray([sf ** (2 * l) for l in range(cfg.orb.n_levels)], jnp.float32)
    max_err2 = 5.991 * jnp.take(sigma2, frame.octave)
    pts_w = jnp.take(state.mp_pos, lm, axis=0)
    pnp = ransac_epnp(
        key, pts_w, frame.uv, match_ok, max_err2,
        cam.fx, cam.fy, cam.cx, cam.cy, n_iters=128,
    )
    Tcw0 = jnp.eye(4).at[:3, :3].set(pnp["R"]).at[:3, 3].set(pnp["t"])
    cur_mp1 = jnp.where(pnp["inliers"], cur_mp, ms.INVALID)

    # 3. pose optimization
    inv_s2 = 1.0 / jnp.take(sigma2, frame.octave)
    lm1 = jnp.where(cur_mp1 >= 0, cur_mp1, 0)
    m1 = (cur_mp1 >= 0) & jnp.take(state.mp_valid, lm1)
    po = pose_opt.pose_optimization(
        Tcw0, jnp.take(state.mp_pos, lm1, axis=0), frame.uv, frame.ur,
        inv_s2, m1, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    cur_mp2 = jnp.where(po["inliers"], cur_mp1, ms.INVALID)

    # 4. projection rescue: search the candidate KF's map points not yet
    # matched (reference :1548-1581, th=10, ORBdist=100).
    from my_orb_slam2_tpu.ops.projection import project_stereo

    kf_pts_mask = jnp.zeros((MP,), bool).at[jnp.where(has_mp, kf_mp, 0)].set(has_mp)
    kf_pts_mask = kf_pts_mask & state.mp_valid
    already = jnp.zeros((MP,), bool).at[jnp.where(cur_mp2 >= 0, cur_mp2, 0)].set(cur_mp2 >= 0)
    search = kf_pts_mask & ~already
    uvr, z = project_stereo(po["Tcw"], state.mp_pos, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    in_img = (
        (uvr[:, 0] >= 0) & (uvr[:, 0] < cam.width)
        & (uvr[:, 1] >= 0) & (uvr[:, 1] < cam.height) & (z > 0)
    )
    idx2, ok2, _ = matching.search_by_projection(
        uvr[:, :2],
        jnp.zeros((MP,), jnp.int32),
        search & in_img,
        state.mp_desc,
        jnp.full((MP,), 10.0),
        frame.uv,
        frame.octave,
        frame.valid,
        frame.desc,
        level_lo=jnp.zeros((MP,), jnp.int32),
        level_hi=jnp.full((MP,), cfg.orb.n_levels - 1, jnp.int32),
        max_dist=100.0,
        ratio=1.0,
        kp_taken=cur_mp2 >= 0,
    )
    N = frame.uv.shape[0]
    add_mp = jnp.full((N,), ms.INVALID, jnp.int32).at[
        jnp.where(ok2, idx2, N - 1)
    ].max(jnp.where(ok2, jnp.arange(MP), ms.INVALID), mode="drop")
    cur_mp3 = jnp.where(cur_mp2 >= 0, cur_mp2, add_mp)

    # 5. final pose optimization
    lm3 = jnp.where(cur_mp3 >= 0, cur_mp3, 0)
    m3 = (cur_mp3 >= 0) & jnp.take(state.mp_valid, lm3)
    po2 = pose_opt.pose_optimization(
        po["Tcw"], jnp.take(state.mp_pos, lm3, axis=0), frame.uv, frame.ur,
        inv_s2, m3, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    cur_mp_final = jnp.where(po2["inliers"], cur_mp3, ms.INVALID)
    n_final = po2["n_inliers"]

    # 6. second NARROW rescue when just under the acceptance bar
    # (reference src/Tracking.cc:1597-1608: 30 <= nGood < 50 -> re-search
    # with window 3 / ORBdist 64 around the refined pose, re-optimize).
    need2 = (n_final >= 30) & (n_final < 50)
    already2 = jnp.zeros((MP,), bool).at[
        jnp.where(cur_mp_final >= 0, cur_mp_final, 0)
    ].set(cur_mp_final >= 0)
    search2 = kf_pts_mask & ~already2
    uvr2, z2 = project_stereo(
        po2["Tcw"], state.mp_pos, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf
    )
    in_img2 = (
        (uvr2[:, 0] >= 0) & (uvr2[:, 0] < cam.width)
        & (uvr2[:, 1] >= 0) & (uvr2[:, 1] < cam.height) & (z2 > 0)
    )
    idx3, ok3, _ = matching.search_by_projection(
        uvr2[:, :2],
        jnp.zeros((MP,), jnp.int32),
        search2 & in_img2 & need2,
        state.mp_desc,
        jnp.full((MP,), 3.0),
        frame.uv,
        frame.octave,
        frame.valid,
        frame.desc,
        level_lo=jnp.zeros((MP,), jnp.int32),
        level_hi=jnp.full((MP,), cfg.orb.n_levels - 1, jnp.int32),
        max_dist=64.0,
        ratio=1.0,
        kp_taken=cur_mp_final >= 0,
    )
    add3 = jnp.full((N,), ms.INVALID, jnp.int32).at[
        jnp.where(ok3, idx3, N - 1)
    ].max(jnp.where(ok3, jnp.arange(MP), ms.INVALID), mode="drop")
    cur_mp4 = jnp.where(cur_mp_final >= 0, cur_mp_final, add3)
    # re-optimize only counts when the combined match set clears 50
    # (reference: nGood+nadditional>=50 gates the final optimization).
    run2 = need2 & (n_final + jnp.sum(ok3) >= 50)
    lm4 = jnp.where(cur_mp4 >= 0, cur_mp4, 0)
    m4 = (cur_mp4 >= 0) & jnp.take(state.mp_valid, lm4) & run2
    po3 = pose_opt.pose_optimization(
        po2["Tcw"], jnp.take(state.mp_pos, lm4, axis=0), frame.uv, frame.ur,
        inv_s2, m4, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf,
    )
    Tcw_out = jnp.where(run2, po3["Tcw"], po2["Tcw"])
    cur_out = jnp.where(
        run2, jnp.where(po3["inliers"], cur_mp4, ms.INVALID), cur_mp_final
    )
    n_out = jnp.where(run2, po3["n_inliers"], n_final)

    accept = (n_matches >= 15) & (pnp["n_inliers"] >= 4) & (n_out >= 50)
    return accept, Tcw_out, cur_out, n_out


class Relocalizer:
    """Host driver: query candidates, try each until one accepts."""

    def __init__(self, cfg: SlamConfig, vocab):
        self.cfg = cfg
        self.vocab = vocab
        self._key = jax.random.PRNGKey(7)

    def relocalize(self, state: ms.MapState, db: kdb.KfDatabase, frame: FrameData):
        words = self.vocab.words(frame.desc)
        ids, scores = kdb.detect_reloc_candidates(db, state, words, frame.valid)
        ids = np.asarray(ids)
        for kf_id in ids:
            if kf_id < 0:
                continue
            self._key, sub = jax.random.split(self._key)
            ok, Tcw, cur_mp, n = _try_candidate(
                self.cfg, state, frame, jnp.int32(int(kf_id)), sub
            )
            if bool(ok):
                return True, np.asarray(Tcw), cur_mp, int(n), int(kf_id)
        return False, None, None, 0, -1
