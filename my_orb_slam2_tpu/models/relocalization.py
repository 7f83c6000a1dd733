"""Relocalization: recover the pose of a lost frame from the keyframe
database (reference Tracking::Relocalization, src/Tracking.cc:1444-1635).

Pipeline per candidate keyframe:
  BoW candidates -> descriptor matching (>=15) -> EPnP RANSAC over the
  matched MapPoints -> pose optimization (>=10 inliers) -> projection
  rescue against the candidate's map points (th=10, ORBdist=100) ->
  pose optimization again, accept at >=50 inliers.

All candidates are evaluated in ONE device dispatch (`lax.map` over the
candidate axis) and the accepted candidate with the most inliers wins —
the TPU-native equivalent of the reference's round-robin over candidates
(src/Tracking.cc:1519-1530 alternates 5 RANSAC iterations per candidate
so no single candidate's 300 iterations block the others; batching removes
the ordering entirely and the host pays one round-trip instead of up to
`max_candidates` sequential dispatch chains while lost).

The projection-rescue searches are COMPACTED to the candidate keyframe's
own observation row (<= N points): the previous MP-wide formulation would
materialize a (MP x N) distance matrix — 2 GB at KITTI capacity.
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


def _rescue_search(
    cfg: SlamConfig, state, frame, Tcw, cand_pts, cand_search, cur_mp_in,
    radius: float, orb_dist: float, extra_gate,
):
    """Project the candidate KF's (compacted) points with the current pose
    estimate and claim still-free keypoints (reference rescue pattern,
    src/Tracking.cc:1548-1581 / 1597-1608)."""
    cam = cfg.camera
    from my_orb_slam2_tpu.ops.projection import project_stereo

    pts_w = jnp.take(state.mp_pos, cand_pts, axis=0)  # (Nc, 3)
    uvr, z = project_stereo(Tcw, pts_w, cam.fx, cam.fy, cam.cx, cam.cy, cam.bf)
    in_img = (
        (uvr[:, 0] >= 0) & (uvr[:, 0] < cam.width)
        & (uvr[:, 1] >= 0) & (uvr[:, 1] < cam.height) & (z > 0)
    )
    Nc = cand_pts.shape[0]
    idx, ok, _ = matching.search_by_projection(
        uvr[:, :2],
        jnp.zeros((Nc,), jnp.int32),
        cand_search & in_img & extra_gate,
        jnp.take(state.mp_desc, cand_pts, axis=0),
        jnp.full((Nc,), radius),
        frame.uv,
        frame.octave,
        frame.valid,
        frame.desc,
        level_lo=jnp.zeros((Nc,), jnp.int32),
        level_hi=jnp.full((Nc,), cfg.orb.n_levels - 1, jnp.int32),
        max_dist=orb_dist,
        ratio=1.0,
        kp_taken=cur_mp_in >= 0,
    )
    N = frame.uv.shape[0]
    add_mp = jnp.full((N,), ms.INVALID, jnp.int32).at[
        jnp.where(ok, idx, N - 1)
    ].max(jnp.where(ok, cand_pts, ms.INVALID), mode="drop")
    return jnp.where(cur_mp_in >= 0, cur_mp_in, add_mp), jnp.sum(ok)


def _try_candidate_impl(cfg: SlamConfig, state: ms.MapState, frame: FrameData, kf_id, key):
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

    # Compacted rescue candidates: the keyframe's own observation row.
    cand_pts = jnp.where(has_mp, kf_mp, 0)  # (Nc,)
    cand_valid = has_mp & jnp.take(state.mp_valid, cand_pts) & state.kf_kp_valid[kf_id]

    # 4. projection rescue: candidate KF's points not yet matched
    # (reference :1548-1581, th=10, ORBdist=100).
    already = jnp.zeros((MP,), bool).at[jnp.where(cur_mp2 >= 0, cur_mp2, 0)].set(cur_mp2 >= 0)
    search1 = cand_valid & ~jnp.take(already, cand_pts)
    cur_mp3, _n_add = _rescue_search(
        cfg, state, frame, po["Tcw"], cand_pts, search1, cur_mp2,
        radius=10.0, orb_dist=100.0, extra_gate=jnp.ones_like(search1),
    )

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
    search2 = cand_valid & ~jnp.take(already2, cand_pts)
    cur_mp4, n_add3 = _rescue_search(
        cfg, state, frame, po2["Tcw"], cand_pts, search2, cur_mp_final,
        radius=3.0, orb_dist=64.0,
        extra_gate=jnp.broadcast_to(need2, search2.shape),
    )
    # re-optimize only counts when the combined match set clears 50
    # (reference: nGood+nadditional>=50 gates the final optimization).
    run2 = need2 & (n_final + n_add3 >= 50)
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


@functools.partial(jax.jit, static_argnames=("cfg",))
def _try_candidate(cfg: SlamConfig, state: ms.MapState, frame: FrameData, kf_id, key):
    return _try_candidate_impl(cfg, state, frame, kf_id, key)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _try_all_candidates(
    cfg: SlamConfig, state: ms.MapState, frame: FrameData, kf_ids, key
):
    """Evaluate every candidate in one dispatch; the accepted candidate with
    the most final inliers wins. Sequential on the device stream (lax.map —
    each chain materializes (N x N) search matrices; running all at once
    would multiply that workspace by the candidate count) but only ONE
    host round-trip."""
    C = kf_ids.shape[0]
    keys = jax.random.split(key, C)
    ok_c = kf_ids >= 0

    def one(args):
        kid, okc, k = args
        acc, Tcw, cur, n = _try_candidate_impl(
            cfg, state, frame, jnp.maximum(kid, 0), k
        )
        return acc & okc, Tcw, cur, n

    accs, Tcws, curs, ns = jax.lax.map(one, (kf_ids, ok_c, keys))
    score = jnp.where(accs, ns, -1)
    best = jnp.argmax(score)
    return (
        accs[best],
        Tcws[best],
        curs[best],
        ns[best],
        jnp.maximum(kf_ids[best], 0),
    )


class Relocalizer:
    """Host driver: query candidates, evaluate all in one dispatch."""

    def __init__(self, cfg: SlamConfig, vocab):
        self.cfg = cfg
        self.vocab = vocab
        self._key = jax.random.PRNGKey(7)

    def relocalize(self, state: ms.MapState, db: kdb.KfDatabase, frame: FrameData):
        words = self.vocab.words(frame.desc)
        ids, scores = kdb.detect_reloc_candidates(db, state, words, frame.valid)
        if not bool(np.asarray(ids >= 0).any()):
            return False, None, None, 0, -1
        self._key, sub = jax.random.split(self._key)
        ok, Tcw, cur_mp, n, kf = _try_all_candidates(
            self.cfg, state, frame, ids, sub
        )
        if bool(ok):
            return True, np.asarray(Tcw), cur_mp, int(n), int(kf)
        return False, None, None, 0, -1
