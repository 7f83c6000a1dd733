"""The map data model: struct-of-arrays, fixed capacity, masked.

Replaces the reference's pointer-graph L3 layer (src/Map.cc, src/MapPoint.cc,
src/KeyFrame.cc) with one immutable pytree of arrays updated by jitted pure
functions:

- MapPoints: positions, packed descriptors, viewing normals, scale-invariance
  distance ring, tracking counters, validity mask (tombstones = mask clear,
  replacing MapPoint::SetBadFlag lazy deletion).
- KeyFrames: poses + the full per-keyframe feature block (the Frame snapshot
  that reference KeyFrame::KeyFrame copies, src/KeyFrame.cc:31-57).
- Observations, both directions:
  * forward:  `kf_mp[k, i]` = map-point id seen by keypoint slot i of
    keyframe k (-1 if none) — the reference's per-KF mvpMapPoints.
  * inverted: `mp_obs_kf[p, j]` / `mp_obs_slot[p, j]` = the j-th observer
    (keyframe id, keypoint slot) of point p (-1 empty) — the reference's
    MapPoint::mObservations map, kept as fixed-K slots per point.
  The inverted index is maintained INCREMENTALLY by every mutation, so the
  derived-state refreshes (covisibility rows, viewing normals/scale rings,
  observation counts, keyframe-culling redundancy) touch O(changed x K)
  entries instead of scanning the full (KF x N) observation table per
  keyframe — the difference between ~1 fps and real-time at KITTI capacity.
- Covisibility: dense (KF, KF) weight matrix, updated incrementally one row
  per touched keyframe.
- Spanning tree: parent id per keyframe (reference mpParent); loop edges as
  a boolean matrix.

Invariant (checked by tests/test_obs_index.py): {(k, i) : kf_mp[k, i] == p,
kf_valid[k], kf_kp_valid[k, i]} == {entries of mp_obs_kf/slot row p}, for
every valid point p. Observations that would overflow a point's K-slot row
are dropped from BOTH sides and counted in `obs_overflow`.

Capacities come from `CapacityConfig`; every function is shape-static.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from my_orb_slam2_tpu.utils.config import SlamConfig

INVALID = -1


class MapState(NamedTuple):
    # --- MapPoints (capacity MP) ---
    mp_pos: jnp.ndarray  # (MP, 3) f32 world position
    mp_desc: jnp.ndarray  # (MP, 8) u32 representative descriptor
    mp_normal: jnp.ndarray  # (MP, 3) f32 mean viewing direction
    mp_min_dist: jnp.ndarray  # (MP,) f32 scale ring lower bound
    mp_max_dist: jnp.ndarray  # (MP,) f32 scale ring upper bound
    mp_valid: jnp.ndarray  # (MP,) bool
    mp_n_obs: jnp.ndarray  # (MP,) i32 observation count (stereo counts 2)
    mp_visible: jnp.ndarray  # (MP,) i32 IncreaseVisible counter
    mp_found: jnp.ndarray  # (MP,) i32 IncreaseFound counter
    mp_first_kf: jnp.ndarray  # (MP,) i32 creating keyframe id
    mp_ref_kf: jnp.ndarray  # (MP,) i32 reference keyframe id

    # --- inverted observation index (capacity K_OBS per point) ---
    mp_obs_kf: jnp.ndarray  # (MP, K) i32 observing keyframe id (-1 empty)
    mp_obs_slot: jnp.ndarray  # (MP, K) i32 keypoint slot in that keyframe

    # --- KeyFrames (capacity KF, feature capacity N per KF) ---
    kf_Tcw: jnp.ndarray  # (KF, 4, 4) f32 world->camera
    kf_valid: jnp.ndarray  # (KF,) bool
    kf_frame_id: jnp.ndarray  # (KF,) i32 source frame id
    kf_timestamp: jnp.ndarray  # (KF,) f32
    kf_uv: jnp.ndarray  # (KF, N, 2) f32 undistorted keypoints
    kf_ur: jnp.ndarray  # (KF, N) f32 stereo right u (-1 mono)
    kf_depth: jnp.ndarray  # (KF, N) f32 keypoint depth (-1 unknown)
    kf_octave: jnp.ndarray  # (KF, N) i32
    kf_angle: jnp.ndarray  # (KF, N) f32
    kf_desc: jnp.ndarray  # (KF, N, 8) u32
    kf_kp_valid: jnp.ndarray  # (KF, N) bool
    kf_mp: jnp.ndarray  # (KF, N) i32 observed map-point id or -1
    kf_words: jnp.ndarray  # (KF, N) i32 vocabulary word per keypoint (-1 =
    # inserted without a vocabulary) — feeds the direct-index word-bucket
    # gate in triangulation/loop matching (matching.word_bucket_mask)

    # --- graph ---
    covis: jnp.ndarray  # (KF, KF) i32 shared-point counts (symmetric)
    kf_parent: jnp.ndarray  # (KF,) i32 spanning-tree parent (-1 root)
    loop_edges: jnp.ndarray  # (KF, KF) bool loop-closure edges

    # --- counters (device scalars) ---
    n_kf: jnp.ndarray  # () i32 number of keyframe slots ever used
    next_mp: jnp.ndarray  # () i32 monotonic map-point id hint
    obs_overflow: jnp.ndarray  # () i32 observations dropped (K-slot full)
    cap_overflow: jnp.ndarray  # () i32 candidates LOST at a static bound
    # (local-map search compaction, loop-correction group caps) —
    # silent-degradation telemetry, exposed by drivers/bench
    shed_work: jnp.ndarray  # () i32 bounded-per-pass work shed and retried
    # on later passes (triangulation query slots, fuse candidate/loser
    # compactions) — load-shedding telemetry, not a loss


def init_map_state(cfg: SlamConfig, n_kp: int) -> MapState:
    MP = cfg.capacity.max_map_points
    KF = cfg.capacity.max_keyframes
    K = cfg.capacity.max_obs_per_point
    N = n_kp
    f32, i32 = jnp.float32, jnp.int32
    return MapState(
        mp_pos=jnp.zeros((MP, 3), f32),
        mp_desc=jnp.zeros((MP, 8), jnp.uint32),
        mp_normal=jnp.zeros((MP, 3), f32),
        mp_min_dist=jnp.zeros((MP,), f32),
        mp_max_dist=jnp.zeros((MP,), f32),
        mp_valid=jnp.zeros((MP,), bool),
        mp_n_obs=jnp.zeros((MP,), i32),
        mp_visible=jnp.zeros((MP,), i32),
        mp_found=jnp.zeros((MP,), i32),
        mp_first_kf=jnp.full((MP,), INVALID, i32),
        mp_ref_kf=jnp.full((MP,), INVALID, i32),
        mp_obs_kf=jnp.full((MP, K), INVALID, i32),
        mp_obs_slot=jnp.full((MP, K), INVALID, i32),
        kf_Tcw=jnp.tile(jnp.eye(4, dtype=f32), (KF, 1, 1)),
        kf_valid=jnp.zeros((KF,), bool),
        kf_frame_id=jnp.full((KF,), INVALID, i32),
        kf_timestamp=jnp.zeros((KF,), f32),
        kf_uv=jnp.zeros((KF, N, 2), f32),
        kf_ur=jnp.full((KF, N), -1.0, f32),
        kf_depth=jnp.full((KF, N), -1.0, f32),
        kf_octave=jnp.zeros((KF, N), i32),
        kf_angle=jnp.zeros((KF, N), f32),
        kf_desc=jnp.zeros((KF, N, 8), jnp.uint32),
        kf_kp_valid=jnp.zeros((KF, N), bool),
        kf_mp=jnp.full((KF, N), INVALID, i32),
        kf_words=jnp.full((KF, N), INVALID, i32),
        covis=jnp.zeros((KF, KF), i32),
        kf_parent=jnp.full((KF,), INVALID, i32),
        loop_edges=jnp.zeros((KF, KF), bool),
        n_kf=jnp.zeros((), i32),
        next_mp=jnp.zeros((), i32),
        obs_overflow=jnp.zeros((), i32),
        cap_overflow=jnp.zeros((), i32),
        shed_work=jnp.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# Inverted observation index primitives
# ---------------------------------------------------------------------------


def rebuild_obs_index(state: MapState) -> MapState:
    """Recompute the inverted index from kf_mp (full (KF x N) pass).

    Used at load time, after monocular initialization's bulk wiring, and by
    tests as the ground truth. Overflowing observations (more than K
    observers for a point) are dropped from kf_mp too so the invariant
    holds.

    Also enforces AT MOST ONE observation per (point, keyframe) pair — the
    reference's mObservations is a map keyed by KeyFrame*
    (include/MapPoint.h:45-82), so a second keypoint slot of the same
    keyframe mapping to the same point is not representable there either.
    Duplicates are dropped from kf_mp (counted in obs_overflow); every
    derived-state kernel (covisibility, culling redundancy) relies on this
    uniqueness instead of paying per-row dedup at refresh time.
    """
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    K = state.mp_obs_kf.shape[1]
    ok = (state.kf_mp >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    pid = jnp.where(ok, state.kf_mp, MP).reshape(-1)  # (KF*N,)
    order = jnp.argsort(pid, stable=True)
    sp = pid[order]
    E = KF * N
    lin = jnp.arange(E, dtype=jnp.int32)
    first = jnp.full((MP + 1,), E, jnp.int32).at[sp].min(lin)
    kf_of = (order // N).astype(jnp.int32)
    slot_of = (order % N).astype(jnp.int32)
    # The stable pid sort keeps entries within a point group in linear
    # (kf-major) order, so duplicate (point, kf) pairs are adjacent.
    dup = jnp.concatenate(
        [jnp.array([False]), (sp[1:] == sp[:-1]) & (kf_of[1:] == kf_of[:-1])]
    ) & (sp < MP)
    kept = ((sp < MP) & ~dup).astype(jnp.int32)
    cum = jnp.cumsum(kept)  # inclusive
    cum_first = jnp.take(cum, jnp.clip(jnp.take(first, sp), 0, E - 1))
    kept_first = jnp.take(kept, jnp.clip(jnp.take(first, sp), 0, E - 1))
    rank = cum - 1 - (cum_first - kept_first)
    keep = (kept == 1) & (rank < K)
    tgt = jnp.where(keep, sp, MP)
    mp_obs_kf = jnp.full((MP, K), INVALID, jnp.int32).at[
        tgt, jnp.where(keep, rank, 0)
    ].set(kf_of, mode="drop")
    mp_obs_slot = jnp.full((MP, K), INVALID, jnp.int32).at[
        tgt, jnp.where(keep, rank, 0)
    ].set(slot_of, mode="drop")
    # Overflowed observations and duplicate (point, kf) pairs: drop from
    # kf_mp to keep the two sides equal (and the uniqueness invariant).
    over = ((sp < MP) & (kept == 1) & (rank >= K)) | dup
    kf_mp = state.kf_mp.reshape(-1).at[
        jnp.where(over, order, E)
    ].set(INVALID, mode="drop").reshape(KF, N)
    state = state._replace(
        mp_obs_kf=mp_obs_kf,
        mp_obs_slot=mp_obs_slot,
        kf_mp=kf_mp,
        obs_overflow=state.obs_overflow + jnp.sum(over, dtype=jnp.int32),
    )
    return recount_observations(state)


def obs_add_pairs(mp_obs_kf, mp_obs_slot, pid, kf, slot, mask):
    """Append observations (kf, slot) to the index rows of `pid`.

    REQUIRES pids to be unique within the batch (each point gains at most
    one observation per call). Returns (mp_obs_kf, mp_obs_slot, did (Q,),
    n_overflow): `did` is False where the row was full (observation dropped)
    or mask was False.
    """
    MP, K = mp_obs_kf.shape
    pc = jnp.clip(pid, 0, MP - 1)
    rows = mp_obs_kf[pc]  # (Q, K)
    free = rows < 0
    has = jnp.any(free, axis=1)
    j = jnp.argmax(free, axis=1)
    okp = mask & (pid >= 0) & (pid < MP)
    did = okp & has
    tgt = jnp.where(did, pid, MP)
    mp_obs_kf = mp_obs_kf.at[tgt, j].set(kf, mode="drop")
    mp_obs_slot = mp_obs_slot.at[tgt, j].set(slot, mode="drop")
    return mp_obs_kf, mp_obs_slot, did, jnp.sum(okp & ~has, dtype=jnp.int32)


def obs_remove_pairs(mp_obs_kf, mp_obs_slot, pid, kf, slot, mask):
    """Remove observations (kf, slot) from the index rows of `pid`.

    pids may repeat (each (pid, kf, slot) triple identifies one entry).
    """
    MP, K = mp_obs_kf.shape
    pc = jnp.clip(pid, 0, MP - 1)
    rows_kf = mp_obs_kf[pc]
    rows_slot = mp_obs_slot[pc]
    hit = (
        mask[:, None]
        & (pid >= 0)[:, None]
        & (pid < MP)[:, None]
        & (rows_kf == kf[:, None])
        & (rows_slot == slot[:, None])
    )
    tgt = jnp.where(hit, pc[:, None], MP)
    cols = jnp.broadcast_to(jnp.arange(K)[None, :], hit.shape)
    mp_obs_kf = mp_obs_kf.at[tgt, cols].set(INVALID, mode="drop")
    mp_obs_slot = mp_obs_slot.at[tgt, cols].set(INVALID, mode="drop")
    return mp_obs_kf, mp_obs_slot


def obs_add_pairs_multi(mp_obs_kf, mp_obs_slot, pid, kf, slot, mask, cnt):
    """Append observations (kf, slot) to the index rows of `pid`, where pids
    MAY repeat within the batch (a point gaining several observations in one
    pass). Insert positions are computed by sorted ranking: entries grouped
    by pid, rank within the group, position = current row count + rank.

    REQUIRES: the distinct pids' rows are compacted (first free position ==
    entry count — run obs_compact_rows first if unsure), and `cnt` gives
    each entry's pid's CURRENT entry count (caller usually has it already
    from a prior row gather). Returns (obs_kf, obs_slot, did (E,),
    n_overflow)."""
    MP, K = mp_obs_kf.shape
    E = pid.shape[0]
    okp = mask & (pid >= 0) & (pid < MP)
    pm = jnp.where(okp, pid, MP)
    order = jnp.argsort(pm, stable=True)
    sp = pm[order]
    skf = kf[order]
    ss = slot[order]
    scnt = cnt[order]
    svalid = sp < MP
    lin = jnp.arange(E, dtype=jnp.int32)
    first_pos = jnp.full((MP + 1,), E, jnp.int32).at[sp].min(lin)
    rank = lin - jnp.take(first_pos, sp)
    j = scnt + rank
    accept = svalid & (j < K)
    mp_obs_kf = mp_obs_kf.at[
        jnp.where(accept, sp, MP), jnp.clip(j, 0, K - 1)
    ].set(skf, mode="drop")
    mp_obs_slot = mp_obs_slot.at[
        jnp.where(accept, sp, MP), jnp.clip(j, 0, K - 1)
    ].set(ss, mode="drop")
    did = jnp.zeros((E,), bool).at[order].set(accept)
    return mp_obs_kf, mp_obs_slot, did, jnp.sum(svalid & ~accept, dtype=jnp.int32)


def obs_compact_rows(mp_obs_kf, mp_obs_slot, pid, mask):
    """Compact the index rows of `pid` (valid entries first, holes at the
    end) so ranked multi-append can use entry counts as insert positions.
    Duplicate pids in the batch are harmless (idempotent)."""
    MP, K = mp_obs_kf.shape
    pc = jnp.clip(pid, 0, MP - 1)
    rows_kf = mp_obs_kf[pc]
    rows_slot = mp_obs_slot[pc]
    order = jnp.argsort(rows_kf < 0, axis=1, stable=True)
    rows_kf = jnp.take_along_axis(rows_kf, order, axis=1)
    rows_slot = jnp.take_along_axis(rows_slot, order, axis=1)
    tgt = jnp.where(mask & (pid >= 0) & (pid < MP), pid, MP)
    mp_obs_kf = mp_obs_kf.at[tgt].set(rows_kf, mode="drop")
    mp_obs_slot = mp_obs_slot.at[tgt].set(rows_slot, mode="drop")
    return mp_obs_kf, mp_obs_slot


# ---------------------------------------------------------------------------
# Derived quantities (all index-based: O(touched x K))
# ---------------------------------------------------------------------------


def covis_row(state: MapState, mp_assign: jnp.ndarray) -> jnp.ndarray:
    """Covisibility weights of a (new) observation set vs all keyframes.

    mp_assign: (N,) map-point ids (-1 for none). Returns (KF,) counts of
    shared valid map points — the weights of KeyFrame::UpdateConnections
    (reference src/KeyFrame.cc:313-341). Computed from the inverted index:
    O(N x K) instead of a full (KF x N) table scan.

    Duplicate pids in mp_assign are counted once (first slot wins), matching
    the one-observation-per-(point, keyframe) invariant.
    """
    MP = state.mp_pos.shape[0]
    KF = state.kf_Tcw.shape[0]
    N = mp_assign.shape[0]
    ok = (mp_assign >= 0) & (mp_assign < MP)
    pid = jnp.where(ok, mp_assign, MP)
    first = jnp.full((MP + 1,), N, jnp.int32).at[pid].min(
        jnp.arange(N, dtype=jnp.int32)
    )
    is_first = ok & (jnp.take(first, pid) == jnp.arange(N))
    pc = jnp.clip(mp_assign, 0, MP - 1)
    rows = state.mp_obs_kf[pc]  # (N, K)
    e_ok = is_first[:, None] & (rows >= 0) & jnp.take(state.mp_valid, pc)[:, None]
    cnt = jnp.zeros((KF + 1,), jnp.int32).at[
        jnp.where(e_ok, rows, KF).reshape(-1)
    ].add(1)[:KF]
    return cnt * state.kf_valid


def refresh_covisibility(state: MapState, kf_ids: jnp.ndarray) -> MapState:
    """Recompute covisibility rows for the given keyframes (padded with -1).

    Used after fuse/culling where observation sets changed (reference
    UpdateConnections re-runs per affected KF). Index-based: each requested
    row costs N x K gathers + a scatter-add, so a typical 21-row refresh is
    ~0.7M entries instead of 21 full (KF x N) table scans.
    """
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    B = kf_ids.shape[0]
    ids_c = jnp.clip(kf_ids, 0, KF - 1)
    ok_id = (kf_ids >= 0) & (kf_ids < KF)
    rows_mp = jnp.take(state.kf_mp, ids_c, axis=0)  # (B, N)
    rows_ok = (
        ok_id[:, None]
        & (rows_mp >= 0)
        & jnp.take(state.kf_kp_valid, ids_c, axis=0)
    )
    # Uniqueness invariant (enforced by rebuild_obs_index and preserved by
    # every mutation path, see module docstring): each (point, keyframe)
    # pair appears at most once on either side of the index, so neither the
    # keyframe rows nor the observer lists need set-dedup here. The
    # previous per-row sort + (B, N, K, K) observer-pair dedup was the
    # single most expensive fusion of the whole mapper at capacity
    # (~29 ms/call with a 52-row refresh, ~2.4x the rest of the local-BA
    # writeback combined).
    pc = jnp.clip(jnp.where(rows_ok, rows_mp, MP), 0, MP - 1)
    obs_kfs = state.mp_obs_kf[pc]  # (B, N, K)
    e_ok = rows_ok[..., None] & (obs_kfs >= 0)
    b_idx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None, None], obs_kfs.shape
    )
    cnt = jnp.zeros((B, KF + 1), jnp.int32).at[
        b_idx.reshape(-1), jnp.where(e_ok, obs_kfs, KF).reshape(-1)
    ].add(1)
    rows = cnt[:, :KF] * state.kf_valid[None, :]
    rows = rows.at[jnp.arange(B), ids_c].set(0)  # zero self-edges
    rows = jnp.where(ok_id[:, None], rows, 0)
    tgt = jnp.where(ok_id, ids_c, KF)
    covis = state.covis.at[tgt, :].set(rows, mode="drop")
    covis = covis.at[:, tgt].set(rows.T, mode="drop")
    return state._replace(covis=covis)


def covis_sub_removed_obs(
    state: MapState, pid: jnp.ndarray, kf: jnp.ndarray, mask: jnp.ndarray
) -> MapState:
    """Apply exact covisibility decrements for REMOVED observations.

    For each removed observation (point `pid[e]`, observer `kf[e]`): every
    keyframe kf2 still observing the point shares one point fewer with
    `kf[e]`, so covis[kf, kf2] and covis[kf2, kf] drop by 1. Call AFTER the
    observation rows were updated (the removed entry must be gone from the
    point's row). O(E x K) scatter-subs — replaces full row recounts after
    local-BA outlier erasure, where only these few entries changed (the
    reference's analog: UpdateConnections is only re-run on the current
    keyframe, src/LocalMapping.cc:604-608; other rows drift until their own
    next update).

    Known approximation: if two observers of the SAME point are removed in
    one batch, the pair's mutual edge keeps one stale count until either
    row's next full refresh — same lazy semantics as erase_map_points.
    """
    MP = state.mp_pos.shape[0]
    KF = state.kf_Tcw.shape[0]
    E = pid.shape[0]
    ok = mask & (pid >= 0) & (pid < MP) & (kf >= 0) & (kf < KF)
    pc = jnp.clip(pid, 0, MP - 1)
    rows_kf = state.mp_obs_kf[pc]  # (E, K)
    e_ok = ok[:, None] & (rows_kf >= 0) & (rows_kf != kf[:, None])
    kfc = jnp.clip(kf, 0, KF - 1)
    a = jnp.where(e_ok, kfc[:, None], KF)
    b = jnp.where(e_ok, jnp.clip(rows_kf, 0, KF - 1), 0)
    covis = state.covis.at[a, b].add(-1, mode="drop")
    covis = covis.at[
        jnp.where(e_ok, jnp.clip(rows_kf, 0, KF - 1), KF),
        jnp.where(e_ok, kfc[:, None], 0),
    ].add(-1, mode="drop")
    covis = jnp.maximum(covis, 0)
    return state._replace(covis=covis)


def mp_observations_mask(state: MapState, mp_ids: jnp.ndarray) -> jnp.ndarray:
    """Boolean (KF, N) mask of keypoint slots observing any of mp_ids."""
    MP = state.mp_pos.shape[0]
    sel = jnp.zeros((MP + 1,), bool).at[jnp.where(mp_ids >= 0, mp_ids, MP)].set(True)
    sel = sel.at[MP].set(False)
    kf_mp = jnp.where(state.kf_mp >= 0, state.kf_mp, MP)
    return jnp.take(sel, kf_mp)


def best_covisible(state: MapState, kf_id: jnp.ndarray, k: int):
    """Top-k covisible keyframes of kf_id by weight (reference
    GetBestCovisibilityKeyFrames, src/KeyFrame.cc:178-186).

    Returns (ids (k,), weights (k,)); ids are -1 where weight == 0.
    """
    row = state.covis[kf_id]
    row = row * state.kf_valid
    row = row.at[kf_id].set(0)
    KF = row.shape[0]
    kk = min(k, KF)  # tiny-capacity maps: fewer slots than requested k
    w, ids = jax.lax.top_k(row, kk)
    if kk < k:
        w = jnp.concatenate([w, jnp.zeros((k - kk,), w.dtype)])
        ids = jnp.concatenate([ids, jnp.zeros((k - kk,), ids.dtype)])
    return jnp.where(w > 0, ids, INVALID), w


def scale_sigma2_table(scale_factor: float, n_levels: int):
    """Per-octave sigma^2 and inverse (reference ORBextractor
    mvLevelSigma2/mvInvLevelSigma2)."""
    s = jnp.asarray([scale_factor ** (2 * l) for l in range(n_levels)], jnp.float32)
    return s, 1.0 / s


def recount_observations(state: MapState) -> MapState:
    """Recompute mp_n_obs from the inverted index (O(MP x K)); used after
    bulk rewires (fuse replacement, loop correction) where incremental
    deltas are impractical."""
    KF, N = state.kf_mp.shape
    e_ok = state.mp_obs_kf >= 0
    kfc = jnp.clip(state.mp_obs_kf, 0, KF - 1)
    slc = jnp.clip(state.mp_obs_slot, 0, N - 1)
    ur = state.kf_ur[kfc, slc]  # (MP, K)
    inc = jnp.where(ur >= 0, 2, 1)
    n_obs = jnp.sum(jnp.where(e_ok, inc, 0), axis=1, dtype=jnp.int32)
    return state._replace(mp_n_obs=n_obs)


def observer_votes(state: MapState, mp_assign: jnp.ndarray, ok_mask) -> jnp.ndarray:
    """Per-keyframe count of how many of the given points it observes
    (reference UpdateLocalKeyFrames' K1 voting, src/Tracking.cc:1331-1360).
    O(N x K) via the inverted index."""
    MP = state.mp_pos.shape[0]
    KF = state.kf_Tcw.shape[0]
    N = mp_assign.shape[0]
    pc = jnp.clip(mp_assign, 0, MP - 1)
    ok = ok_mask & (mp_assign >= 0) & (mp_assign < MP)
    # count each point once even if assigned to two keypoint slots
    pid_s = jnp.where(ok, mp_assign, MP)
    first = jnp.full((MP + 1,), N, jnp.int32).at[pid_s].min(
        jnp.arange(N, dtype=jnp.int32)
    )
    ok = ok & (jnp.take(first, pid_s) == jnp.arange(N))
    rows = state.mp_obs_kf[pc]  # (N, K)
    e_ok = ok[:, None] & (rows >= 0)
    votes = jnp.zeros((KF + 1,), jnp.int32).at[
        jnp.where(e_ok, rows, KF).reshape(-1)
    ].add(1)[:KF]
    return votes * state.kf_valid


def update_point_geometry_ids(
    state: MapState, mp_ids: jnp.ndarray, mp_ok: jnp.ndarray,
    scale_factor: float, n_levels: int,
) -> MapState:
    """Recompute viewing normal + scale-invariance ring for the given
    (compacted) point ids from their current observations (reference
    MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:346-392). O(T x K).

    Also refreshes mp_ref_kf: if the stored reference keyframe no longer
    observes the point (culled / outlier-dropped), the first remaining
    observer takes over (reference EraseObservation reassigns mpRefKF).
    """
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    T = mp_ids.shape[0]
    pc = jnp.clip(mp_ids, 0, MP - 1)
    ok = mp_ok & (mp_ids >= 0) & (mp_ids < MP)
    rows_kf = state.mp_obs_kf[pc]  # (T, K)
    rows_slot = state.mp_obs_slot[pc]
    e_ok = ok[:, None] & (rows_kf >= 0)
    kfc = jnp.clip(rows_kf, 0, KF - 1)

    # Camera centers of all keyframes (KF x 3, computed once).
    R = state.kf_Tcw[:, :3, :3]
    t = state.kf_Tcw[:, :3, 3]
    Ow = -jnp.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)  # (KF, 3)

    pos = state.mp_pos[pc]  # (T, 3)
    d = pos[:, None, :] - Ow[kfc]  # (T, K, 3)
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    cnt = jnp.sum(e_ok, axis=1)
    normal = jnp.sum(jnp.where(e_ok[..., None], dn, 0.0), axis=1) / jnp.maximum(
        cnt[:, None].astype(jnp.float32), 1.0
    )
    normal = normal / jnp.maximum(jnp.linalg.norm(normal, axis=-1, keepdims=True), 1e-9)

    # Reference keyframe: keep if still an observer, else first observer.
    ref_cur = state.mp_ref_kf[pc]
    is_ref = e_ok & (rows_kf == ref_cur[:, None])
    still = jnp.any(is_ref, axis=1)
    first_e = jnp.argmax(e_ok, axis=1)
    any_obs = jnp.any(e_ok, axis=1)
    fallback = rows_kf[jnp.arange(T), first_e]
    new_ref = jnp.where(still, ref_cur, jnp.where(any_obs, fallback, ref_cur))
    # Octave of the reference observation.
    ref_entry = jnp.argmax(is_ref | (~still[:, None] & e_ok), axis=1)
    ref_slot = rows_slot[jnp.arange(T), ref_entry]
    octv = state.kf_octave[
        jnp.clip(new_ref, 0, KF - 1), jnp.clip(ref_slot, 0, N - 1)
    ]
    dist = jnp.linalg.norm(pos - Ow[jnp.clip(new_ref, 0, KF - 1)], axis=-1)
    level_sf = scale_factor ** octv.astype(jnp.float32)
    max_dist = dist * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))

    upd = ok & any_obs
    tgt = jnp.where(upd, mp_ids, MP)
    return state._replace(
        mp_normal=state.mp_normal.at[tgt].set(normal, mode="drop"),
        mp_max_dist=state.mp_max_dist.at[tgt].set(max_dist, mode="drop"),
        mp_min_dist=state.mp_min_dist.at[tgt].set(min_dist, mode="drop"),
        mp_ref_kf=state.mp_ref_kf.at[tgt].set(new_ref, mode="drop"),
    )


def update_point_geometry(state: MapState, mp_mask: jnp.ndarray,
                          scale_factor: float, n_levels: int,
                          max_touched: int = 0) -> MapState:
    """Mask-based wrapper around `update_point_geometry_ids`.

    max_touched == 0 processes ALL points (full refresh after map-wide pose
    corrections); otherwise the mask is compacted to that static bound.
    """
    MP = state.mp_pos.shape[0]
    if max_touched and max_touched < MP:
        ids = jnp.nonzero(mp_mask, size=max_touched, fill_value=MP)[0]
        return update_point_geometry_ids(
            state, ids, ids < MP, scale_factor, n_levels
        )
    ids = jnp.arange(MP, dtype=jnp.int32)
    return update_point_geometry_ids(state, ids, mp_mask, scale_factor, n_levels)


# ---------------------------------------------------------------------------
# Map updates (pure; donate state under jit)
# ---------------------------------------------------------------------------


def allocate_map_points(mp_valid: jnp.ndarray, want_mask: jnp.ndarray):
    """Assign free map-point slots to requested entries.

    want_mask: (Q,) which of Q requests need a slot. Returns (slot_ids (Q,),
    ok (Q,)): slot ids are valid only where ok (capacity permitting).
    """
    Q = want_mask.shape[0]
    MP = mp_valid.shape[0]
    free = ~mp_valid  # (MP,)
    # rank of each free slot among free slots
    free_rank = jnp.cumsum(free.astype(jnp.int32)) - 1  # (MP,)
    # the q-th request (among wanted) takes the q-th free slot
    want_rank = jnp.cumsum(want_mask.astype(jnp.int32)) - 1  # (Q,)
    n_free = jnp.sum(free.astype(jnp.int32))
    ok = want_mask & (want_rank < n_free)
    # invert free_rank -> slot id: scatter slot ids by rank
    slot_by_rank = jnp.full((MP,), INVALID, jnp.int32).at[
        jnp.where(free, free_rank, MP - 1)
    ].set(jnp.arange(MP, dtype=jnp.int32), mode="drop")
    # Note: "drop" on purpose — occupied slots scatter out of range only when
    # free is all-False.
    slot_by_rank = jnp.where(
        jnp.arange(MP) < n_free, slot_by_rank, INVALID
    )
    slots = jnp.where(ok, jnp.take(slot_by_rank, jnp.clip(want_rank, 0, MP - 1)), INVALID)
    return slots, ok


def insert_keyframe(
    state: MapState,
    Tcw: jnp.ndarray,
    frame_id: jnp.ndarray,
    timestamp: jnp.ndarray,
    kp_uv: jnp.ndarray,
    kp_ur: jnp.ndarray,
    kp_depth: jnp.ndarray,
    kp_octave: jnp.ndarray,
    kp_angle: jnp.ndarray,
    kp_desc: jnp.ndarray,
    kp_valid: jnp.ndarray,
    mp_assign: jnp.ndarray,
    min_covis_weight: int = 15,
    obs_budget: int = 0,
    kp_words=None,
) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe at the next slot; update observations (both index
    directions), covisibility and spanning tree.

    mp_assign: (N,) map-point id observed by each keypoint (-1 none).
    Duplicate point ids keep only their first slot (one observation per
    (point, keyframe)). obs_budget > 0 drops assignments to MATURE points
    (n_obs >= budget — see CapacityConfig.obs_budget). Returns
    (new_state, kf_id).
    """
    kf_id = state.n_kf
    MP = state.mp_pos.shape[0]
    N = mp_assign.shape[0]
    # Deduplicate assignments: first slot per point id wins.
    ok_a = kp_valid & (mp_assign >= 0) & (mp_assign < MP)
    ok_a = ok_a & jnp.take(state.mp_valid, jnp.clip(mp_assign, 0, MP - 1))
    if obs_budget:
        mature = (
            jnp.take(state.mp_n_obs, jnp.clip(mp_assign, 0, MP - 1))
            >= obs_budget
        )
        # Budget-declined assignments are load-shedding policy (the point
        # is already saturated with observers), counted — not silent.
        state = state._replace(
            shed_work=state.shed_work
            + jnp.sum(ok_a & mature, dtype=jnp.int32)
        )
        ok_a = ok_a & ~mature
    pid_s = jnp.where(ok_a, mp_assign, MP)
    first = jnp.full((MP + 1,), N, jnp.int32).at[pid_s].min(
        jnp.arange(N, dtype=jnp.int32)
    )
    ok_a = ok_a & (jnp.take(first, pid_s) == jnp.arange(N))
    assign = jnp.where(ok_a, mp_assign, INVALID)

    # Covisibility row from the index BEFORE appending our own observations
    # (so no self-count; reference zeroes the self edge implicitly).
    row = covis_row(state, assign)

    # Append to the inverted index.
    mp_obs_kf, mp_obs_slot, did, n_over = obs_add_pairs(
        state.mp_obs_kf, state.mp_obs_slot,
        assign, jnp.full((N,), 0, jnp.int32) + kf_id,
        jnp.arange(N, dtype=jnp.int32), ok_a,
    )
    assign = jnp.where(did, assign, INVALID)

    # Feature block + forward index.
    state = state._replace(
        kf_Tcw=state.kf_Tcw.at[kf_id].set(Tcw),
        kf_valid=state.kf_valid.at[kf_id].set(True),
        kf_frame_id=state.kf_frame_id.at[kf_id].set(frame_id),
        kf_timestamp=state.kf_timestamp.at[kf_id].set(timestamp),
        kf_uv=state.kf_uv.at[kf_id].set(kp_uv),
        kf_ur=state.kf_ur.at[kf_id].set(kp_ur),
        kf_depth=state.kf_depth.at[kf_id].set(kp_depth),
        kf_octave=state.kf_octave.at[kf_id].set(kp_octave),
        kf_angle=state.kf_angle.at[kf_id].set(kp_angle),
        kf_desc=state.kf_desc.at[kf_id].set(kp_desc),
        kf_kp_valid=state.kf_kp_valid.at[kf_id].set(kp_valid),
        kf_mp=state.kf_mp.at[kf_id].set(assign),
        kf_words=(
            state.kf_words if kp_words is None
            else state.kf_words.at[kf_id].set(kp_words)
        ),
        mp_obs_kf=mp_obs_kf,
        mp_obs_slot=mp_obs_slot,
        n_kf=state.n_kf + 1,
        obs_overflow=state.obs_overflow + n_over,
    )
    # Observation counts: +2 for stereo keypoints, +1 mono (reference
    # MapPoint::AddObservation, src/MapPoint.cc: nObs += 2 when mvuRight>=0).
    obs_inc = jnp.where(kp_ur >= 0, 2, 1).astype(jnp.int32)
    tgt = jnp.where(did, assign, MP)
    n_obs = jnp.zeros((MP + 1,), jnp.int32).at[tgt].add(obs_inc)[:MP]
    state = state._replace(mp_n_obs=state.mp_n_obs + n_obs)
    # Covisibility row (reference keeps edges with weight>=15 or the single
    # best; we store raw counts and let queries threshold).
    state = state._replace(
        covis=state.covis.at[kf_id, :].set(row).at[:, kf_id].set(row)
    )
    # Spanning tree: parent = best covisible existing KF (reference
    # src/KeyFrame.cc:385-390: first UpdateConnections attaches to max-weight).
    best_w = jnp.max(row)
    parent = jnp.where((kf_id > 0) & (best_w > 0), jnp.argmax(row), INVALID).astype(jnp.int32)
    state = state._replace(kf_parent=state.kf_parent.at[kf_id].set(parent))
    return state, kf_id


def add_map_points(
    state: MapState,
    pos: jnp.ndarray,
    desc: jnp.ndarray,
    normal: jnp.ndarray,
    min_dist: jnp.ndarray,
    max_dist: jnp.ndarray,
    ref_kf: jnp.ndarray,
    want: jnp.ndarray,
) -> tuple[MapState, jnp.ndarray, jnp.ndarray]:
    """Allocate and write a batch of new map points.

    pos: (Q,3); want: (Q,) mask. Returns (state, slot_ids (Q,), ok (Q,)).
    The caller wires them into kf_mp slots AND the inverted index (fresh
    points start with empty index rows).
    """
    slots, ok = allocate_map_points(state.mp_valid, want)
    MP = state.mp_pos.shape[0]
    K = state.mp_obs_kf.shape[1]
    Q = want.shape[0]
    tgt = jnp.where(ok, slots, MP)
    state = state._replace(
        mp_pos=state.mp_pos.at[tgt].set(pos, mode="drop"),
        mp_desc=state.mp_desc.at[tgt].set(desc, mode="drop"),
        mp_normal=state.mp_normal.at[tgt].set(normal, mode="drop"),
        mp_min_dist=state.mp_min_dist.at[tgt].set(min_dist, mode="drop"),
        mp_max_dist=state.mp_max_dist.at[tgt].set(max_dist, mode="drop"),
        mp_valid=state.mp_valid.at[tgt].set(True, mode="drop"),
        mp_n_obs=state.mp_n_obs.at[tgt].set(0, mode="drop"),
        mp_visible=state.mp_visible.at[tgt].set(1, mode="drop"),
        mp_found=state.mp_found.at[tgt].set(1, mode="drop"),
        mp_first_kf=state.mp_first_kf.at[tgt].set(ref_kf, mode="drop"),
        mp_ref_kf=state.mp_ref_kf.at[tgt].set(ref_kf, mode="drop"),
        mp_obs_kf=state.mp_obs_kf.at[tgt].set(
            jnp.full((Q, K), INVALID, jnp.int32), mode="drop"
        ),
        mp_obs_slot=state.mp_obs_slot.at[tgt].set(
            jnp.full((Q, K), INVALID, jnp.int32), mode="drop"
        ),
        next_mp=state.next_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    return state, slots, ok


def erase_map_points(
    state: MapState, kill_mask: jnp.ndarray, max_kill: int = 8192
) -> MapState:
    """Tombstone map points and detach their observations (reference
    MapPoint::SetBadFlag, src/MapPoint.cc: removes itself from all KFs).

    Index-based: the killed points' observer lists pinpoint exactly which
    kf_mp slots to clear — O(killed x K) instead of a (KF x N) table scan.
    The kill set is compacted to `max_kill` per call; overflowing kills are
    deferred (the mask condition re-fires next keyframe). The whole body
    (including the MP-wide nonzero compaction) runs under lax.cond — many
    passes kill nothing.
    """
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    K = state.mp_obs_kf.shape[1]

    def do_erase(state):
        ids = jnp.nonzero(kill_mask, size=min(max_kill, MP), fill_value=MP)[0]
        ok = ids < MP
        pc = jnp.clip(ids, 0, MP - 1)
        rows_kf = state.mp_obs_kf[pc]  # (Kl, K)
        rows_slot = state.mp_obs_slot[pc]
        e_ok = ok[:, None] & (rows_kf >= 0)
        kf_mp = state.kf_mp.at[
            jnp.where(e_ok, rows_kf, KF), jnp.where(e_ok, rows_slot, 0)
        ].set(INVALID, mode="drop")
        tgt = jnp.where(ok, ids, MP)
        empty = jnp.full((ids.shape[0], K), INVALID, jnp.int32)
        return state._replace(
            mp_valid=state.mp_valid.at[tgt].set(False, mode="drop"),
            mp_n_obs=state.mp_n_obs.at[tgt].set(0, mode="drop"),
            mp_obs_kf=state.mp_obs_kf.at[tgt].set(empty, mode="drop"),
            mp_obs_slot=state.mp_obs_slot.at[tgt].set(empty, mode="drop"),
            kf_mp=kf_mp,
        )

    return jax.lax.cond(jnp.any(kill_mask), do_erase, lambda s: s, state)


def erase_keyframe_observations(
    state: MapState, kf_ids: jnp.ndarray, ok: jnp.ndarray
) -> MapState:
    """Remove all observations held by the given keyframes from the inverted
    index and decrement mp_n_obs (used by keyframe culling). Does NOT touch
    kf_valid/kf_mp — the caller clears those."""
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    C = kf_ids.shape[0]
    ids_c = jnp.clip(kf_ids, 0, KF - 1)
    rows = jnp.take(state.kf_mp, ids_c, axis=0)  # (C, N)
    rok = ok[:, None] & (rows >= 0) & jnp.take(state.kf_kp_valid, ids_c, axis=0)
    pid = jnp.where(rok, rows, MP).reshape(-1)
    kf_rep = jnp.broadcast_to(ids_c[:, None], (C, N)).reshape(-1)
    slot_rep = jnp.broadcast_to(
        jnp.arange(N, dtype=jnp.int32)[None, :], (C, N)
    ).reshape(-1)
    mp_obs_kf, mp_obs_slot = obs_remove_pairs(
        state.mp_obs_kf, state.mp_obs_slot, pid, kf_rep, slot_rep, rok.reshape(-1)
    )
    dec = jnp.where(jnp.take(state.kf_ur, ids_c, axis=0) >= 0, 2, 1).reshape(-1)
    mp_n_obs = state.mp_n_obs.at[pid].add(
        jnp.where(rok.reshape(-1), -dec, 0), mode="drop"
    )
    return state._replace(
        mp_obs_kf=mp_obs_kf,
        mp_obs_slot=mp_obs_slot,
        mp_n_obs=jnp.maximum(mp_n_obs, 0),
    )
