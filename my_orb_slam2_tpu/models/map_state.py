"""The map data model: struct-of-arrays, fixed capacity, masked.

Replaces the reference's pointer-graph L3 layer (src/Map.cc, src/MapPoint.cc,
src/KeyFrame.cc) with one immutable pytree of arrays updated by jitted pure
functions:

- MapPoints: positions, packed descriptors, viewing normals, scale-invariance
  distance ring, tracking counters, validity mask (tombstones = mask clear,
  replacing MapPoint::SetBadFlag lazy deletion).
- KeyFrames: poses + the full per-keyframe feature block (the Frame snapshot
  that reference KeyFrame::KeyFrame copies, src/KeyFrame.cc:31-57).
- Observations: `kf_mp[k, i]` = map-point id seen by keypoint slot i of
  keyframe k (-1 if none). This one array *is* the observation graph: the
  covisibility weights (shared-point counts, reference
  KeyFrame::UpdateConnections src/KeyFrame.cc:301-393) and the per-point
  observation lists are both derived from it by segment reductions.
- Covisibility: dense (KF, KF) weight matrix, updated incrementally one row
  per inserted keyframe.
- Spanning tree: parent id per keyframe (reference mpParent); loop edges as
  a boolean matrix.

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

    # --- graph ---
    covis: jnp.ndarray  # (KF, KF) i32 shared-point counts (symmetric)
    kf_parent: jnp.ndarray  # (KF,) i32 spanning-tree parent (-1 root)
    loop_edges: jnp.ndarray  # (KF, KF) bool loop-closure edges

    # --- counters (device scalars) ---
    n_kf: jnp.ndarray  # () i32 number of keyframe slots ever used
    next_mp: jnp.ndarray  # () i32 monotonic map-point id hint


def init_map_state(cfg: SlamConfig, n_kp: int) -> MapState:
    MP = cfg.capacity.max_map_points
    KF = cfg.capacity.max_keyframes
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
        covis=jnp.zeros((KF, KF), i32),
        kf_parent=jnp.full((KF,), INVALID, i32),
        loop_edges=jnp.zeros((KF, KF), bool),
        n_kf=jnp.zeros((), i32),
        next_mp=jnp.zeros((), i32),
    )


# ---------------------------------------------------------------------------
# Derived quantities
# ---------------------------------------------------------------------------


def covis_row(state: MapState, mp_assign: jnp.ndarray) -> jnp.ndarray:
    """Covisibility weights of a (new) observation set vs all keyframes.

    mp_assign: (N,) map-point ids (-1 for none). Returns (KF,) counts of
    shared valid map points — the weights of KeyFrame::UpdateConnections
    (reference src/KeyFrame.cc:313-341).
    """
    MP = state.mp_pos.shape[0]
    seen = jnp.zeros((MP + 1,), jnp.int32).at[jnp.where(mp_assign >= 0, mp_assign, MP)].set(1)
    seen = seen.at[MP].set(0)
    # For every KF slot: count its keypoints whose map point is in `seen`.
    kf_mp = jnp.where(state.kf_mp >= 0, state.kf_mp, MP)
    hits = jnp.take(seen, kf_mp)  # (KF, N)
    return jnp.sum(hits, axis=1, dtype=jnp.int32) * state.kf_valid


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
) -> tuple[MapState, jnp.ndarray]:
    """Insert a keyframe at the next slot; update observations, covisibility
    and spanning tree.

    mp_assign: (N,) map-point id observed by each keypoint (-1 none).
    Returns (new_state, kf_id).
    """
    kf_id = state.n_kf
    # Feature block
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
        kf_mp=state.kf_mp.at[kf_id].set(jnp.where(kp_valid, mp_assign, INVALID)),
        n_kf=state.n_kf + 1,
    )
    # Observation counts: +2 for stereo keypoints, +1 mono (reference
    # MapPoint::AddObservation, src/MapPoint.cc: nObs += 2 when mvuRight>=0).
    MP = state.mp_pos.shape[0]
    obs_inc = jnp.where(kp_ur >= 0, 2, 1).astype(jnp.int32)
    tgt = jnp.where((mp_assign >= 0) & kp_valid, mp_assign, MP)
    n_obs = jnp.zeros((MP + 1,), jnp.int32).at[tgt].add(obs_inc)[:MP]
    state = state._replace(mp_n_obs=state.mp_n_obs + n_obs)
    # Covisibility row (reference keeps edges with weight>=15 or the single
    # best; we store raw counts and let queries threshold).
    row = covis_row(state, jnp.where(kp_valid, mp_assign, INVALID))
    row = row.at[kf_id].set(0)
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
    The caller wires them into kf_mp slots.
    """
    slots, ok = allocate_map_points(state.mp_valid, want)
    MP = state.mp_pos.shape[0]
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
        next_mp=state.next_mp + jnp.sum(ok.astype(jnp.int32)),
    )
    return state, slots, ok


def erase_map_points(state: MapState, kill_mask: jnp.ndarray) -> MapState:
    """Tombstone map points and detach their observations (reference
    MapPoint::SetBadFlag, src/MapPoint.cc: removes itself from all KFs)."""
    MP = state.mp_pos.shape[0]
    killed = jnp.zeros((MP + 1,), bool).at[:MP].set(kill_mask)
    kf_mp = state.kf_mp
    obs_killed = jnp.take(killed, jnp.where(kf_mp >= 0, kf_mp, MP))
    return state._replace(
        mp_valid=state.mp_valid & ~kill_mask,
        kf_mp=jnp.where(obs_killed, INVALID, kf_mp),
    )


def recount_observations(state: MapState) -> MapState:
    """Recompute mp_n_obs from kf_mp (after culling or fuse rewires)."""
    MP = state.mp_pos.shape[0]
    inc = jnp.where(state.kf_ur >= 0, 2, 1).astype(jnp.int32)
    ok = (state.kf_mp >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    tgt = jnp.where(ok, state.kf_mp, MP)
    n_obs = jnp.zeros((MP + 1,), jnp.int32).at[tgt.reshape(-1)].add(
        jnp.where(ok, inc, 0).reshape(-1)
    )[:MP]
    return state._replace(mp_n_obs=n_obs)


def refresh_covisibility(state: MapState, kf_ids: jnp.ndarray) -> MapState:
    """Recompute covisibility rows for the given keyframes (padded with -1).

    Used after fuse/culling where observation sets changed (reference
    UpdateConnections re-runs per affected KF).

    One (KF, N) gather total: each point gets a BITMASK of which of the
    requested keyframes observe it, so all rows accumulate from a single
    pass over the observation table — per-row gathers would cost
    len(kf_ids) x (KF x N) at dataset capacity.
    """
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    covis = state.covis
    K_total = kf_ids.shape[0]
    obs_ok = (state.kf_mp >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    gather_idx = jnp.where(obs_ok, state.kf_mp, MP)  # (KF, N)

    for c0 in range(0, K_total, 32):
        ids = kf_ids[c0 : c0 + 32]
        K = ids.shape[0]
        ids_c = jnp.maximum(ids, 0)
        ok_id = (ids >= 0) & (ids < KF)
        # point -> bitmask of which requested KFs observe it
        rows_mp = jnp.take(state.kf_mp, ids_c, axis=0)  # (K, N)
        rows_ok = (
            ok_id[:, None]
            & (rows_mp >= 0)
            & jnp.take(state.kf_kp_valid, ids_c, axis=0)
        )
        # Set-semantics per (point, row) — a scatter-ADD of bit values would
        # corrupt the mask if a row observes the same point twice (possible
        # transiently after Replace rewiring).
        tbl = (
            jnp.zeros((MP + 1, K), bool)
            .at[
                jnp.where(rows_ok, rows_mp, MP).reshape(-1),
                jnp.broadcast_to(jnp.arange(K)[:, None], rows_mp.shape).reshape(-1),
            ]
            .set(True)
        )
        tbl = tbl.at[MP].set(False)  # sentinel row collects all padding writes
        mask_tbl = jnp.sum(
            tbl.astype(jnp.uint32) << jnp.arange(K, dtype=jnp.uint32)[None, :],
            axis=1,
            dtype=jnp.uint32,
        )
        hits = jnp.take(mask_tbl, gather_idx)  # (KF, N) u32 — the one gather
        # per-bit row sums -> the K covisibility rows at once
        rows = jnp.stack(
            [
                jnp.sum((hits >> jnp.uint32(j)) & 1, axis=1, dtype=jnp.int32)
                for j in range(K)
            ]
        )  # (K, KF)
        rows = rows * state.kf_valid[None, :]
        rows = jnp.where(ok_id[:, None], rows, 0)
        # zero self-edges
        rows = rows.at[jnp.arange(K), ids_c].set(0)

        def write(i, cv):
            new = cv.at[ids_c[i], :].set(rows[i]).at[:, ids_c[i]].set(rows[i])
            return jnp.where(ok_id[i], new, cv)

        covis = jax.lax.fori_loop(0, K, write, covis)
    return state._replace(covis=covis)


def update_point_geometry(state: MapState, mp_mask: jnp.ndarray,
                          scale_factor: float, n_levels: int) -> MapState:
    """Recompute viewing normal + scale-invariance ring for selected points
    from their current observations (reference
    MapPoint::UpdateNormalAndDepth, src/MapPoint.cc:346-392).

    Normal = mean of unit vectors point->observing-camera-center... (the
    reference uses (p - Ow)/|p - Ow| averaged over observations); ring from
    the reference keyframe's distance and the keypoint octave.
    """
    MP = state.mp_pos.shape[0]
    KF, N = state.kf_mp.shape
    ok = (state.kf_mp >= 0) & state.kf_kp_valid & state.kf_valid[:, None]
    tgt = jnp.where(ok, state.kf_mp, MP).reshape(-1)
    # camera centers (KF, 3)
    R = state.kf_Tcw[:, :3, :3]
    t = state.kf_Tcw[:, :3, 3]
    Ow = -jnp.einsum("kij,ki->kj", R.transpose(0, 2, 1), t)
    pos = state.mp_pos  # (MP, 3)
    obs_pos = jnp.take(pos, jnp.clip(state.kf_mp, 0, MP - 1).reshape(-1), axis=0).reshape(KF, N, 3)
    d = obs_pos - Ow[:, None, :]
    dn = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-9)
    acc = jnp.zeros((MP + 1, 3)).at[tgt].add(jnp.where(ok[..., None], dn, 0.0).reshape(-1, 3))[:MP]
    cnt = jnp.zeros((MP + 1,)).at[tgt].add(ok.reshape(-1).astype(jnp.float32))[:MP]
    normal = acc / jnp.maximum(cnt[:, None], 1.0)
    nrm = jnp.linalg.norm(normal, axis=-1, keepdims=True)
    normal = normal / jnp.maximum(nrm, 1e-9)

    # Distance ring from the reference KF
    ref = jnp.clip(state.mp_ref_kf, 0, KF - 1)
    ref_Ow = jnp.take(Ow, ref, axis=0)
    dist = jnp.linalg.norm(pos - ref_Ow, axis=-1)
    # Octave of the observation in the ref KF: scatter from the (KF, N)
    # observation table (one mp_ref_kf gather per slot) — materializing the
    # per-point row gather would be an (MP, N) intermediate, gigabytes at
    # dataset capacity.
    pid = jnp.clip(state.kf_mp, 0, MP - 1)
    is_ref = ok & (jnp.take(state.mp_ref_kf, pid) == jnp.arange(KF)[:, None])
    flat = jnp.where(is_ref, state.kf_mp, MP).reshape(-1)
    octv = (
        jnp.zeros((MP + 1,), jnp.int32)
        .at[flat]
        .max(state.kf_octave.reshape(-1))[:MP]
    )
    level_sf = scale_factor ** octv.astype(jnp.float32)
    max_dist = dist * level_sf
    min_dist = max_dist / (scale_factor ** (n_levels - 1))
    upd = mp_mask & (cnt > 0)
    return state._replace(
        mp_normal=jnp.where(upd[:, None], normal, state.mp_normal),
        mp_max_dist=jnp.where(upd, max_dist, state.mp_max_dist),
        mp_min_dist=jnp.where(upd, min_dist, state.mp_min_dist),
    )
