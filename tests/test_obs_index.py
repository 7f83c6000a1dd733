"""Inverted observation index: primitives + pipeline-wide invariants.

The index (MapState.mp_obs_kf/mp_obs_slot) must mirror kf_mp exactly at all
times — every derived-state refresh (covisibility, geometry, counts, culling
redundancy) trusts it. `check_obs_invariants` is the ground truth these
tests (and test_local_mapping/test_system imports) assert after every
pipeline mutation.
"""

import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.utils.config import (
    CameraConfig, CapacityConfig, SlamConfig, Sensor, TrackingConfig,
)


def check_obs_invariants(state, check_counts=True):
    """Assert index <-> kf_mp consistency (exact set equality per point) and
    observation-count correctness."""
    kf_mp = np.asarray(state.kf_mp)
    kp_valid = np.asarray(state.kf_kp_valid)
    kf_valid = np.asarray(state.kf_valid)
    obs_kf = np.asarray(state.mp_obs_kf)
    obs_slot = np.asarray(state.mp_obs_slot)
    ur = np.asarray(state.kf_ur)
    mp_valid = np.asarray(state.mp_valid)
    n_obs = np.asarray(state.mp_n_obs)
    KF, N = kf_mp.shape
    MP = obs_kf.shape[0]

    # forward -> inverted: every recorded kf_mp observation has an entry
    fwd = {}
    ks, ns = np.nonzero((kf_mp >= 0) & kp_valid & kf_valid[:, None])
    for k, n in zip(ks, ns):
        fwd.setdefault(int(kf_mp[k, n]), set()).add((int(k), int(n)))
    # inverted -> forward
    inv = {}
    for p in np.nonzero((obs_kf >= 0).any(axis=1))[0]:
        ents = set()
        for j in range(obs_kf.shape[1]):
            if obs_kf[p, j] >= 0:
                ents.add((int(obs_kf[p, j]), int(obs_slot[p, j])))
        inv[int(p)] = ents

    for p, ents in fwd.items():
        assert p in inv, f"point {p}: kf_mp has obs {ents} but index row empty"
        assert inv[p] == ents, (
            f"point {p}: index {sorted(inv[p])} != kf_mp {sorted(ents)}"
        )
    for p, ents in inv.items():
        assert fwd.get(p) == ents, (
            f"point {p}: index {sorted(ents)} != kf_mp {sorted(fwd.get(p, set()))}"
        )
        assert mp_valid[p], f"point {p}: invalid but index row non-empty"

    if check_counts:
        for p in range(MP):
            expect = sum(
                2 if ur[k, n] >= 0 else 1 for (k, n) in fwd.get(p, set())
            )
            assert n_obs[p] == expect, (
                f"point {p}: mp_n_obs {n_obs[p]} != {expect}"
            )


def _mini_cfg(KF=32, MP=4096, **tr):
    return SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=KF, max_map_points=MP),
        tracking=TrackingConfig(min_stereo_init_points=100, **tr),
    )


# ---------------------------------------------------------------------------
# Primitives
# ---------------------------------------------------------------------------


def test_rebuild_matches_manual_state():
    rng = np.random.default_rng(0)
    cfg = _mini_cfg(KF=16, MP=256)
    state = ms.init_map_state(cfg, 32)
    KF, N = state.kf_mp.shape
    MP = state.mp_pos.shape[0]
    kf_mp = rng.integers(-1, MP, size=(KF, N)).astype(np.int32)
    kp_valid = rng.random((KF, N)) > 0.3
    kf_valid = np.zeros(KF, bool)
    kf_valid[:10] = True
    state = state._replace(
        kf_mp=jnp.asarray(kf_mp),
        kf_kp_valid=jnp.asarray(kp_valid),
        kf_valid=jnp.asarray(kf_valid),
        mp_valid=jnp.ones(MP, bool),
    )
    state = ms.rebuild_obs_index(state)
    check_obs_invariants(state)


def test_add_remove_pairs_roundtrip():
    cfg = _mini_cfg(KF=8, MP=64)
    state = ms.init_map_state(cfg, 16)
    pid = jnp.asarray([3, 5, 9], jnp.int32)
    kf = jnp.asarray([1, 1, 2], jnp.int32)
    slot = jnp.asarray([0, 4, 7], jnp.int32)
    mask = jnp.asarray([True, True, True])
    okf, osl, did, nov = ms.obs_add_pairs(
        state.mp_obs_kf, state.mp_obs_slot, pid, kf, slot, mask
    )
    assert bool(did.all()) and int(nov) == 0
    assert int(okf[3, 0]) == 1 and int(osl[3, 0]) == 0
    assert int(okf[5, 0]) == 1 and int(osl[5, 0]) == 4
    # second observation of point 3 goes to entry 1
    okf, osl, did, _ = ms.obs_add_pairs(
        okf, osl, jnp.asarray([3], jnp.int32), jnp.asarray([2], jnp.int32),
        jnp.asarray([9], jnp.int32), jnp.asarray([True]),
    )
    assert int(okf[3, 1]) == 2 and int(osl[3, 1]) == 9
    # remove the first -> hole at entry 0, entry 1 intact
    okf, osl = ms.obs_remove_pairs(
        okf, osl, jnp.asarray([3], jnp.int32), jnp.asarray([1], jnp.int32),
        jnp.asarray([0], jnp.int32), jnp.asarray([True]),
    )
    assert int(okf[3, 0]) == -1 and int(okf[3, 1]) == 2
    # compact moves entry 1 -> 0
    okf, osl = ms.obs_compact_rows(
        okf, osl, jnp.asarray([3], jnp.int32), jnp.asarray([True])
    )
    assert int(okf[3, 0]) == 2 and int(osl[3, 0]) == 9 and int(okf[3, 1]) == -1


def test_obs_overflow_counted_and_dropped():
    cfg = _mini_cfg(KF=8, MP=64)
    state = ms.init_map_state(cfg, 16)
    K = state.mp_obs_kf.shape[1]
    okf, osl = state.mp_obs_kf, state.mp_obs_slot
    for j in range(K + 2):
        okf, osl, did, nov = ms.obs_add_pairs(
            okf, osl, jnp.asarray([7], jnp.int32),
            jnp.asarray([j % 8], jnp.int32), jnp.asarray([j], jnp.int32),
            jnp.asarray([True]),
        )
        if j < K:
            assert bool(did[0]) and int(nov) == 0
        else:
            assert not bool(did[0]) and int(nov) == 1


# ---------------------------------------------------------------------------
# Pipeline-wide invariant: tracker + full mapper on synthetic world
# ---------------------------------------------------------------------------


def test_pipeline_maintains_index_invariants():
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.models.tracking import Tracker
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

    cfg = _mini_cfg(KF=32, MP=4096, max_frames_between_kf=2)
    CAP = 256
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=5)
    poses = world.circular_trajectory(40, forward_per_frame=0.09, yaw_per_frame=0.025)
    mapper = lm.LocalMapper(cfg, run_ba=True, cull_keyframes=True)
    tracker = Tracker(cfg, CAP, local_mapper=mapper)
    checked = 0
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=700 + i)
        info = tracker.track(frame, i / 30.0)
        if info.get("kf"):
            check_obs_invariants(tracker.map)
            checked += 1
    assert checked >= 3
    assert tracker.state == 1  # still OK
