"""Silent caps must be COUNTED: every static-capacity truncation increments
a device counter (cap_overflow for losses, shed_work for bounded-per-pass
work shedding, obs_overflow for observation-row saturation) that drivers
surface
(VERDICT r2 weak 6). Each test forces one overflow and asserts the counter
moves.
"""

import jax
import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.models.local_mapping import create_new_map_points
from my_orb_slam2_tpu.models.tracking import Tracker
from my_orb_slam2_tpu.utils.config import (
    CameraConfig, CapacityConfig, SlamConfig, Sensor, TrackingConfig,
)
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld

CAPACITY = 256


def tiny_cfg():
    return SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                            th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=2048),
        tracking=TrackingConfig(min_stereo_init_points=100),
    )


def _two_kf_state(cfg, stereo_fraction=0.3, n_frames=4):
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=2)
    poses = world.circular_trajectory(
        n_frames, forward_per_frame=0.25, yaw_per_frame=0.03
    )
    tracker = Tracker(cfg, CAPACITY)
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(
            Tcw, CAPACITY, seed=900 + i, stereo_fraction=stereo_fraction
        )
        tracker.track(frame, i / 30.0)
    return tracker


def test_triangulation_query_overflow_counted():
    """More map-point-free keypoints than max_queries -> shed_work (the
    queries are re-attempted on later passes, so they are load-shedding,
    not candidate loss)."""
    cfg = tiny_cfg()
    tracker = _two_kf_state(cfg, stereo_fraction=0.8)
    assert tracker.n_kf >= 1, "fixture failed to initialize"
    state = tracker.map
    kf = jnp.int32(tracker.n_kf - 1)
    # Force unmatched keypoints: clear the map-point binding of 64 VALID
    # slots (the fixture's tracking can otherwise match every slot).
    valid_slots = np.nonzero(np.asarray(state.kf_kp_valid[int(kf)]))[0]
    assert len(valid_slots) > 64, len(valid_slots)
    row = state.kf_mp[int(kf)]
    row = row.at[jnp.asarray(valid_slots[:64])].set(-1)
    state = state._replace(kf_mp=state.kf_mp.at[int(kf)].set(row))
    n_free = int(
        np.asarray(
            state.kf_kp_valid[int(kf)] & (state.kf_mp[int(kf)] < 0)
        ).sum()
    )
    assert n_free > 8, "fixture must leave unmatched keypoints"
    before = int(np.asarray(state.shed_work))
    state2, _ = create_new_map_points(
        cfg, jax.tree.map(lambda x: x.copy(), state), kf,
        n_neighbors=2, max_queries=8,
    )
    after = int(np.asarray(state2.shed_work))
    assert after - before == n_free - 8, (before, after, n_free)



def test_obs_index_row_overflow_counted():
    """Appending to a FULL observation row reports overflow instead of
    silently dropping."""
    MP, K = 8, 4
    obs_kf = jnp.zeros((MP, K), jnp.int32)  # all rows full (entries = kf 0)
    obs_slot = jnp.zeros((MP, K), jnp.int32)
    pid = jnp.asarray([2, 5], jnp.int32)
    kf = jnp.asarray([1, 1], jnp.int32)
    slot = jnp.asarray([3, 4], jnp.int32)
    _, _, did, n_over = ms.obs_add_pairs(
        obs_kf, obs_slot, pid, kf, slot, jnp.ones(2, bool)
    )
    assert not bool(did.any())
    assert int(n_over) == 2
    cnt = jnp.full((2,), K, jnp.int32)
    _, _, did2, n_over2 = ms.obs_add_pairs_multi(
        obs_kf, obs_slot, pid, kf, slot, jnp.ones(2, bool), cnt
    )
    assert not bool(did2.any())
    assert int(n_over2) == 2


def test_search_and_fuse_group_caps_counted():
    """SearchAndFuse group members beyond the top-N cap are counted into
    cap_overflow (reference projects into EVERY corrected keyframe,
    src/LoopClosing.cc:698-727 — our static cap must be visible)."""
    from my_orb_slam2_tpu.models.loop_closing import _search_and_fuse_group

    cfg = tiny_cfg()
    tracker = _two_kf_state(cfg, stereo_fraction=0.9, n_frames=10)
    state = tracker.map
    KF = state.kf_valid.shape[0]
    n_valid = int(np.asarray(state.kf_valid).sum())
    assert n_valid >= 2
    group = state.kf_valid  # every live keyframe in the "corrected group"
    loop_pts = state.mp_valid
    before = int(np.asarray(state.cap_overflow))
    state2 = _search_and_fuse_group(
        cfg, jax.tree.map(lambda x: x.copy(), state), jnp.int32(0),
        group, loop_pts, n_members=1, max_loop_pts=4096,
    )
    after = int(np.asarray(state2.cap_overflow))
    assert after - before >= n_valid - 1, (before, after, n_valid)


def test_kf_capacity_refusal_counted():
    """NeedNewKeyFrame at the KF cap refuses AND counts."""
    cfg = tiny_cfg()
    tracker = _two_kf_state(cfg)
    tracker.n_kf = cfg.capacity.max_keyframes  # saturate
    # stats vector that would normally trigger a keyframe
    stats = np.zeros(9, np.float32)
    stats[0] = 30  # inliers
    stats[1] = 200  # ref matches -> ratio low
    stats[3] = 100  # many non-tracked close
    before = tracker.kf_capacity_refusals
    want = tracker._need_new_keyframe(stats, frame_id=tracker.frame_id + 100)
    assert want is False
    assert tracker.kf_capacity_refusals == before + 1
