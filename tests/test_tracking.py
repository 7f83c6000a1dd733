"""End-to-end tracking tests on the synthetic world (fake backend)."""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.utils.config import SlamConfig, CameraConfig, CapacityConfig, Sensor
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState


def small_cfg():
    return SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=8192),
    )


CAPACITY = 512


def test_stereo_initialization():
    cfg = small_cfg()
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=1)
    Tcw = np.eye(4)
    frame, lm = world.observe(Tcw, CAPACITY, seed=10)
    tracker = Tracker(cfg, CAPACITY)
    ok = tracker.initialize_stereo(frame, 0.0)
    assert ok
    assert tracker.state == TrackingState.OK
    m = tracker.map
    n_pts = int(jnp.sum(m.mp_valid))
    assert n_pts > 300, n_pts
    # Created points should be near their ground-truth landmarks.
    kf_mp = np.asarray(m.kf_mp[0])
    created = kf_mp >= 0
    pos = np.asarray(m.mp_pos)[kf_mp[created]]
    gt = world.landmarks[lm[created]]
    # Stereo depth noise scales ~ z^2/(bf) * sigma_disparity: at 20-40 m with
    # bf=40 and 0.3 px noise, multi-meter absolute error is expected physics.
    # Gate on relative error instead, and tightly on close points.
    rel = np.linalg.norm(pos - gt, axis=1) / np.linalg.norm(gt, axis=1)
    assert np.median(rel) < 0.2, np.median(rel)
    close = gt[:, 2] < 8.0
    err_close = np.linalg.norm(pos[close] - gt[close], axis=1)
    assert np.median(err_close) < 0.5, np.median(err_close)


def test_tracking_sequence_odometry():
    """Track 30 frames of forward motion; ATE should stay small (no BA,
    no loop closing — pure odometry with keyframe insertion)."""
    cfg = small_cfg()
    world = SyntheticWorld(cfg, n_landmarks=4000, seed=2)
    poses = world.circular_trajectory(30, forward_per_frame=0.08)
    tracker = Tracker(cfg, CAPACITY)
    est = []
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAPACITY, seed=100 + i)
        info = tracker.track(frame, i * 0.033)
        assert info["state"] == TrackingState.OK, f"lost at frame {i}: {info}"
        est.append(info["Tcw"])
    ate = ate_rmse(np.stack(est), poses)
    assert ate < 0.05, f"ATE {ate}"
    # At least a few keyframes should have been created.
    assert tracker.kf_counter >= 1


def test_tracking_recovers_scale_consistency():
    """Depths of created points should match ground truth scale (stereo)."""
    cfg = small_cfg()
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=3)
    poses = world.circular_trajectory(10, forward_per_frame=0.1)
    tracker = Tracker(cfg, CAPACITY)
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAPACITY, seed=200 + i)
        tracker.track(frame, i * 0.033)
    # translation magnitude of trajectory vs ground truth
    poses_out = tracker.trajectory_poses()
    est_t = np.linalg.norm(poses_out[-1][2][:3, 3] - poses_out[0][2][:3, 3])
    gt_t = np.linalg.norm(poses[-1][:3, 3] - poses[0][:3, 3])
    assert abs(est_t - gt_t) / gt_t < 0.05


def test_pipelined_mode_matches_sync():
    """Pipelined tracking (deferred readback) must produce an equally good
    trajectory — same math, one frame of decision latency."""
    cfg = small_cfg()
    world = SyntheticWorld(cfg, n_landmarks=4000, seed=2)
    poses = world.circular_trajectory(24, forward_per_frame=0.08)

    def run(pipelined):
        tracker = Tracker(cfg, CAPACITY)
        tracker.pipelined = pipelined
        for i, Tcw in enumerate(poses):
            frame, _ = world.observe(Tcw, CAPACITY, seed=100 + i)
            info = tracker.track(frame, i * 0.033)
            assert info["state"] == TrackingState.OK, (pipelined, i, info)
        traj = tracker.trajectory_poses()
        return np.stack([T for _, _, T, lost in traj if not lost])

    est_sync = run(False)
    est_pipe = run(True)
    a_sync = ate_rmse(est_sync, poses[: len(est_sync)])
    a_pipe = ate_rmse(est_pipe, poses[: len(est_pipe)])
    assert a_pipe < max(2 * a_sync, 0.05), (a_sync, a_pipe)
