"""Degenerate-input robustness: the engine must stay finite and not crash
on empty frames, single keypoints, featureless images, and capacity
overflow (the reference aborts or segfaults on several of these; we gate
them explicitly)."""

import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.utils.config import (
    SlamConfig, CameraConfig, CapacityConfig, OrbConfig, Sensor, TrackingConfig,
)
from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld
from my_orb_slam2_tpu.models.frame import FrameData, FrameFactory
from my_orb_slam2_tpu.models.system import SlamSystem
from my_orb_slam2_tpu.models.tracking import Tracker, TrackingState

CAP = 256


def small_cfg(**kw):
    return SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=2048),
        tracking=TrackingConfig(min_stereo_init_points=100),
        **kw,
    )


def empty_frame(cap=CAP):
    return FrameData(
        uv=jnp.zeros((cap, 2), jnp.float32),
        ur=jnp.full((cap,), -1.0, jnp.float32),
        depth=jnp.full((cap,), -1.0, jnp.float32),
        octave=jnp.zeros((cap,), jnp.int32),
        angle=jnp.zeros((cap,), jnp.float32),
        desc=jnp.zeros((cap, 8), jnp.uint32),
        valid=jnp.zeros((cap,), bool),
    )


def test_all_masked_frames_no_crash():
    """A stream of completely empty frames: never initializes, never NaNs."""
    cfg = small_cfg()
    system = SlamSystem(cfg, use_images=False, capacity=CAP, enable_loop_closing=False)
    for i in range(4):
        info = system.track_frame_data(empty_frame(), i / 30.0)
        assert info["state"] == TrackingState.NOT_INITIALIZED
        assert np.isfinite(info["Tcw"]).all()


def test_empty_frame_mid_sequence_goes_lost_and_recovers():
    """Tracking loses on a dropout frame (reference would too) and
    relocalizes when the view returns."""
    cfg = small_cfg()
    system = SlamSystem(cfg, use_images=False, capacity=CAP, enable_loop_closing=False)
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=1)
    poses = world.circular_trajectory(10, forward_per_frame=0.05)
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=100 + i)
        info = system.track_frame_data(frame, i / 30.0)
        assert info["state"] == TrackingState.OK, (i, info)
    # total dropout (lens covered)
    info = system.track_frame_data(empty_frame(), 0.9)
    assert info["state"] == TrackingState.LOST
    assert np.isfinite(info["Tcw"]).all()
    # view returns at a mapped pose -> relocalize
    frame, _ = world.observe(poses[8], CAP, seed=999)
    info = system.track_frame_data(frame, 1.0)
    assert info["state"] == TrackingState.OK, info


def test_map_point_capacity_overflow():
    """More depth-valid keypoints over time than map-point slots: the
    free-list must saturate gracefully (no crash, no index corruption)."""
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0, th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=300),  # < CAP
        tracking=TrackingConfig(min_stereo_init_points=100, max_frames_between_kf=1),
    )
    tracker = Tracker(cfg, CAP)
    world = SyntheticWorld(cfg, n_landmarks=4000, seed=2)
    poses = world.circular_trajectory(8, forward_per_frame=0.1)
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, CAP, seed=200 + i)
        tracker.track(frame, i / 30.0)
    m = tracker.map
    kf_mp = np.asarray(m.kf_mp)
    MP = m.mp_pos.shape[0]
    assert kf_mp.max() < MP, "observation index out of range after overflow"
    assert np.isfinite(np.asarray(m.mp_pos)).all()
    assert int(np.asarray(m.mp_valid).sum()) <= MP


def test_featureless_image_extraction():
    """A flat image yields zero keypoints; downstream frame build stays sane."""
    cfg = small_cfg(orb=OrbConfig(n_features=128, n_levels=3))
    factory = FrameFactory(cfg)
    img = np.full((480, 640), 128, np.uint8)
    frame = factory.build_stereo(img, img)
    assert int(np.asarray(frame.valid).sum()) == 0
    assert np.isfinite(np.asarray(frame.uv)).all()


def test_single_blob_image_extraction():
    """One corner-rich blob: at least one keypoint, all outputs finite."""
    cfg = small_cfg(orb=OrbConfig(n_features=128, n_levels=3))
    factory = FrameFactory(cfg)
    img = np.full((480, 640), 30, np.uint8)
    img[200:212, 300:312] = 220
    frame = factory.build_mono(img)
    n = int(np.asarray(frame.valid).sum())
    assert n >= 1, "no keypoint found on a high-contrast blob"
    uv = np.asarray(frame.uv)[np.asarray(frame.valid)]
    assert np.isfinite(uv).all()
    assert (np.abs(uv - np.array([305.5, 205.5])) < 30).all(), uv[:4]
