"""Dataset loader + visualization tests with synthetic files on disk."""

import os

import numpy as np
import pytest

from my_orb_slam2_tpu.utils import datasets, viz

cv2 = pytest.importorskip("cv2")


def make_tum_seq(tmp_path, n=3, h=120, w=160):
    rng = np.random.default_rng(0)
    (tmp_path / "rgb").mkdir()
    (tmp_path / "depth").mkdir()
    rgb_lines, depth_lines = ["# rgb"], ["# depth"]
    for i in range(n):
        t = 1000.0 + i * 0.05
        img = rng.integers(0, 255, (h, w), dtype=np.uint8)
        dep = rng.integers(500, 5000, (h, w), dtype=np.uint16)
        cv2.imwrite(str(tmp_path / "rgb" / f"{t:.6f}.png"), img)
        cv2.imwrite(str(tmp_path / "depth" / f"{t+0.01:.6f}.png"), dep)
        rgb_lines.append(f"{t:.6f} rgb/{t:.6f}.png")
        depth_lines.append(f"{t+0.01:.6f} depth/{t+0.01:.6f}.png")
    (tmp_path / "rgb.txt").write_text("\n".join(rgb_lines))
    (tmp_path / "depth.txt").write_text("\n".join(depth_lines))
    return tmp_path


def test_tum_rgbd_loader(tmp_path):
    seq = make_tum_seq(tmp_path)
    ds = datasets.TumRgbdDataset(str(seq))
    assert len(ds) == 3
    frames = list(ds.frames())
    rgb, depth, ts = frames[0]
    assert rgb.shape == (120, 160) and depth.dtype == np.uint16
    assert abs(ts - 1000.0) < 1e-6


def test_kitti_loader(tmp_path):
    rng = np.random.default_rng(1)
    (tmp_path / "image_0").mkdir()
    (tmp_path / "image_1").mkdir()
    for i in range(2):
        for c in ("image_0", "image_1"):
            cv2.imwrite(
                str(tmp_path / c / f"{i:06d}.png"),
                rng.integers(0, 255, (90, 160), dtype=np.uint8),
            )
    (tmp_path / "times.txt").write_text("0.0\n0.1\n")
    ds = datasets.KittiStereoDataset(str(tmp_path))
    frames = list(ds.frames())
    assert len(frames) == 2
    l, r, t = frames[1]
    assert l.shape == (90, 160) and abs(t - 0.1) < 1e-9


def test_pnm_fallback(tmp_path):
    img = (np.arange(120 * 160) % 255).reshape(120, 160).astype(np.uint8)
    p = tmp_path / "x.pgm"
    with open(p, "wb") as f:
        f.write(b"P5\n160 120\n255\n")
        f.write(img.tobytes())
    out = datasets._read_pnm(str(p))
    np.testing.assert_array_equal(out, img)


def test_draw_frame_and_map(rng):
    img = rng.integers(0, 255, (120, 160), dtype=np.uint8)
    uv = rng.uniform(0, 150, (30, 2)).astype(np.float32)
    matched = rng.random(30) > 0.5
    valid = np.ones(30, bool)
    out = viz.draw_frame(img, uv, matched, valid)
    assert out.shape == (120, 160, 3)
    assert (out != np.stack([img] * 3, -1)).any()  # something was drawn

    mp = rng.normal(size=(200, 3)).astype(np.float32) * 5
    mp_valid = np.ones(200, bool)
    kf = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    kf[:, 2, 3] = np.arange(4)
    m = viz.render_map_topdown(mp, mp_valid, kf, np.ones(4, bool), np.eye(4))
    assert m.shape == (800, 800, 3)
    assert (m != 255).any()


def test_settings_yaml_roundtrip(tmp_path):
    yaml = """%YAML:1.0
Camera.fx: 718.856
Camera.fy: 718.856
Camera.cx: 607.1928
Camera.cy: 185.2157
Camera.k1: 0.0
Camera.k2: 0.0
Camera.p1: 0.0
Camera.p2: 0.0
Camera.bf: 386.1448
Camera.fps: 10.0
Camera.RGB: 1
ThDepth: 35.0
ORBextractor.nFeatures: 2000
ORBextractor.scaleFactor: 1.2
ORBextractor.nLevels: 8
ORBextractor.iniThFAST: 20
ORBextractor.minThFAST: 7
"""
    p = tmp_path / "KITTI.yaml"
    p.write_text(yaml)
    from my_orb_slam2_tpu.utils.config import Sensor, load_yaml_settings

    cfg = load_yaml_settings(str(p), Sensor.STEREO)
    assert abs(cfg.camera.fx - 718.856) < 1e-6
    assert abs(cfg.camera.bf - 386.1448) < 1e-6
    assert cfg.orb.n_features == 2000
    assert cfg.camera.th_depth == 35.0


def test_native_decoder_matches_cv2(tmp_path, rng):
    """C++ PNG/PGM decode must match OpenCV byte-for-byte."""
    from my_orb_slam2_tpu.utils import native_io

    if not native_io.available():
        pytest.skip("native library not built")
    img8 = rng.integers(0, 255, (64, 96), dtype=np.uint8)
    img16 = rng.integers(0, 65535, (48, 80), dtype=np.uint16)
    rgb = rng.integers(0, 255, (32, 40, 3), dtype=np.uint8)
    p8 = str(tmp_path / "g8.png"); cv2.imwrite(p8, img8)
    p16 = str(tmp_path / "g16.png"); cv2.imwrite(p16, img16)
    prgb = str(tmp_path / "rgb.png"); cv2.imwrite(prgb, rgb)
    out8 = native_io.decode_image(p8)
    np.testing.assert_array_equal(out8, img8)
    out16 = native_io.decode_image(p16)
    np.testing.assert_array_equal(out16, img16)
    outrgb = native_io.decode_image(prgb)
    assert outrgb.shape == (32, 40)
    # PGM
    ppgm = str(tmp_path / "x.pgm"); cv2.imwrite(ppgm, img8)
    np.testing.assert_array_equal(native_io.decode_image(ppgm), img8)


def test_native_prefetcher(tmp_path, rng):
    from my_orb_slam2_tpu.utils import native_io

    if not native_io.available():
        pytest.skip("native library not built")
    imgs = []
    paths = []
    for i in range(12):
        img = rng.integers(0, 255, (60, 80), dtype=np.uint8)
        p = str(tmp_path / f"f{i:03d}.png")
        cv2.imwrite(p, img)
        imgs.append(img)
        paths.append(p)
    pf = native_io.NativePrefetcher(paths, n_threads=3, window=4)
    for i in range(12):
        out = pf.get(i)
        np.testing.assert_array_equal(out, imgs[i])
    pf.close()


def test_ar_plane_detection_and_overlay():
    """AR utilities (reference Examples/ROS/ORB_SLAM2/AR/ViewerAR.cc):
    RANSAC plane fit recovers a known plane among outliers; the cube/grid
    overlay draws into the image."""
    from my_orb_slam2_tpu.utils import ar

    rng = np.random.default_rng(0)
    n_in, n_out = 200, 60
    # Plane: y = 2 (normal +-e_y), with noise; outliers scattered.
    pts = np.concatenate([
        np.stack([
            rng.uniform(-5, 5, n_in),
            2.0 + rng.normal(0, 0.005, n_in),
            rng.uniform(4, 14, n_in),
        ], axis=1),
        np.stack([
            rng.uniform(-5, 5, n_out),
            rng.uniform(-4, 1.0, n_out),
            rng.uniform(4, 14, n_out),
        ], axis=1),
    ])
    cam_c = np.zeros(3)
    plane = ar.detect_plane(pts, cam_c, seed=1)
    assert plane is not None
    assert abs(abs(plane.normal[1]) - 1.0) < 0.02, plane.normal
    # Normal oriented toward the camera (camera is at y=0 < 2 -> -e_y side).
    assert plane.normal[1] < 0
    assert plane.n_inliers >= n_in * 0.9
    assert abs(plane.centroid[1] - 2.0) < 0.05
    # Plane frame axes orthonormal, z == normal.
    R = plane.Tpw[:3, :3]
    np.testing.assert_allclose(R.T @ R, np.eye(3), atol=1e-6)
    np.testing.assert_allclose(R[:, 2], plane.normal, atol=1e-6)

    # Overlay draws pixels.
    img = np.zeros((480, 640, 3), np.uint8)
    Tcw = np.eye(4, dtype=np.float32)
    ar.draw_cube(img, Tcw, plane.Tpw, 0.5, 500.0, 500.0, 320.0, 240.0)
    ar.draw_plane_grid(img, Tcw, plane.Tpw, 1.0, 5, 500.0, 500.0, 320.0, 240.0)
    assert (img.any(axis=-1)).sum() > 200, "overlay drew almost nothing"

    # Degenerate input: too few points -> None, no crash.
    assert ar.detect_plane(pts[:5], cam_c) is None
    # No dominant plane -> None.
    scatter = rng.uniform(-5, 5, (120, 3))
    assert ar.detect_plane(scatter, cam_c, seed=2) is None


def test_render_map_3d_graph_structure():
    """3D render must show frusta + covis/spanning/loop edges on a
    loop-closed map (reference MapDrawer::DrawKeyFrames contract)."""
    rng = np.random.default_rng(3)
    KF = 8
    kf_Tcw = np.tile(np.eye(4, dtype=np.float32), (KF, 1, 1))
    for k in range(KF):
        a = 2 * np.pi * k / KF
        R = np.array(
            [[np.cos(a), 0, np.sin(a)], [0, 1, 0], [-np.sin(a), 0, np.cos(a)]],
            np.float32,
        )
        c = np.array([4 * np.sin(a), 0.0, 4 - 4 * np.cos(a)], np.float32)
        kf_Tcw[k, :3, :3] = R
        kf_Tcw[k, :3, 3] = -R @ c
    covis = np.zeros((KF, KF), np.int32)
    for k in range(KF - 1):
        covis[k, k + 1] = covis[k + 1, k] = 60
    covis[0, 3] = covis[3, 0] = 60  # a non-spanning covis edge
    parents = np.asarray([-1] + list(range(KF - 1)), np.int32)
    loop = np.zeros((KF, KF), bool)
    loop[KF - 1, 0] = loop[0, KF - 1] = True
    mp = rng.normal(0, 3, (200, 3)).astype(np.float32) + [0, 0, 4]
    img = viz.render_map_3d(
        mp, np.ones(200, bool), kf_Tcw, np.ones(KF, bool),
        covis=covis, kf_parent=parents, loop_edges=loop,
        cur_Tcw=kf_Tcw[-1],
    )
    assert img.shape == (900, 900, 3)
    flat = img.reshape(-1, 3)
    assert (flat == np.array([230, 30, 30])).all(1).any(), "no loop edge drawn"
    assert (flat == np.array([60, 60, 230])).all(1).any(), "no frusta drawn"
    assert (flat == np.array([90, 200, 90])).all(1).any(), "no covis edges"
    assert (flat == np.array([0, 120, 0])).all(1).any(), "no spanning tree"
    assert (flat == np.array([170, 170, 170])).all(1).any(), "no points"


def test_live_viewer_loop(tmp_path):
    """LiveViewer (reference Viewer::Run analog): continuously overwritten
    renders + control-file menu commands (localization / reset / follow)."""
    import numpy as np

    from my_orb_slam2_tpu.models.system import SlamSystem
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, SlamConfig, Sensor, TrackingConfig,
    )
    from my_orb_slam2_tpu.utils.synthetic import SyntheticWorld
    from my_orb_slam2_tpu.utils.viz import LiveViewer

    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=40.0,
                            th_depth=40.0),
        capacity=CapacityConfig(max_keyframes=16, max_map_points=2048),
        tracking=TrackingConfig(min_stereo_init_points=100),
    )
    world = SyntheticWorld(cfg, n_landmarks=3000, seed=3)
    poses = world.circular_trajectory(3, forward_per_frame=0.2)
    system = SlamSystem(cfg, use_images=False, capacity=256)
    viewer = LiveViewer(str(tmp_path / "live"))
    img = np.zeros((480, 640), np.uint8)
    for i, Tcw in enumerate(poses):
        frame, _ = world.observe(Tcw, 256, seed=40 + i, stereo_fraction=0.8)
        info = system.track_frame_data(frame, i / 30.0)
        viewer.update(system, img, info, i)
    assert (tmp_path / "live" / "live_frame.png").exists()
    assert (tmp_path / "live" / "live_map.png").exists()
    # menu commands through the control file
    ctrl = tmp_path / "live" / "control"
    ctrl.write_text("localization\nfree\n")
    cmds = viewer.poll_commands(system)
    assert cmds == ["localization", "free"]
    assert system.tracker.only_tracking is True
    assert viewer.follow is False
    ctrl.write_text("localization\nfree\nslam\nreset\n")
    cmds = viewer.poll_commands(system)
    assert cmds == ["slam", "reset"]
    assert system.tracker.only_tracking is False
