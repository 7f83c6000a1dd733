"""Synthesize TUM-RGBD- and KITTI-format sequences ON DISK.

The reference validates by running its example mains over TUM/KITTI/EuRoC
directories (reference README.md:97-167, Examples/RGB-D/rgbd_tum.cc). This
environment ships no datasets, so this tool renders a blob world into the
exact on-disk layouts the loaders expect — PNG images (in-house encoder),
rgb.txt/depth.txt/associations.txt, image_0/image_1 + times.txt, plus
groundtruth for ATE gates — exercising the full IO path: native C++
prefetcher -> in-house PNG decoder -> FrameFactory -> tracker.

Usage:
  python tools/make_dataset.py tum   OUT_DIR [--frames 80] [--hw 240x320]
  python tools/make_dataset.py kitti OUT_DIR [--frames 80] [--hw 240x320]

Writes OUT_DIR/settings.yaml alongside, ready for examples/run_dataset.py.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_orb_slam2_tpu.utils.png_io import write_png  # noqa: E402
from tools.render_world import make_world, render_with_depth  # noqa: E402

DEPTH_FACTOR = 5000.0  # TUM convention: depth_png = meters * 5000


class _Cam:
    def __init__(self, H, W, baseline):
        self.fx = self.fy = 0.8 * W
        self.cx = W / 2.0
        self.cy = H / 2.0
        self.baseline = baseline
        self.bf = self.fx * baseline


def _trajectory(n_frames, step=0.25, lateral=0.0):
    """Forward-dominant motion by default; `lateral` adds per-frame x
    translation (monocular H/F initialization needs parallax — pure
    forward motion barely produces any)."""
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import lie

    poses = []
    Twc = np.eye(4)
    d = np.asarray(
        lie.se3_exp(jnp.asarray([lateral, 0.0, step, 0.0, 0.004, 0.0]))
    )
    for _ in range(n_frames):
        poses.append(np.linalg.inv(Twc).astype(np.float32))
        Twc = Twc @ d
    return poses


def _write_groundtruth(path, poses, times):
    import jax.numpy as jnp

    from my_orb_slam2_tpu.ops import lie

    with open(path, "w") as f:
        f.write("# ground truth trajectory\n# timestamp tx ty tz qx qy qz qw\n")
        for t, Tcw in zip(times, poses):
            Twc = np.linalg.inv(Tcw)
            q = np.asarray(lie.rotation_to_quaternion(jnp.asarray(Twc[:3, :3])))
            p = Twc[:3, 3]
            f.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                    f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n")


def _write_settings(path, cam, H, W, sensor, n_features=800):  # noqa: D103
    with open(path, "w") as f:
        f.write("%YAML:1.0\n")
        for k, v in [
            ("Camera.fx", cam.fx), ("Camera.fy", cam.fy),
            ("Camera.cx", cam.cx), ("Camera.cy", cam.cy),
            ("Camera.k1", 0.0), ("Camera.k2", 0.0),
            ("Camera.p1", 0.0), ("Camera.p2", 0.0),
            ("Camera.width", W), ("Camera.height", H),
            ("Camera.fps", 10.0), ("Camera.bf", cam.bf),
            ("Camera.RGB", 1), ("ThDepth", 40.0),
            ("DepthMapFactor", DEPTH_FACTOR),
            ("ORBextractor.nFeatures", n_features),
            ("ORBextractor.scaleFactor", 1.2),
            ("ORBextractor.nLevels", 8),
            ("ORBextractor.iniThFAST", 20),
            ("ORBextractor.minThFAST", 7),
            # engine extension: synthetic blob scenes yield fewer stereo
            # matches per frame than real imagery at the same feature count
            ("Tracking.minStereoInitPoints", 250),
        ]:
            f.write(f"{k}: {v}\n")


def make_tum(out_dir, n_frames=80, H=240, W=320, seed=5, lateral=0.0,
             extent=(10.0, 6.0, 60.0), z_near=3.0):
    os.makedirs(os.path.join(out_dir, "rgb"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
    cam = _Cam(H, W, baseline=0.075)
    world = make_world(seed=seed, n_pts=1400, extent=extent, z_near=z_near)
    poses = _trajectory(n_frames, step=0.12 if lateral else 0.25,
                        lateral=lateral)
    times = [1_300_000_000.0 + i * 0.1 for i in range(n_frames)]
    rgb_lines, depth_lines, assoc = [], [], []
    for i, (t, Tcw) in enumerate(zip(times, poses)):
        img, depth = render_with_depth(world, cam, H, W, Tcw)
        rgb_rel = f"rgb/{t:.6f}.png"
        depth_rel = f"depth/{t:.6f}.png"
        write_png(os.path.join(out_dir, rgb_rel), img)
        d16 = np.clip(depth * DEPTH_FACTOR, 0, 65535).astype(np.uint16)
        write_png(os.path.join(out_dir, depth_rel), d16)
        rgb_lines.append(f"{t:.6f} {rgb_rel}")
        depth_lines.append(f"{t:.6f} {depth_rel}")
        assoc.append(f"{t:.6f} {rgb_rel} {t:.6f} {depth_rel}")
    for name, lines in [("rgb.txt", rgb_lines), ("depth.txt", depth_lines),
                        ("associations.txt", assoc)]:
        with open(os.path.join(out_dir, name), "w") as f:
            f.write("# synthesized TUM-format sequence\n# ts path\n")
            f.write("\n".join(lines) + "\n")
    _write_groundtruth(os.path.join(out_dir, "groundtruth.txt"), poses, times)
    _write_settings(os.path.join(out_dir, "settings.yaml"), cam, H, W, "rgbd")
    return poses, times


def make_kitti(out_dir, n_frames=80, H=240, W=320, seed=11):
    os.makedirs(os.path.join(out_dir, "image_0"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "image_1"), exist_ok=True)
    cam = _Cam(H, W, baseline=0.54)
    # Dense near-field structure: the stereo initializer requires >=500
    # depth-valid keypoints (reference StereoInitialization N>500,
    # src/Tracking.cc:556-609) — a sparse far-field scene never initializes.
    world = make_world(seed=seed, n_pts=3000, extent=(14.0, 6.0, 70.0),
                      z_near=2.0)
    poses = _trajectory(n_frames, step=0.4)
    times = [i * 0.1 for i in range(n_frames)]
    for i, Tcw in enumerate(poses):
        left, _ = render_with_depth(world, cam, H, W, Tcw)
        right, _ = render_with_depth(world, cam, H, W, Tcw,
                                     right_shift=cam.baseline)
        write_png(os.path.join(out_dir, "image_0", f"{i:06d}.png"), left)
        write_png(os.path.join(out_dir, "image_1", f"{i:06d}.png"), right)
    with open(os.path.join(out_dir, "times.txt"), "w") as f:
        f.write("\n".join(f"{t:.6e}" for t in times) + "\n")
    _write_groundtruth(os.path.join(out_dir, "groundtruth.txt"), poses, times)
    _write_settings(os.path.join(out_dir, "settings.yaml"), cam, H, W,
                    "stereo", n_features=1400)
    return poses, times


def make_euroc(out_dir, n_frames=60, H=240, W=320, seed=17):
    """EuRoC MAV layout: cam0/data + cam1/data with nanosecond-stamped PNG
    names + a timestamp list (reference Examples/Stereo/stereo_euroc.cc;
    images synthesized already-rectified, so the optional rectification
    maps are identity)."""
    cam = _Cam(H, W, baseline=0.11)
    for c in ("cam0", "cam1"):
        os.makedirs(os.path.join(out_dir, c, "data"), exist_ok=True)
    world = make_world(seed=seed, n_pts=2600, extent=(12.0, 6.0, 50.0),
                      z_near=2.0)
    poses = _trajectory(n_frames, step=0.3)
    stamps = [int(1.4e18) + i * 50_000_000 for i in range(n_frames)]
    for i, Tcw in enumerate(poses):
        left, _ = render_with_depth(world, cam, H, W, Tcw)
        right, _ = render_with_depth(world, cam, H, W, Tcw,
                                     right_shift=cam.baseline)
        write_png(os.path.join(out_dir, "cam0", "data", f"{stamps[i]}.png"), left)
        write_png(os.path.join(out_dir, "cam1", "data", f"{stamps[i]}.png"), right)
    with open(os.path.join(out_dir, "timestamps.txt"), "w") as f:
        f.write("\n".join(str(t) for t in stamps) + "\n")
    times = [t * 1e-9 for t in stamps]
    _write_groundtruth(os.path.join(out_dir, "groundtruth.txt"), poses, times)
    _write_settings(os.path.join(out_dir, "settings.yaml"), cam, H, W,
                    "stereo", n_features=1400)
    return poses, times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["tum", "kitti", "euroc"])
    ap.add_argument("out_dir")
    ap.add_argument("--frames", type=int, default=80)
    ap.add_argument("--hw", default="240x320")
    args = ap.parse_args()
    H, W = (int(x) for x in args.hw.split("x"))
    if args.kind == "tum":
        make_tum(args.out_dir, args.frames, H, W)
    elif args.kind == "euroc":
        make_euroc(args.out_dir, args.frames, H, W)
    else:
        make_kitti(args.out_dir, args.frames, H, W)
    print(f"wrote {args.kind} sequence ({args.frames} frames, {H}x{W}) "
          f"-> {args.out_dir}")


if __name__ == "__main__":
    main()
