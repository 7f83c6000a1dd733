"""Dataset driver: the analog of the reference's six example mains
(Examples/Monocular/mono_tum, mono_kitti, Examples/Stereo/stereo_kitti,
stereo_euroc, Examples/RGB-D/rgbd_tum).

Usage:
  python examples/run_dataset.py tum-rgbd  SEQ_DIR SETTINGS.yaml [--assoc F]
  python examples/run_dataset.py tum-mono  SEQ_DIR SETTINGS.yaml
  python examples/run_dataset.py kitti     SEQ_DIR SETTINGS.yaml
  python examples/run_dataset.py euroc     CAM0 CAM1 STAMPS SETTINGS.yaml

Outputs CameraTrajectory.txt (+ KeyFrameTrajectory.txt) in the cwd and
prints median/mean per-frame tracking time, like the reference mains
(Examples/Monocular/mono_tum.cc:97-126).
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from my_orb_slam2_tpu.models.system import SlamSystem
from my_orb_slam2_tpu.utils.config import Sensor, load_yaml_settings
from my_orb_slam2_tpu.utils import datasets


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("kind", choices=["tum-rgbd", "tum-mono", "kitti", "euroc"])
    ap.add_argument("paths", nargs="+")
    ap.add_argument("--assoc", default=None)
    ap.add_argument("--max-frames", type=int, default=0)
    ap.add_argument("--realtime", action="store_true", help="pace input at dataset fps")
    ap.add_argument("--pipeline", type=int, default=3,
                    help="tracking pipeline depth (0 = synchronous)")
    ap.add_argument("--viz", default=None, metavar="DIR",
                    help="dump annotated frames + top-down map PNGs here "
                         "(the headless Viewer/FrameDrawer/MapDrawer analog)")
    ap.add_argument("--viz-every", type=int, default=10)
    ap.add_argument("--live", default=None, metavar="DIR",
                    help="LIVE viewer loop (reference Viewer::Run analog, "
                         "src/Viewer.cc:68-166, GL-free): continuously "
                         "overwrite DIR/live_frame.png + DIR/live_map.png "
                         "(follow-camera 3D render centered on the current "
                         "pose) every --viz-every frames, and poll "
                         "DIR/control for commands — 'localization' / "
                         "'slam' (the menuLocalizationMode toggle), "
                         "'reset' (menuReset), 'follow' / 'free' camera")
    args = ap.parse_args()

    if args.kind == "tum-rgbd":
        seq, settings = args.paths
        cfg = load_yaml_settings(settings, Sensor.RGBD)
        ds = datasets.TumRgbdDataset(seq, args.assoc)
    elif args.kind == "tum-mono":
        seq, settings = args.paths
        cfg = load_yaml_settings(settings, Sensor.MONOCULAR)
        ds = datasets.TumMonoDataset(seq)
    elif args.kind == "kitti":
        seq, settings = args.paths
        cfg = load_yaml_settings(settings, Sensor.STEREO)
        ds = datasets.KittiStereoDataset(seq)
    else:
        cam0, cam1, stamps, settings = args.paths
        cfg = load_yaml_settings(settings, Sensor.STEREO)
        ds = datasets.EurocStereoDataset(cam0, cam1, stamps)

    system = SlamSystem(cfg, pipeline_depth=args.pipeline)
    live = None
    if args.live:
        from my_orb_slam2_tpu.utils.viz import LiveViewer

        live = LiveViewer(args.live)
    times = []
    last_t = None
    for i, frame in enumerate(ds.frames()):
        if args.max_frames and i >= args.max_frames:
            break
        if live is not None:
            for cmd in live.poll_commands(system):
                print(f"live viewer command: {cmd}", flush=True)
        t0 = time.perf_counter()
        if args.kind == "tum-rgbd":
            rgb, depth, ts = frame
            info = system.track_rgbd(rgb, depth, ts)
        elif args.kind == "tum-mono":
            img, ts = frame
            info = system.track_mono(img, ts)
        else:
            l, r, ts = frame
            info = system.track_stereo(l, r, ts)
        dt = time.perf_counter() - t0
        times.append(dt)
        if args.realtime and last_t is not None and ts - last_t > dt:
            time.sleep(ts - last_t - dt)
        last_t = ts
        if i % 50 == 0:
            print(f"frame {i}: state={info['state']} "
                  f"inliers={info.get('localmap_inliers', '-')} {dt*1000:.0f}ms",
                  flush=True)
        if live is not None and i % args.viz_every == 0:
            live.update(system, frame[0], info, i)
        if args.viz and i % args.viz_every == 0:
            import os

            from my_orb_slam2_tpu.utils import viz

            os.makedirs(args.viz, exist_ok=True)
            tr = system.tracker
            gray = frame[0] if args.kind != "tum-mono" else frame[0]
            img = np.asarray(gray)
            if img.ndim == 3:
                img = img.mean(axis=-1).astype(np.uint8)
            fr = tr.last_frame
            if fr is not None:
                cur = np.asarray(tr.last_mp)
                canvas = viz.draw_frame(
                    img, np.asarray(fr.uv), cur >= 0, np.asarray(fr.valid),
                    state_text=f"frame {i} state={info['state']}",
                )
                viz.save_png(os.path.join(args.viz, f"frame_{i:06d}.png"), canvas)
            m = tr.map
            topdown = viz.render_map_topdown(
                np.asarray(m.mp_pos), np.asarray(m.mp_valid),
                np.asarray(m.kf_Tcw), np.asarray(m.kf_valid),
            )
            viz.save_png(os.path.join(args.viz, f"map_{i:06d}.png"), topdown)
            three_d = viz.render_map_3d(
                np.asarray(m.mp_pos), np.asarray(m.mp_valid),
                np.asarray(m.kf_Tcw), np.asarray(m.kf_valid),
                covis=np.asarray(m.covis), kf_parent=np.asarray(m.kf_parent),
                loop_edges=np.asarray(m.loop_edges),
                cur_Tcw=info.get("Tcw"),
            )
            viz.save_png(os.path.join(args.viz, f"map3d_{i:06d}.png"), three_d)

    system.shutdown()
    system.save_trajectory_tum("CameraTrajectory.txt")
    system.save_keyframe_trajectory_tum("KeyFrameTrajectory.txt")
    if args.kind == "kitti":
        system.save_trajectory_kitti("CameraTrajectoryKITTI.txt")
    t = np.asarray(times[4:])
    print(f"median tracking time: {np.median(t)*1000:.1f} ms")
    print(f"mean tracking time:   {np.mean(t)*1000:.1f} ms")


if __name__ == "__main__":
    main()
