"""Reference-scale place-recognition gate: 1000+ RENDERED keyframes through
the full front-end -> packed-tree-vocabulary -> keyframe-database chain,
with measured recall/precision (the chip-scale companion of
tests/test_vocab_rendered.py; reference granularity context: ORBvoc k=10
L=6 ~1M words at ~1300 KITTI-00 keyframes).

Run: python tools/vocab_scale_drive.py [--worlds 40] [--views 26] [--json F]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=40)
    ap.add_argument("--views", type=int, default=26)
    ap.add_argument("--json", default="VOCAB_SCALE_r03.json")
    ap.add_argument("--asset", default="", help="packed vocab npz (default: "
                    "the shipped asset)")
    args = ap.parse_args()

    from tests.test_vocab_rendered import (
        ASSET, _setup, build_rendered_db, rendered_recall,
    )
    from my_orb_slam2_tpu.utils import vocab_io
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, CapacityConfig, OrbConfig, SlamConfig, Sensor,
    )
    from my_orb_slam2_tpu.models.frame import FrameFactory

    voc = vocab_io.load_packed(args.asset or ASSET)
    H, W = 240, 320
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(fx=0.8 * W, fy=0.8 * W, cx=W / 2, cy=H / 2,
                            bf=0.0, th_depth=40.0, width=W, height=H),
        orb=OrbConfig(n_features=600),
        capacity=CapacityConfig(
            max_keyframes=args.worlds * args.views + 8, max_map_points=1024
        ),
    )
    factory = FrameFactory(cfg)
    t0 = time.time()
    db, state, kf_world = build_rendered_db(
        voc, args.worlds, args.views, factory, cfg, H, W
    )
    t_build = time.time() - t0
    n_kf = len(kf_world)
    t0 = time.time()
    recall, top1 = rendered_recall(
        voc, db, state, kf_world, args.worlds, args.views - 1.4, factory,
        cfg, H, W
    )
    t_query = time.time() - t0
    out = {
        "n_keyframes": n_kf,
        "n_worlds": args.worlds,
        "vocab": {"k": voc.k, "L": voc.depth, "n_words": int(voc.n_words)},
        "candidate_set_recall": recall,
        "top1_accuracy": top1,
        "build_s": round(t_build, 1),
        "query_s": round(t_query, 1),
        "chain": "render -> ORB front-end -> tree vocabulary -> sparse "
                 "keyframe database (no descriptor pools)",
    }
    print(json.dumps(out, indent=1))
    assert recall >= 0.8, out
    if args.json:
        json.dump(out, open(args.json, "w"), indent=1)


if __name__ == "__main__":
    main()
