"""Pre-render a descriptor-training image corpus to disk: many blob worlds
x many views (tools/render_world.py). Extraction happens separately on the
TPU (tools/make_vocab.py --corpus) so the slow CPU rendering isn't paid
inside the TPU-holding process.

Run: python tools/render_corpus.py --worlds 60 --views 16 --out /tmp/vocab_corpus.npy
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.render_world import make_world, render_frame  # noqa: E402


class _Cam:
    def __init__(self, H, W):
        self.fx = self.fy = 0.8 * W
        self.cx = W / 2.0
        self.cy = H / 2.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worlds", type=int, default=60)
    ap.add_argument("--views", type=int, default=16)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--out", default="/tmp/vocab_corpus.npy")
    args = ap.parse_args()

    H, W = args.height, args.width
    cam = _Cam(H, W)
    imgs = np.zeros((args.worlds * args.views, H, W), np.uint8)
    t0 = time.time()
    n = 0
    for w in range(args.worlds):
        world = make_world(seed=500 + w)
        for v in range(args.views):
            imgs[n] = render_frame(world, cam, H, W, view=v)
            n += 1
        if (w + 1) % 10 == 0:
            print(f"world {w + 1}/{args.worlds} ({time.time() - t0:.0f}s)",
                  flush=True)
    np.save(args.out, imgs[:n])
    print(f"saved {n} frames -> {args.out} ({imgs[:n].nbytes >> 20} MB)")


if __name__ == "__main__":
    main()
