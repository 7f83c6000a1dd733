"""Train and pack the engine's default vocabulary asset.

The reference ships a ~1M-word k=10/L=6 DBoW2 tree (ORBvoc.txt, loaded at
startup — reference src/System.cc:64-72; stripped from this mount). This
tool trains the in-repo counterpart at k=10/L=4 (10,000 words) from ORB
descriptors extracted by OUR front-end from RENDERED images of procedurally
generated blob worlds (front-end -> descriptor chain, not synthetic
descriptor pools), then writes:

  my_orb_slam2_tpu/assets/orbvoc_k10_L4.npz   (packed; SlamSystem default)

Run: python tools/make_vocab.py [--frames 96] [--k 10] [--depth 4]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.render_world import render_frame, make_world  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=96)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--iters", type=int, default=6)
    ap.add_argument("--corpus", default="", help="pre-rendered image stack "
                    "(.npy from tools/render_corpus.py); extraction still "
                    "runs through OUR front-end on the device")
    ap.add_argument("--out", default="")
    args = ap.parse_args()

    import jax.numpy as jnp

    from my_orb_slam2_tpu.models.frame import FrameFactory
    from my_orb_slam2_tpu.ops.bow import train_tree_vocabulary
    from my_orb_slam2_tpu.utils.config import (
        CameraConfig, OrbConfig, SlamConfig, Sensor,
    )
    from my_orb_slam2_tpu.utils import vocab_io

    H, W = 480, 640
    cfg = SlamConfig(
        sensor=Sensor.MONOCULAR,
        camera=CameraConfig(fx=500.0, fy=500.0, cx=320.0, cy=240.0, bf=0.0,
                            th_depth=40.0, width=W, height=H),
        orb=OrbConfig(n_features=1000),
    )
    factory = FrameFactory(cfg)

    descs = []
    t0 = time.time()
    if args.corpus:
        imgs = np.load(args.corpus, mmap_mode="r")
        n_imgs = imgs.shape[0]
        for i in range(n_imgs):
            frame = factory.build_mono(np.asarray(imgs[i]))
            d = np.asarray(frame.desc)[np.asarray(frame.valid)]
            descs.append(d)
            if (i + 1) % 200 == 0:
                print(f"  extracted {i + 1}/{n_imgs} ({time.time()-t0:.0f}s)",
                      flush=True)
        src = f"{n_imgs} pre-rendered frames ({args.corpus})"
    else:
        n_worlds = max(args.frames // 12, 1)
        for w in range(n_worlds):
            world = make_world(seed=100 + w)
            for i in range(min(12, args.frames - w * 12)):
                img = render_frame(world, cfg.camera, H, W, view=i)
                frame = factory.build_mono(img)
                d = np.asarray(frame.desc)[np.asarray(frame.valid)]
                descs.append(d)
        src = f"{args.frames} rendered frames across {n_worlds} worlds"
    corpus = np.concatenate(descs, axis=0)
    print(f"corpus: {corpus.shape[0]} descriptors from {src} "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    voc = train_tree_vocabulary(
        corpus, k=args.k, depth=args.depth, iters=args.iters, seed=0
    )
    print(f"trained k={args.k} L={args.depth} -> {voc.n_words} words "
          f"({time.time()-t0:.1f}s)")

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "my_orb_slam2_tpu", "assets",
        f"orbvoc_k{args.k}_L{args.depth}.npz",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)
    vocab_io.save_packed(voc, out)
    print(f"packed -> {out} ({os.path.getsize(out)/1024:.0f} KB)")

    # sanity: word spread over a held-out render
    world = make_world(seed=999)
    img = render_frame(world, cfg.camera, H, W, view=0)
    frame = factory.build_mono(img)
    words = np.asarray(voc.words(frame.desc))[np.asarray(frame.valid)]
    print(f"held-out frame: {len(np.unique(words))} distinct words / "
          f"{len(words)} keypoints")


if __name__ == "__main__":
    main()
