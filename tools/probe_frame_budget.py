"""True DEVICE time of every per-frame / per-keyframe program at KITTI
capacity: N chained enqueues behind ONE sync (amortizes the ~27 ms tunnel
RTT that per-stage blocking probes pay per call).

This is the budget that bounds full-system fps: at ~1 keyframe/frame (open
road) the per-frame device cost is
  track + light_or_full_pass + words + db_add + detect + consistency.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_frame_budget.py
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tools.capacity_state import build_or_load
    from my_orb_slam2_tpu.models import keyframe_db as kdb
    from my_orb_slam2_tpu.models import local_mapping as lm
    from my_orb_slam2_tpu.models import loop_closing as lc
    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.models.tracking import track_frame
    from my_orb_slam2_tpu.utils.vocab_io import default_vocabulary

    cfg, state, frames, info = build_or_load()
    kf_id = jnp.int32(info["n_kf"] - 1)
    frame = frames[-1]
    vocab = default_vocabulary()
    CAP = frame.uv.shape[0]
    db = kdb.init_db(cfg.capacity.max_keyframes, CAP, vocab.n_words)
    # populate db rows for detect
    words0 = vocab.words(state.kf_desc[0])
    for k in range(int(info["n_kf"])):
        db = kdb.add_keyframe(db, jnp.int32(k), words0, state.kf_kp_valid[k])

    def chain(fn, n=6, warm=2):
        """Mean per-call ms over n back-to-back enqueues, one final block.

        Only the LAST output is kept live (state-sized outputs would
        otherwise pile up n copies in HBM).
        """
        out = None
        for _ in range(warm):
            out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(n):
            out = fn()
            del out  # free previous state copy before the next enqueue
            out = None
        last = fn()
        jax.block_until_ready(last)
        return (time.perf_counter() - t0) / (n + 1) * 1000.0

    Tcw = jnp.asarray(info["Tcw"])
    last_mp = info["last_mp"]

    # The state-updating programs DONATE their state argument: thread the
    # returned state through the chain (a box keeps the closure simple).
    box = {"s": state}

    def run_track():
        st, cur_mp, packed, T = track_frame(
            cfg, box["s"], frame, frame.uv, last_mp, frame.valid,
            frame.octave, Tcw, Tcw, True, jnp.int32(int(kf_id)), jnp.int32(3))
        box["s"] = st
        return packed

    t_track = chain(run_track)
    print(f"track_frame        {t_track:7.1f} ms")

    def run_light():
        st, n_new = lm.light_pass(cfg, box["s"], kf_id, 10)
        box["s"] = st
        return n_new

    t_light = chain(run_light)
    print(f"light_pass         {t_light:7.1f} ms")
    state = box["s"]

    t_words = chain(lambda: vocab.words(state.kf_desc[kf_id]))
    print(f"vocab.words        {t_words:7.1f} ms")

    words = vocab.words(state.kf_desc[kf_id])
    t_dbadd = chain(lambda: kdb.add_keyframe(
        db, kf_id, words, state.kf_kp_valid[kf_id]))
    print(f"db.add_keyframe    {t_dbadd:7.1f} ms")

    t_detect = chain(lambda: kdb.detect_loop_candidates(db, state, kf_id))
    print(f"detect_candidates  {t_detect:7.1f} ms")

    C = 8
    gm = jnp.zeros((C, state.kf_valid.shape[0]), bool)
    gc = jnp.zeros((C,), jnp.int32)
    ids = jnp.full((C,), -1, jnp.int32)
    t_cons = chain(lambda: lc.consistency_check(state, ids, gm, gc, 3))
    print(f"consistency_check  {t_cons:7.1f} ms")

    def run_full():
        st, culled = lm.full_pass(cfg, box["s"], kf_id)
        box["s"] = st
        return culled

    box["s"] = state
    t_full = chain(run_full, n=4)
    print(f"full_pass          {t_full:7.1f} ms")

    per_kf_light = t_light + t_words + t_dbadd + t_detect + t_cons
    print(f"-- per-frame light-KF: {t_track + per_kf_light:7.1f} ms -> "
          f"{1000.0/(t_track+per_kf_light):.1f} fps ceiling")
    amort = t_track + per_kf_light + (t_full - t_light) / 4.0
    print(f"-- per-frame amortized (full every 4th KF): {amort:7.1f} ms -> "
          f"{1000.0/amort:.1f} fps ceiling")


if __name__ == "__main__":
    main()
