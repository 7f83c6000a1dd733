"""db.add_keyframe and vocab.words cost experiments at capacity shapes.

Run: PYTHONPATH=/root/repo:$PYTHONPATH python tools/probe_db_vocab.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")


def main():
    import jax
    import jax.numpy as jnp

    from tools.capacity_state import build_or_load
    from my_orb_slam2_tpu.models import keyframe_db as kdb
    from my_orb_slam2_tpu.utils.vocab_io import default_vocabulary

    cfg, state, frames, info = build_or_load()
    vocab = default_vocabulary()
    CAP = state.kf_desc.shape[1]
    db = kdb.init_db(cfg.capacity.max_keyframes, CAP, vocab.n_words)
    desc = state.kf_desc[0]
    valid = state.kf_kp_valid[0]
    words = vocab.words(desc)
    kf_id = jnp.int32(3)
    jax.block_until_ready(words)

    def timeit(fn, *args, reps=8, warm=3):
        out = None
        for _ in range(warm):
            out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps * 1000.0

    add = jax.jit(kdb.add_keyframe)
    print(f"add (no donate)      {timeit(add, db, kf_id, words, valid):7.2f} ms")

    add_d = jax.jit(kdb.add_keyframe, donate_argnums=(0,))
    def run_donated():
        d2 = add_d(jax.tree.map(lambda x: x.copy(), db), kf_id, words, valid)
        return d2.kf_l1
    print(f"add (donated+copy)   {timeit(run_donated):7.2f} ms")

    # scatter alone
    n_words = db.df.shape[0]
    ok = valid & (words >= 0)

    @jax.jit
    def scat(words, ok):
        return jnp.zeros((n_words + 1,), jnp.int32).at[
            jnp.where(ok, words, n_words)
        ].add(1)

    print(f"  word-count scatter {timeit(scat, words, ok):7.2f} ms")

    @jax.jit
    def rowset(db, row):
        return db.kf_bow.at[kf_id].set(row)

    row = jnp.minimum(scat(words, ok)[:n_words], 255).astype(jnp.uint8)
    print(f"  kf_bow row set     {timeit(rowset, db, row):7.2f} ms")

    # vocab words: current
    print(f"words (tree gather)  {timeit(vocab.words, desc):7.2f} ms")

    # one-hot matmul descent
    import numpy as np

    centers = np.asarray(vocab.centers)  # (n_nodes, 8) u32
    children = np.asarray(vocab.children)  # (n_nodes, k) i32
    k, depth = vocab.k, vocab.depth
    # per level: nodes and their children-center pm1 matrices
    level_nodes = [np.array([0])]
    for _ in range(depth):
        nxt = children[level_nodes[-1]].reshape(-1)
        level_nodes.append(nxt[nxt >= 0])
    # bits of a node's children centers, level l: (n_l, k*256) pm1
    def unpack(c):  # (M, 8) u32 -> (M, 256) pm1 f32
        bits = ((c[:, :, None] >> np.arange(32, dtype=np.uint32)[None, None, :]) & 1)
        return (bits.reshape(c.shape[0], 256) * 2.0 - 1.0).astype(np.float32)

    mats = []
    for l in range(depth):
        nodes = level_nodes[l]
        ch = children[nodes]  # (n_l, k)
        cc = centers[np.maximum(ch, 0).reshape(-1)]  # (n_l*k, 8)
        pm = unpack(cc).reshape(len(nodes), k * 256)
        mats.append(jnp.asarray(pm))
        # local index of each node within its level
    node_local = []  # map global node id -> position in level
    for l in range(depth + 1):
        m = np.full(centers.shape[0], -1, np.int64)
        m[level_nodes[l]] = np.arange(len(level_nodes[l]))
        node_local.append(jnp.asarray(m.astype(np.int32)))
    ch_j = jnp.asarray(children)
    leaf_word = vocab.leaf_word

    @jax.jit
    def words_mxu(desc):
        N = desc.shape[0]
        bits = ((desc[:, :, None] >> jnp.arange(32, dtype=jnp.uint32)[None, None, :]) & 1)
        x = (bits.reshape(N, 256).astype(jnp.float32) * 2.0 - 1.0)  # (N, 256)
        node = jnp.zeros((N,), jnp.int32)
        for l in range(depth):
            loc = jnp.take(node_local[l], node)  # (N,)
            oh = jax.nn.one_hot(loc, mats[l].shape[0], dtype=jnp.float32)
            csel = oh @ mats[l]  # (N, k*256)
            # dot(x, child c) = sum over bits: higher = closer (pm1)
            sc = jnp.einsum("nb,nkb->nk", x, csel.reshape(N, k, 256))
            chn = jnp.take(ch_j, node, axis=0)  # (N, k)
            sc = jnp.where(chn >= 0, sc, -jnp.inf)
            best = jnp.argmax(sc, axis=1)
            nxt = jnp.take_along_axis(chn, best[:, None], axis=1)[:, 0]
            node = jnp.where(nxt >= 0, nxt, node)
        return jnp.take(leaf_word, node)

    w2 = words_mxu(desc)
    agree = float(jnp.mean((w2 == words).astype(jnp.float32)))
    print(f"words (MXU descent)  {timeit(words_mxu, desc):7.2f} ms  agree={agree:.4f}")


if __name__ == "__main__":
    main()
