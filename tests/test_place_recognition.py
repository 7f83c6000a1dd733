"""Tests: vocabulary, keyframe database, Sim3 optimization, pose graph."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.ops import bow as bow_ops
from my_orb_slam2_tpu.ops import lie, sim3_opt, pose_graph


def rand_desc(rng, n):
    return rng.integers(0, 2 ** 32, size=(n, 8), dtype=np.uint32)


def flip_bits(rng, desc, k):
    d = desc.copy()
    for _ in range(k):
        w = rng.integers(0, 8, len(d))
        b = rng.integers(0, 32, len(d)).astype(np.uint32)
        d[np.arange(len(d)), w] ^= np.uint32(1) << b
    return d


def test_lsh_vocabulary_stability(rng):
    voc = bow_ops.LshVocabulary(n_bits=16)
    d = rand_desc(rng, 500)
    w1 = np.asarray(voc.words(jnp.asarray(d)))
    # a few flipped bits rarely change the word
    d2 = flip_bits(rng, d, 2)
    w2 = np.asarray(voc.words(jnp.asarray(d2)))
    same = (w1 == w2).mean()
    assert same > 0.8, same
    # distinct descriptors spread over many words
    assert len(np.unique(w1)) > 400


def test_tree_vocabulary_roundtrip(rng):
    corpus = rand_desc(rng, 2000)
    voc = bow_ops.train_tree_vocabulary(corpus, k=4, depth=3, iters=4)
    w = np.asarray(voc.words(jnp.asarray(corpus[:200])))
    assert w.min() >= 0 and w.max() < voc.n_words
    assert len(np.unique(w)) > 10
    # stability: same descriptor -> same word
    w2 = np.asarray(voc.words(jnp.asarray(corpus[:200])))
    np.testing.assert_array_equal(w, w2)


def test_keyframe_db_query(rng):
    """Frames seeing the same landmarks should score far above unrelated."""
    from my_orb_slam2_tpu.models import keyframe_db as kdb
    from my_orb_slam2_tpu.models import map_state as ms
    from my_orb_slam2_tpu.utils.config import SlamConfig, CapacityConfig

    cfg = SlamConfig(capacity=CapacityConfig(max_keyframes=16, max_map_points=1024))
    state = ms.init_map_state(cfg, 256)
    voc = bow_ops.LshVocabulary(n_bits=16)
    db = kdb.init_db(16, 256, voc.n_words)

    landmarks = rand_desc(rng, 600)
    def frame_from(ids, noise=2):
        d = flip_bits(rng, landmarks[ids], noise)
        valid = np.ones(256, bool)
        return jnp.asarray(d), jnp.asarray(valid)

    # KF 0-3: scene A (landmarks 0:256); KF 4-7: scene B (300:556)
    for k in range(4):
        d, v = frame_from(np.arange(256))
        db = kdb.add_keyframe(db, jnp.int32(k), voc.words(d), v)
    for k in range(4, 8):
        d, v = frame_from(np.arange(300, 556))
        db = kdb.add_keyframe(db, jnp.int32(k), voc.words(d), v)
    state = state._replace(kf_valid=state.kf_valid.at[:8].set(True), n_kf=jnp.int32(8))

    # Query with a new scene-A frame.
    d, v = frame_from(np.arange(256))
    ids, scores = kdb.detect_reloc_candidates(db, state, voc.words(d), v)
    ids = np.asarray(ids)
    top = [i for i in ids if i >= 0][:3]
    assert all(t < 4 for t in top), f"top candidates {ids}"


def test_optimize_sim3_converges(rng):
    n = 100
    p2 = np.stack([rng.uniform(-2, 2, n), rng.uniform(-2, 2, n), rng.uniform(4, 9, n)], 1)
    phi = rng.normal(size=3) * 0.2
    R = np.asarray(lie.so3_exp(jnp.asarray(phi)))
    s, t = 1.25, np.array([0.4, -0.1, 0.3])
    p1 = s * p2 @ R.T + t
    fx = fy = 500.0; cx, cy = 320.0, 240.0
    uv1 = np.stack([fx * p1[:, 0] / p1[:, 2] + cx, fy * p1[:, 1] / p1[:, 2] + cy], 1)
    uv2 = np.stack([fx * p2[:, 0] / p2[:, 2] + cx, fy * p2[:, 1] / p2[:, 2] + cy], 1)
    uv1 += rng.normal(size=uv1.shape) * 0.3
    uv2 += rng.normal(size=uv2.shape) * 0.3
    # perturbed start
    S0 = lie.sim3_from_Rts(
        jnp.asarray(R @ np.asarray(lie.so3_exp(jnp.asarray(rng.normal(size=3) * 0.05)))),
        jnp.asarray(t + rng.normal(size=3) * 0.1),
        s * 1.1,
    )
    out = sim3_opt.optimize_sim3(
        S0, jnp.asarray(p1), jnp.asarray(p2), jnp.asarray(uv1), jnp.asarray(uv2),
        jnp.ones(n), jnp.ones(n), jnp.ones(n, bool), fx, fy, cx, cy,
    )
    S = np.asarray(out["S12"])
    s_est = float(lie.sim3_scale(jnp.asarray(S)))
    np.testing.assert_allclose(s_est, s, rtol=0.02)
    R_est = S[:3, :3] / s_est
    ang = np.degrees(np.arccos(np.clip((np.trace(R_est @ R.T) - 1) / 2, -1, 1)))
    assert ang < 0.5, ang
    assert int(out["n_inliers"]) > 90


def test_pose_graph_closes_loop(rng):
    """A drifted loop trajectory should snap closed after pose-graph opt."""
    KF = 24
    # Ground truth: square loop in x-z plane.
    gt = []
    T = np.eye(4)
    step = np.asarray(lie.se3_exp(jnp.asarray([0.0, 0.0, 0.5, 0.0, 2 * np.pi / KF, 0.0])))
    for k in range(KF):
        gt.append(np.linalg.inv(T))
        T = T @ np.linalg.inv(step)  # world pose advances
    gt = np.stack(gt)  # Tcw
    # Odometry with drift: small per-step error.
    est = [gt[0]]
    for k in range(1, KF):
        rel = gt[k] @ np.linalg.inv(gt[k - 1])
        noise = np.asarray(lie.se3_exp(jnp.asarray(rng.normal(size=6) * 0.01)))
        est.append(rel @ noise @ est[k - 1])
    est = np.stack(est)
    drift = np.linalg.norm((est[-1] @ np.linalg.inv(gt[-1]))[:3, 3])

    # Vertices as Sim3 (scale 1).
    S = jnp.asarray(est)
    # Edges: consecutive odometry + one loop edge (KF-1 -> 0) with the TRUE
    # relative measurement.
    ei = list(range(KF - 1)) + [KF - 1]
    ej = list(range(1, KF)) + [0]
    meas = []
    for a, b in zip(ei, ej):
        if b == (a + 1) % KF and b != 0:
            Sji = est[b] @ np.linalg.inv(est[a])  # keep odometry consistent
        else:
            Sji = gt[b] @ np.linalg.inv(gt[a])  # loop closure measurement
        meas.append(Sji)
    out = pose_graph.optimize_pose_graph(
        S,
        jnp.ones(KF, bool),
        jnp.zeros(KF, bool).at[0].set(True),
        jnp.asarray(ei, jnp.int32),
        jnp.asarray(ej, jnp.int32),
        jnp.asarray(np.stack(meas)),
        jnp.ones(len(ei), bool),
        n_iters=25,
        fix_scale=True,
    )
    out = np.asarray(out)
    # Loop closure error after optimization
    e_after = np.linalg.norm(
        np.asarray(lie.sim3_log(jnp.asarray(
            (gt[0] @ np.linalg.inv(gt[KF-1])) @ out[KF-1] @ np.linalg.inv(out[0])
        )))
    )
    e_before = np.linalg.norm(
        np.asarray(lie.sim3_log(jnp.asarray(
            (gt[0] @ np.linalg.inv(gt[KF-1])) @ est[KF-1] @ np.linalg.inv(est[0])
        )))
    )
    assert e_after < 0.3 * e_before, (e_before, e_after, drift)


def test_vocab_text_io(tmp_path, rng):
    """DBoW2-format text vocabulary round trip: a tiny k=2, L=2 tree."""
    from my_orb_slam2_tpu.utils import vocab_io
    import jax.numpy as jnp

    lines = ["2 2 0 0"]
    # A properly clustered tree: leaves under node 1 are near its center,
    # leaves under node 2 near that center (tree descent requires internal
    # centers to represent their subtree, as real k-means training gives).
    A = rand_desc(rng, 1)[0]
    B = rand_desc(rng, 1)[0]
    descs = np.stack([
        A, B,
        A, flip_bits(rng, A[None], 3)[0],
        B, flip_bits(rng, B[None], 3)[0],
    ])
    byte_view = descs.view(np.uint8).reshape(6, 32)
    # nodes 1,2 children of root; nodes 3,4 children of 1; 5,6 children of 2
    parents = [0, 0, 1, 1, 2, 2]
    for i, p in enumerate(parents):
        d = " ".join(str(int(b)) for b in byte_view[i])
        lines.append(f"{p} 0 {d} 1.0")
    path = tmp_path / "voc.txt"
    path.write_text("\n".join(lines))
    voc = vocab_io.load_dbow2_text(str(path))
    assert voc.k == 2 and voc.depth == 2
    assert voc.n_words == 4  # 4 leaves
    # Descend: a leaf's own descriptor must map to itself (distance 0).
    w = np.asarray(voc.words(jnp.asarray(descs[2:6])))
    assert len(np.unique(w)) == 4, w
    # packed round trip
    p2 = tmp_path / "voc.npz"
    vocab_io.save_packed(voc, str(p2))
    voc2 = vocab_io.load_packed(str(p2))
    w2 = np.asarray(voc2.words(jnp.asarray(descs[2:6])))
    np.testing.assert_array_equal(w, w2)
