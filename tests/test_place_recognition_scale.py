"""Place recognition at scale: hundreds of keyframes, perceptually aliased
places, a TRAINED tree vocabulary — measured recall/precision, and the
sparse word-list database's memory bound (VERDICT r1 items 9 / weak 8).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from my_orb_slam2_tpu.models import keyframe_db as kdb
from my_orb_slam2_tpu.models import map_state as ms
from my_orb_slam2_tpu.ops import bow as bow_ops
from my_orb_slam2_tpu.utils.config import CameraConfig, CapacityConfig, SlamConfig, Sensor

N_PLACES = 32
DESC_PER_PLACE = 120
KP_PER_FRAME = 128
KF_PER_PLACE = 8


def _make_places(rng):
    """Distinct descriptor pools; every 4th place is an ALIAS of the
    previous one (50% shared descriptors) — the perceptual-aliasing case."""
    pools = []
    for p in range(N_PLACES):
        d = rng.integers(0, 2 ** 32, size=(DESC_PER_PLACE, 8), dtype=np.uint32)
        if p % 4 == 3 and p > 0:
            half = DESC_PER_PLACE // 2
            d[:half] = pools[p - 1][:half]
        pools.append(d)
    return pools


def _sample_frame(rng, pool, noise_bits=3):
    idx = rng.choice(len(pool), size=KP_PER_FRAME, replace=True)
    d = pool[idx].copy()
    for _ in range(noise_bits):
        word = rng.integers(0, 8, KP_PER_FRAME)
        bit = rng.integers(0, 32, KP_PER_FRAME).astype(np.uint32)
        d[np.arange(KP_PER_FRAME), word] ^= np.uint32(1) << bit
    return d


def _build_db(vocab, pools, rng, KF_cap):
    cfg = SlamConfig(
        sensor=Sensor.STEREO,
        camera=CameraConfig(),
        capacity=CapacityConfig(max_keyframes=KF_cap, max_map_points=1024),
    )
    state = ms.init_map_state(cfg, KP_PER_FRAME)
    db = kdb.init_db(KF_cap, KP_PER_FRAME, vocab.n_words)
    kf_place = []
    covis = np.zeros((KF_cap, KF_cap), np.int32)
    k = 0
    for p in range(N_PLACES):
        for _ in range(KF_PER_PLACE):
            d = _sample_frame(rng, pools[p])
            words = vocab.words(jnp.asarray(d))
            db = kdb.add_keyframe(
                db, jnp.int32(k), words, jnp.ones(KP_PER_FRAME, bool)
            )
            # temporal covisibility within the same place visit
            for k2 in range(max(0, k - 3), k):
                if kf_place and kf_place[k2] == p:
                    covis[k, k2] = covis[k2, k] = 60
            kf_place.append(p)
            k += 1
    state = state._replace(
        covis=jnp.asarray(covis),
        kf_valid=jnp.zeros(KF_cap, bool).at[:k].set(True),
    )
    return db, state, kf_place, k


def _recall_precision(vocab, pools, seed=3):
    rng = np.random.default_rng(seed)
    KF_cap = N_PLACES * KF_PER_PLACE
    db, state, kf_place, n_kf = _build_db(vocab, pools, rng, KF_cap)
    hits = 0
    total = 0
    wrong_accepts = 0
    for p in range(N_PLACES):
        d = _sample_frame(rng, pools[p])
        words = vocab.words(jnp.asarray(d))
        ids, scores = kdb.detect_reloc_candidates(
            db, state, words, jnp.ones(KP_PER_FRAME, bool)
        )
        ids = np.asarray(ids)
        total += 1
        top = int(ids[0]) if ids[0] >= 0 else -1
        if top < 0:
            continue
        top_place = kf_place[top]
        aliases = {p}
        if p % 4 == 3:
            aliases.add(p - 1)
        if (p + 1) % 4 == 3 and p + 1 < N_PLACES:
            aliases.add(p + 1)
        if top_place == p:
            hits += 1
        elif top_place not in aliases:
            wrong_accepts += 1
    recall = hits / total
    precision = hits / max(hits + wrong_accepts, 1)
    return recall, precision


@pytest.mark.slow
def test_trained_tree_vocab_recall_at_scale():
    rng = np.random.default_rng(0)
    pools = _make_places(rng)
    # Train the hierarchical k-medians tree from a held-out corpus sampled
    # off the same descriptor distribution (reference ORBvoc is trained
    # offline from Bovisa/KITTI descriptors the same way).
    corpus = np.concatenate(
        [_sample_frame(rng, pools[p]) for p in range(N_PLACES) for _ in range(3)]
    )
    voc = bow_ops.train_tree_vocabulary(corpus, k=8, depth=3, iters=5, seed=1)
    assert voc.n_words >= 256
    recall, precision = _recall_precision(voc, pools)
    # 256 keyframes, 32 places, 25% aliased: the trained vocabulary must
    # place the true (or aliased-twin) place first nearly always.
    assert recall >= 0.8, (recall, precision)
    assert precision >= 0.9, (recall, precision)


@pytest.mark.slow
def test_lsh_vocab_recall_at_scale():
    rng = np.random.default_rng(0)
    pools = _make_places(rng)
    voc = bow_ops.LshVocabulary(n_bits=16)
    recall, precision = _recall_precision(voc, pools)
    assert recall >= 0.8, (recall, precision)


def test_dense_db_memory_bound_at_capacity():
    """The dense u8 count matrix must stay small at KITTI capacity with
    the engine's vocabulary sizes (10k packed tree / 16k LSH fallback).
    Dense u8 replaced the sparse word lists: similar memory at these
    vocabulary sizes, but scoring is pure dense math instead of two
    ~3M-row gathers per query (~75 ms -> a few ms on the target chip)."""
    db = kdb.init_db(1536, 2048, 1 << 14)
    total = sum(np.asarray(x).nbytes for x in db)
    assert total < 32 * 1024 * 1024, f"{total/1e6:.1f} MB"
