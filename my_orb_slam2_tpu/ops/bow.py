"""Bag-of-visual-words place recognition ops (the DBoW2 replacement).

The reference vendors DBoW2 (Thirdparty/DBoW2): a hierarchical k-means tree
(ORBvoc: k=10, L=6, ~1M words) built offline from ORB descriptors, used for
(a) TF-IDF L1 relocalization/loop scoring via an inverted file and (b) a
"direct index" that buckets keypoints by tree node to prune matching (the
latter deliberately has no equivalent here — see ops/matching.search_brute:
candidate COMPACTION plays that role on TPU).

TPU-native redesign:

- A `Vocabulary` maps packed descriptors -> word ids with pure array ops.
  Two implementations:
    * `LshVocabulary` (fallback): word id = a fixed random subset of
      descriptor bits (2^bits words); zero training, one gather + bit math.
    * `TreeVocabulary`: a k-ary tree of binary centers descended by Hamming
      argmin — the DBoW2 structure. Can be trained on-TPU with batched
      k-medians (`train_tree_vocabulary`) from any descriptor corpus, or
      packed from an ORBvoc-format text file (utils/vocab_io.py).
- BoW "vectors" are kept dense per keyframe ((KF, n_words) counts in a
  compact dtype): scoring a query against ALL keyframes is a column gather
  + min-intersection reduction — the inverted file's work without pointer
  chasing (reference KeyFrameDatabase inverted file,
  src/KeyFrameDatabase.cc:33-67).
- TF-IDF uses a running document-frequency table (the reference bakes idf
  weights at vocabulary training time; a running df is the equivalent for
  procedurally built vocabularies).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class LshVocabulary:
    """Word id = concatenation of `n_bits` fixed random descriptor bits."""

    def __init__(self, n_bits: int = 16, seed: int = 123):
        assert n_bits <= 24
        self.n_bits = n_bits
        self.n_words = 1 << n_bits
        rng = np.random.default_rng(seed)
        bit_idx = rng.choice(256, size=n_bits, replace=False)
        self.word_word = jnp.asarray(bit_idx // 32, jnp.int32)  # u32 word index
        self.word_bit = jnp.asarray(bit_idx % 32, jnp.uint32)

    def words(self, desc: jnp.ndarray) -> jnp.ndarray:
        """(N, 8) u32 packed descriptors -> (N,) int32 word ids."""
        return _lsh_words(desc, self.word_word, self.word_bit, self.n_bits)



class TreeVocabulary:
    """k-ary Hamming tree: descend by argmin distance to node centers.

    Packed arrays: centers (n_nodes, 8) u32; children (n_nodes, k) i32
    (-1 = none); leaf word id = position among leaves.
    """

    def __init__(self, centers, children, leaf_word, k: int, depth: int, node_level=None):
        self.centers = jnp.asarray(centers)
        self.children = jnp.asarray(children)
        self.leaf_word = jnp.asarray(leaf_word)
        self.k = k
        self.depth = depth
        self.n_words = int(jnp.max(self.leaf_word)) + 1

    def words(self, desc: jnp.ndarray) -> jnp.ndarray:
        return _tree_words(
            desc, self.centers, self.children, self.leaf_word, self.depth
        )



@functools.partial(jax.jit, static_argnames=("n_bits",))
def _lsh_words(desc, word_word, word_bit, n_bits: int):
    sel = desc[:, word_word]  # (N, n_bits)
    bits = (sel >> word_bit[None, :]) & jnp.uint32(1)
    weights = (jnp.uint32(1) << jnp.arange(n_bits, dtype=jnp.uint32))[None, :]
    return jnp.sum(bits * weights, axis=1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("depth",))
def _tree_words(desc, centers, children, leaf_word, depth: int):
    """Batched tree descent, JITTED: the eager per-level gathers cost
    ~190 ms per 2048-descriptor call through the tunnel; one dispatch
    brings it to a few ms."""
    node = jnp.zeros((desc.shape[0],), jnp.int32)
    for _ in range(depth):
        ch = children[node]  # (N, k)
        cent = centers[ch]  # (N, k, 8)
        x = jnp.bitwise_xor(desc[:, None, :], cent)
        d = jnp.sum(jax.lax.population_count(x), axis=-1)
        d = jnp.where(ch >= 0, d, jnp.iinfo(jnp.int32).max)
        best = jnp.argmin(d, axis=1)
        nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
        node = jnp.where(nxt >= 0, nxt, node)  # stay if leaf
    return jnp.take(leaf_word, node)


def train_tree_vocabulary(desc_corpus: np.ndarray, k: int = 8, depth: int = 3,
                          iters: int = 8, seed: int = 0) -> TreeVocabulary:
    """On-device hierarchical k-medians over packed binary descriptors.

    Replaces DBoW2's offline k-means training (the k=10/L=6 ORBvoc tree,
    reference Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338): distances
    are Hamming (XOR+popcount), centers are bitwise majorities of their
    cluster — the binary-descriptor analog of the mean.

    LEVEL-BATCHED: every node of a level trains simultaneously as one
    segmented k-medians over the whole corpus — each iteration is a single
    (N, k) distance + segmented bit-majority, so a k=10/L=4 (10k-word) tree
    is `depth * iters` device steps instead of one k-medians per node
    (1111 sequential solves).
    """
    rng = np.random.default_rng(seed)
    desc = jnp.asarray(desc_corpus, jnp.uint32)
    N = desc.shape[0]
    bits = jnp.unpackbits(
        jax.lax.bitcast_convert_type(desc, jnp.uint8).reshape(N, 32), axis=1
    ).astype(jnp.float32)  # (N, 256)

    # desc/bits are ARGUMENTS, not closure captures: captured arrays embed
    # as constants in the serialized HLO, and a 1M-descriptor corpus (1+ GB
    # of unpacked bits) exceeds the remote-compile transport's request
    # limit (HTTP 413) besides bloating every recompile.
    @functools.partial(jax.jit, static_argnames=("n_groups",))
    def kmedians_level(desc, bits, group, centers, n_groups):
        """One k-medians iteration for all groups at once.

        group: (N,) i32 group id of each descriptor (node at this level).
        centers: (n_groups, k, 8) u32.
        Returns (assign (N,) subcluster id, new centers)."""
        cent_g = centers[group]  # (N, k, 8)
        x = jnp.bitwise_xor(desc[:, None, :], cent_g)
        d = jnp.sum(jax.lax.population_count(x), axis=-1)  # (N, k)
        assign = jnp.argmin(d, axis=1).astype(jnp.int32)
        flat = group * k + assign  # (N,) in [0, n_groups*k)
        sums = jnp.zeros((n_groups * k, 256), jnp.float32).at[flat].add(bits)
        cnt = jnp.zeros((n_groups * k,), jnp.float32).at[flat].add(1.0)
        maj = (sums * 2 > cnt[:, None]).astype(jnp.uint8)
        packed = jnp.packbits(maj, axis=1)  # (n_groups*k, 32) u8
        new_centers = jax.lax.bitcast_convert_type(
            packed.reshape(n_groups * k, 8, 4), jnp.uint32
        ).reshape(n_groups, k, 8)
        # Keep the old center when a subcluster is empty (avoids collapse).
        empty = (cnt.reshape(n_groups, k) == 0)
        new_centers = jnp.where(empty[:, :, None], centers, new_centers)
        return assign, new_centers

    group = np.zeros(N, np.int32)  # node id of each descriptor at this level
    level_centers = []  # list of (n_groups, k, 8) per level
    assign = None
    n_groups = 1
    for level in range(depth):
        # init: random descriptors from each group (host-side, cheap)
        init = np.zeros((n_groups, k, 8), np.uint32)
        desc_np = np.asarray(desc)
        order = np.argsort(group, kind="stable")
        bounds = np.searchsorted(group[order], np.arange(n_groups + 1))
        for g in range(n_groups):
            members = order[bounds[g]:bounds[g + 1]]
            if len(members) == 0:
                init[g] = rng.integers(0, 2 ** 32, (k, 8), dtype=np.uint32)
            else:
                pick = rng.choice(members, size=k, replace=len(members) < k)
                init[g] = desc_np[pick]
        centers = jnp.asarray(init)
        for _ in range(iters):
            assign, centers = kmedians_level(
                desc, bits, jnp.asarray(group), centers, n_groups
            )
        assign = np.asarray(assign)
        level_centers.append(np.asarray(centers))
        group = group * k + assign
        n_groups *= k

    # Pack into the (BFS-ordered) node arrays.
    n_nodes = sum(k ** (l + 1) for l in range(depth)) + 1
    centers_arr = np.zeros((n_nodes, 8), np.uint32)
    child_arr = np.full((n_nodes, k), -1, np.int32)
    level_base = [0]  # node id of the first node at each level (root = 0)
    base = 1
    for level in range(depth):
        level_base.append(base)
        base += k ** (level + 1)
    for level in range(depth):
        lb = level_base[level + 1]
        cl = level_centers[level].reshape(-1, 8)  # (k^(level+1), 8)
        centers_arr[lb:lb + cl.shape[0]] = cl
        # children of each node at `level` are its k subclusters
        pb = level_base[level]
        n_parents = k ** level
        for p in range(n_parents):
            pid = pb + p
            for c in range(k):
                child_arr[pid, c] = lb + p * k + c
    leaf_word = np.full((n_nodes,), 0, np.int32)
    lb = level_base[depth]
    leaf_word[lb:] = np.arange(n_nodes - lb)
    return TreeVocabulary(centers_arr, child_arr, leaf_word, k, depth)


# ---------------------------------------------------------------------------
# BoW scoring (dense per-keyframe word-count matrix)
# ---------------------------------------------------------------------------


def bow_counts(words: jnp.ndarray, valid: jnp.ndarray, n_words: int) -> jnp.ndarray:
    """(N,) word ids -> (n_words,) uint16 counts."""
    tgt = jnp.where(valid, words, n_words)
    return jnp.zeros((n_words + 1,), jnp.int32).at[tgt].add(1)[:n_words].astype(jnp.uint16)


def l1_scores_against_all(
    query_words,
    query_valid,
    kf_bow,  # (KF, n_words) uint16
    kf_l1,  # (KF,) float32 L1 norms under current idf
    idf,  # (n_words,) float32
):
    """TF-IDF L1 similarity of a query frame against every keyframe.

    DBoW2 L1 score (reference ScoringObject.cpp:23):
        s(v, w) = 1 - 0.5 * |v/|v| - w/|w||_1
                = sum_shared min(v_i, w_i)-ish; computed exactly below via
        |v - w|_1 = |v|_1 + |w|_1 - 2 * sum_i min(v_i, w_i) for the shared
    columns only — gathered at the query's (<= N) distinct words.
    """
    n_words = idf.shape[0]
    tgt = jnp.where(query_valid, query_words, 0)
    q_cnt = jnp.zeros((n_words,), jnp.float32).at[tgt].add(query_valid.astype(jnp.float32))
    q_w = q_cnt * idf
    q_l1 = jnp.sum(q_w)
    # Distinct query word columns (pad with 0; duplicates contribute once
    # because we gather per *word*, not per keypoint).
    # Use the keypoint words directly but de-duplicate by masking repeats.
    sorted_w = jnp.sort(jnp.where(query_valid, query_words, n_words - 1))
    first = jnp.concatenate([jnp.array([True]), sorted_w[1:] != sorted_w[:-1]])
    cols = jnp.where(first, sorted_w, 0)
    col_mask = first & query_valid.any()  # (N,)

    kf_vals = kf_bow[:, cols].astype(jnp.float32) * idf[cols][None, :]  # (KF, N)
    q_vals = (q_cnt[cols] * idf[cols])[None, :]
    inter = jnp.sum(
        jnp.minimum(kf_vals, q_vals) * col_mask[None, :], axis=1
    )  # (KF,)
    # normalized L1 score
    denom = jnp.maximum(kf_l1, 1e-9) * jnp.maximum(q_l1, 1e-9)
    # s = 1 - 0.5 |v̂ - ŵ|_1 = sum min(v̂_i, ŵ_i) for L1-normalized vectors
    # with non-negative entries; compute min on normalized values:
    inter_norm = jnp.sum(
        jnp.minimum(kf_vals / jnp.maximum(kf_l1[:, None], 1e-9),
                    q_vals / jnp.maximum(q_l1, 1e-9))
        * col_mask[None, :],
        axis=1,
    )
    shared_words = jnp.sum((kf_bow[:, cols] > 0) & (q_cnt[cols] > 0)[None, :] & col_mask[None, :], axis=1)
    return inter_norm, shared_words
