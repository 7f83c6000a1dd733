"""Bag-of-visual-words place recognition ops (the DBoW2 replacement).

The reference vendors DBoW2 (Thirdparty/DBoW2): a hierarchical k-means tree
(ORBvoc: k=10, L=6, ~1M words) built offline from ORB descriptors, used for
(a) TF-IDF L1 relocalization/loop scoring via an inverted file and (b) a
"direct index" that buckets keypoints by tree node to prune matching.

TPU-native redesign:

- A `Vocabulary` maps packed descriptors -> word ids with pure array ops.
  Two implementations:
    * `LshVocabulary` (default): word id = a fixed random subset of
      descriptor bits (2^bits words). Zero training, one gather + popcount-
      free bit math, and a coarser prefix serves as the direct-index node id.
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

    def __init__(self, n_bits: int = 16, node_bits: int = 8, seed: int = 123):
        assert n_bits <= 24 and node_bits <= n_bits
        self.n_bits = n_bits
        self.node_bits = node_bits
        self.n_words = 1 << n_bits
        self.n_nodes = 1 << node_bits
        rng = np.random.default_rng(seed)
        bit_idx = rng.choice(256, size=n_bits, replace=False)
        self.word_word = jnp.asarray(bit_idx // 32, jnp.int32)  # u32 word index
        self.word_bit = jnp.asarray(bit_idx % 32, jnp.uint32)

    def words(self, desc: jnp.ndarray) -> jnp.ndarray:
        """(N, 8) u32 packed descriptors -> (N,) int32 word ids."""
        sel = desc[:, self.word_word]  # (N, n_bits)
        bits = (sel >> self.word_bit[None, :]) & jnp.uint32(1)
        weights = (jnp.uint32(1) << jnp.arange(self.n_bits, dtype=jnp.uint32))[None, :]
        return jnp.sum(bits * weights, axis=1).astype(jnp.int32)

    def nodes(self, words: jnp.ndarray) -> jnp.ndarray:
        """Direct-index node id (coarse prefix of the word id): plays the
        role of DBoW2's level-(L-levelsup) node (reference Frame::ComputeBoW
        levelsup=4, src/Frame.cc:425)."""
        return words >> (self.n_bits - self.node_bits)


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
        from my_orb_slam2_tpu.ops.frontend import hamming_distance

        node = jnp.zeros((desc.shape[0],), jnp.int32)
        for _ in range(self.depth):
            ch = self.children[node]  # (N, k)
            cent = self.centers[ch]  # (N, k, 8)
            x = jnp.bitwise_xor(desc[:, None, :], cent)
            d = jnp.sum(jax.lax.population_count(x), axis=-1)
            d = jnp.where(ch >= 0, d, jnp.iinfo(jnp.int32).max)
            best = jnp.argmin(d, axis=1)
            nxt = jnp.take_along_axis(ch, best[:, None], axis=1)[:, 0]
            node = jnp.where(nxt >= 0, nxt, node)  # stay if leaf
        return jnp.take(self.leaf_word, node)

    def nodes(self, words: jnp.ndarray) -> jnp.ndarray:
        # Coarse bucket: top-level branch of the word id.
        per = max(self.n_words // (self.k ** 2), 1)
        return words // per


def train_tree_vocabulary(desc_corpus: np.ndarray, k: int = 8, depth: int = 3,
                          iters: int = 8, seed: int = 0) -> TreeVocabulary:
    """On-device hierarchical k-medians over packed binary descriptors.

    Replaces DBoW2's offline k-means training: distances are Hamming
    (XOR+popcount), centers are bitwise majorities of their cluster — the
    binary-descriptor analog of the mean. Runs level by level; each level is
    a batched assignment (matmul-like distance matrix) + majority update.
    """
    rng = np.random.default_rng(seed)
    desc = jnp.asarray(desc_corpus)
    N = desc.shape[0]

    def kmedians(sub_desc, kk, key):
        n = sub_desc.shape[0]
        if n == 0:
            return np.zeros((kk, 8), np.uint32)
        init = rng.choice(n, size=min(kk, n), replace=False)
        centers = np.asarray(sub_desc)[init]
        if len(init) < kk:
            centers = np.concatenate([centers, centers[: kk - len(init)]])
        centers = jnp.asarray(centers)

        from my_orb_slam2_tpu.ops.frontend import hamming_distance

        for _ in range(iters):
            d = hamming_distance(sub_desc, centers)
            assign = jnp.argmin(d, axis=1)  # (n,)
            # majority vote per bit per cluster
            bits = jnp.unpackbits(
                jax.lax.bitcast_convert_type(sub_desc, jnp.uint8).reshape(n, 32),
                axis=1,
            )  # (n, 256)
            onehot = jax.nn.one_hot(assign, kk, dtype=jnp.float32)  # (n, kk)
            sums = onehot.T @ bits.astype(jnp.float32)  # (kk, 256)
            counts = jnp.sum(onehot, axis=0)[:, None]
            maj = (sums * 2 > counts).astype(jnp.uint8)
            packed = jnp.packbits(maj, axis=1)  # (kk, 32) u8
            centers = jax.lax.bitcast_convert_type(
                packed.reshape(kk, 8, 4), jnp.uint32
            ).reshape(kk, 8)
        return np.asarray(centers)

    # Build level by level on the host (tree structure), batched on device.
    nodes_centers = [np.zeros((1, 8), np.uint32)]  # root placeholder
    children = [[]]
    assignments = {0: np.arange(N)}
    node_depth = {0: 0}
    leaf_ids = {}
    next_id = 1
    frontier = [0]
    for level in range(depth):
        new_frontier = []
        for nid in frontier:
            idx = assignments[nid]
            if len(idx) == 0:
                continue
            cent = kmedians(desc[idx], k, None)
            from my_orb_slam2_tpu.ops.frontend import hamming_distance

            d = np.asarray(hamming_distance(desc[idx], jnp.asarray(cent)))
            assign = d.argmin(axis=1)
            ch_ids = []
            for c in range(k):
                cid = next_id
                next_id += 1
                nodes_centers.append(cent[c : c + 1])
                children.append([])
                assignments[cid] = idx[assign == c]
                node_depth[cid] = level + 1
                ch_ids.append(cid)
                new_frontier.append(cid)
            children[nid] = ch_ids
        frontier = new_frontier
    n_nodes = next_id
    centers = np.concatenate(nodes_centers, axis=0).astype(np.uint32)
    child_arr = np.full((n_nodes, k), -1, np.int32)
    for nid, ch in enumerate(children):
        for j, c in enumerate(ch):
            child_arr[nid, j] = c
    leaf_word = np.full((n_nodes,), -1, np.int32)
    w = 0
    for nid in range(n_nodes):
        if child_arr[nid].max() < 0:
            leaf_word[nid] = w
            w += 1
    leaf_word[leaf_word < 0] = 0
    return TreeVocabulary(centers, child_arr, leaf_word, k, depth)


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
