"""Vocabulary serialization: DBoW2 text format + packed npz.

The reference loads a ~1M-word ORB vocabulary from `ORBvoc.txt` at startup
via a slow text parse (reference TemplatedVocabulary::loadFromTextFile,
Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1338-1424; System.cc:64-72).
Format: a header line `k L scoring_type weighting_type`, then one line per
node: `parent_id is_leaf d0 .. d31 weight` with the 32 descriptor bytes in
BFS order.

`load_dbow2_text` packs that tree into the TreeVocabulary array form
(centers, children, leaf word ids); `save_packed`/`load_packed` snapshot a
vocabulary to npz so subsequent startups skip the text parse entirely
(the reference pays the parse cost every run).
"""

from __future__ import annotations

import os

import numpy as np

from my_orb_slam2_tpu.ops.bow import TreeVocabulary


def load_dbow2_text(path: str) -> TreeVocabulary:
    with open(path) as f:
        header = f.readline().split()
        k, L = int(header[0]), int(header[1])
        parents, descs, weights = [], [], []
        for line in f:
            p = line.split()
            if len(p) < 34:
                continue
            parents.append(int(p[0]))
            descs.append([int(x) for x in p[2:34]])
            weights.append(float(p[34]) if len(p) > 34 else 1.0)
    n = len(parents)
    # Node ids in file order are 1..n (0 is the implicit root).
    n_nodes = n + 1
    centers = np.zeros((n_nodes, 8), np.uint32)
    byte_arr = np.asarray(descs, np.uint8)  # (n, 32)
    centers[1:] = byte_arr.view("<u4").reshape(n, 8)
    children = np.full((n_nodes, k), -1, np.int32)
    child_count = np.zeros(n_nodes, np.int32)
    for i, p in enumerate(parents):
        nid = i + 1
        if child_count[p] < k:
            children[p, child_count[p]] = nid
            child_count[p] += 1
    leaf_word = np.full(n_nodes, 0, np.int32)
    w = 0
    for nid in range(n_nodes):
        if child_count[nid] == 0:
            leaf_word[nid] = w
            w += 1
    return TreeVocabulary(centers, children, leaf_word, k, L)


def save_packed(voc: TreeVocabulary, path: str):
    np.savez_compressed(
        path,
        centers=np.asarray(voc.centers),
        children=np.asarray(voc.children),
        leaf_word=np.asarray(voc.leaf_word),
        k=voc.k,
        depth=voc.depth,
    )


def load_packed(path: str) -> TreeVocabulary:
    d = np.load(path)
    return TreeVocabulary(
        d["centers"], d["children"], d["leaf_word"], int(d["k"]), int(d["depth"])
    )


def save_dbow2_text(voc: TreeVocabulary, path: str):
    """Write a TreeVocabulary in the DBoW2 text format the reference ships
    its ORBvoc.txt in (TemplatedVocabulary::saveToTextFile,
    Thirdparty/DBoW2/DBoW2/TemplatedVocabulary.h:1426-1461): header
    `k L scoring weighting`, then one line per non-root node in BFS order —
    `parent_id is_leaf d0..d31 weight`. Round-trips through
    `load_dbow2_text` (node file order == our BFS array order)."""
    centers = np.asarray(voc.centers)
    children = np.asarray(voc.children)
    n_nodes = centers.shape[0]
    parent = np.zeros(n_nodes, np.int32)
    for nid in range(n_nodes):
        for c in children[nid]:
            if c >= 0:
                parent[c] = nid
    is_leaf = (children.max(axis=1) < 0).astype(int)
    byte_view = centers.view("<u1").reshape(n_nodes, 32)
    with open(path, "w") as f:
        f.write(f"{voc.k} {voc.depth} 0 0\n")
        for nid in range(1, n_nodes):
            d = " ".join(str(int(b)) for b in byte_view[nid])
            f.write(f"{parent[nid]} {is_leaf[nid]} {d} 1.0\n")


_ASSET_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "assets"
)
# Default: the k=10, L=5 (100k-word) tree trained on rendered-world ORB
# descriptors (tools/make_vocab.py) — a 10x step toward the reference's
# ~1M-word ORBvoc (k=10, L=6; src/System.cc:64-72, stripped from its
# mount). The keyframe database queries sparsely at the query's own words
# (keyframe_db.py), so query cost is vocabulary-size independent; the
# (KF, n_words) u8 count matrix is ~157 MB at KITTI capacity. Recall at
# 2,000+ rendered keyframes: see VOCAB_SCALE_r05.json (the 10k k10_L4
# asset remains shipped for comparison and low-memory settings;
# SLAM_VOCAB=path env var overrides).
_DEFAULT_ASSET = os.path.join(_ASSET_DIR, "orbvoc_k10_L5.npz")
_FALLBACK_ASSET = os.path.join(_ASSET_DIR, "orbvoc_k10_L4.npz")


def default_vocabulary():
    """The engine's default place-recognition vocabulary (see the asset
    comment above). Resolution order: $SLAM_VOCAB (packed npz path) ->
    packed 100k-word k10_L5 asset -> packed 10k-word k10_L4 asset ->
    training-free LSH fallback."""
    override = os.environ.get("SLAM_VOCAB", "")
    if override and os.path.exists(override):
        return load_packed(override)
    if os.path.exists(_DEFAULT_ASSET):
        return load_packed(_DEFAULT_ASSET)
    if os.path.exists(_FALLBACK_ASSET):
        return load_packed(_FALLBACK_ASSET)
    from my_orb_slam2_tpu.ops.bow import LshVocabulary

    # 14 bits = 16384 words: the dense (KF, n_words) u8 database stays
    # ~25 MB at KITTI capacity (keyframe_db.py).
    return LshVocabulary(n_bits=14)
