"""Keyframe database: place-recognition queries over all keyframes.

Replaces reference KeyFrameDatabase (src/KeyFrameDatabase.cc). The
reference's inverted file (word -> keyframe list) becomes a SPARSE
per-keyframe word LIST: each keyframe stores its (<= N) keypoint word ids,
sorted, with each entry's occurrence rank within the row. A query builds
its dense (n_words,) count vector once, then every keyframe's TF-IDF L1
score is an (N,)-gather + reduction over its own list — the inverted
file's work without pointer chasing, and without the (KF x n_words) dense
matrix (192 MB at KITTI capacity with a 65k-word vocabulary; the lists are
(KF x N) i32 = ~12 MB).

The candidate logic reproduces the reference gates:
- DetectLoopCandidates (src/KeyFrameDatabase.cc:76-208): exclude covisible
  keyframes, require shared words > 0.8 * max, score >= min_score (computed
  in the same pass as the lowest neighbor score), accumulate scores over
  covisibility groups (keyframe + top-10 covis), keep groups >= 0.75 * best
  accumulated score.
- DetectRelocalizationCandidates (:220-337): same without the covisibility
  exclusion and without the min_score floor.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from my_orb_slam2_tpu.models import map_state as ms


class KfDatabase(NamedTuple):
    kf_words: jnp.ndarray  # (KF, N) i32 sorted word ids per keyframe (-1 pad)
    kf_rank: jnp.ndarray  # (KF, N) i32 occurrence rank of the word in its row
    kf_valid: jnp.ndarray  # (KF,) bool (mirrors map kf_valid at insert time)
    df: jnp.ndarray  # (n_words,) int32 document frequency
    n_docs: jnp.ndarray  # () int32
    n_words: jnp.ndarray  # () int32 vocabulary size (static metadata)


def init_db(max_kf: int, n_kp: int, n_words: int) -> KfDatabase:
    return KfDatabase(
        kf_words=jnp.full((max_kf, n_kp), -1, jnp.int32),
        kf_rank=jnp.zeros((max_kf, n_kp), jnp.int32),
        kf_valid=jnp.zeros((max_kf,), bool),
        df=jnp.zeros((n_words,), jnp.int32),
        n_docs=jnp.zeros((), jnp.int32),
        n_words=jnp.asarray(n_words, jnp.int32),
    )


def idf_table(db: KfDatabase) -> jnp.ndarray:
    """Running inverse document frequency (the procedural-vocabulary
    equivalent of DBoW2's trained idf weights)."""
    n = jnp.maximum(db.n_docs, 1).astype(jnp.float32)
    return jnp.log(n / (db.df.astype(jnp.float32) + 1.0) + 1.0)


@jax.jit
def add_keyframe(db: KfDatabase, kf_id, words, valid) -> KfDatabase:
    n_words = db.df.shape[0]
    N = words.shape[0]
    w = jnp.sort(jnp.where(valid & (words >= 0), words, n_words))  # (N,)
    is_word = w < n_words
    first = jnp.concatenate([jnp.array([True]), w[1:] != w[:-1]]) & is_word
    # occurrence rank within the row: position - first-position of the word
    pos = jnp.arange(N, dtype=jnp.int32)
    first_pos = jnp.full((n_words + 1,), N, jnp.int32).at[
        jnp.where(is_word, w, n_words)
    ].min(pos)
    rank = pos - jnp.take(first_pos, jnp.where(is_word, w, n_words))
    df_inc = jnp.zeros((n_words + 1,), jnp.int32).at[
        jnp.where(first, w, n_words)
    ].add(1)[:n_words]
    return db._replace(
        kf_words=db.kf_words.at[kf_id].set(jnp.where(is_word, w, -1)),
        kf_rank=db.kf_rank.at[kf_id].set(jnp.where(is_word, rank, 0)),
        kf_valid=db.kf_valid.at[kf_id].set(True),
        df=db.df + df_inc,
        n_docs=db.n_docs + 1,
    )


def _row_distinct_df(db: KfDatabase, rows_mask):
    """df contribution (distinct words) of the selected keyframe rows."""
    n_words = db.df.shape[0]
    sel = rows_mask[:, None] & (db.kf_words >= 0) & (db.kf_rank == 0)
    return jnp.zeros((n_words + 1,), jnp.int32).at[
        jnp.where(sel, db.kf_words, n_words).reshape(-1)
    ].add(1)[:n_words]


@jax.jit
def erase_mask(db: KfDatabase, kill: jnp.ndarray) -> KfDatabase:
    """Batch-erase keyframes (culling sync; reference KeyFrame::SetBadFlag ->
    KeyFrameDatabase::erase, src/KeyFrameDatabase.cc:48-67)."""
    kill = kill & db.kf_valid
    df_dec = _row_distinct_df(db, kill)
    return db._replace(
        kf_words=jnp.where(kill[:, None], -1, db.kf_words),
        kf_rank=jnp.where(kill[:, None], 0, db.kf_rank),
        kf_valid=db.kf_valid & ~kill,
        df=db.df - df_dec,
        n_docs=jnp.maximum(db.n_docs - jnp.sum(kill.astype(jnp.int32)), 0),
    )


@jax.jit
def erase_keyframe(db: KfDatabase, kf_id) -> KfDatabase:
    kill = jnp.zeros(db.kf_valid.shape, bool).at[kf_id].set(True)
    return erase_mask(db, kill)


def _query_scores(db: KfDatabase, words, valid):
    """TF-IDF L1 similarity of a query frame against every keyframe.

    DBoW2 L1 score (reference ScoringObject.cpp:23) for L1-normalized
    non-negative vectors: s = sum_w min(v_w, q_w). Per keyframe-list entry
    (word w, occurrence rank r) the normalized contribution is
        clip(q_w_norm - r * s_kf(w), 0, s_kf(w)),  s_kf(w) = idf(w)/L1_kf,
    which sums EXACTLY to min(cnt_kf * idf/L1_kf, cnt_q * idf/L1_q) per
    word — the whole score is one (KF, N) gather + reduction.
    """
    n_words = db.df.shape[0]
    idf = idf_table(db)
    q_cnt = jnp.zeros((n_words + 1,), jnp.float32).at[
        jnp.where(valid & (words >= 0), words, n_words)
    ].add(1.0)[:n_words]
    q_w = q_cnt * idf
    q_l1 = jnp.maximum(jnp.sum(q_w), 1e-9)

    w = db.kf_words  # (KF, N)
    ok = (w >= 0) & db.kf_valid[:, None]
    wc = jnp.clip(w, 0, n_words - 1)
    idf_e = jnp.where(ok, idf[wc], 0.0)  # (KF, N)
    kf_l1 = jnp.maximum(jnp.sum(idf_e, axis=1), 1e-9)  # (KF,)
    s_kf = idf_e / kf_l1[:, None]
    b = jnp.where(ok, q_w[wc], 0.0) / q_l1  # normalized query weight per word
    contrib = jnp.clip(b - db.kf_rank.astype(jnp.float32) * s_kf, 0.0, s_kf)
    scores = jnp.sum(contrib, axis=1)
    shared = jnp.sum(
        ok & (db.kf_rank == 0) & (jnp.where(ok, q_cnt[wc], 0.0) > 0), axis=1
    ).astype(jnp.int32)
    return jnp.where(db.kf_valid, scores, -1.0), jnp.where(db.kf_valid, shared, 0)


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def detect_loop_candidates(
    db: KfDatabase,
    state: ms.MapState,
    kf_id,
    max_candidates: int = 8,
):
    """Loop candidates for keyframe kf_id (already inserted in db).

    The min-score floor (lowest BoW score vs the covisible neighbors,
    reference src/LoopClosing.cc:140-154) is computed here from the same
    all-keyframes score pass — one device dispatch instead of up to 10
    sequential score_between calls per keyframe.

    Returns (cand_ids (C,), cand_scores (C,), min_score): -1 padded, best
    first.
    """
    words = db.kf_words[kf_id]
    valid = words >= 0
    scores, shared = _query_scores(db, words, valid)
    # Min score over covisible neighbors (weight >= 15); 1.0 when none.
    connected = (state.covis[kf_id] >= 15) & state.kf_valid & db.kf_valid
    min_score = jnp.min(jnp.where(connected, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 1.0)
    # Exclude self + covisible keyframes (reference :88-92).
    excl = connected | (jnp.arange(scores.shape[0]) == kf_id)
    shared = jnp.where(excl, 0, shared)
    scores = jnp.where(excl, -1.0, scores)
    max_common = jnp.max(shared)
    min_common = (0.8 * max_common.astype(jnp.float32)).astype(jnp.int32)
    ok = (shared > min_common) & (scores >= min_score)
    # Covisibility-group accumulated score (reference :149-192): group =
    # candidate + its top-10 covis; acc score = sum of member scores that
    # are themselves candidates; keep best-of-group.
    KF = scores.shape[0]
    covis = state.covis
    top_w, top_ids = jax.lax.top_k(jnp.where(ok[:, None], covis, -1), 10)

    def group_score(i):
        members = top_ids[i]
        m_ok = (top_w[i] > 0) & jnp.take(ok, members)
        m_sc = jnp.where(m_ok, jnp.take(scores, members), 0.0)
        own = jnp.where(ok[i], scores[i], 0.0)
        acc = own + jnp.sum(m_sc)
        # best member of the group (highest individual score)
        all_sc = jnp.concatenate([own[None], m_sc])
        all_id = jnp.concatenate([jnp.array([i]), members])
        best = jnp.argmax(all_sc)
        return acc, all_id[best]

    acc, best_of_group = jax.vmap(group_score)(jnp.arange(KF))
    acc = jnp.where(ok, acc, -1.0)
    best_acc = jnp.max(acc)
    keep = acc > 0.75 * best_acc
    # Candidates: best-of-group for kept groups, deduplicated by score sort.
    cand_score = jnp.where(keep, jnp.take(scores, best_of_group), -1.0)
    # dedup: a keyframe may be best of several groups — scatter max.
    per_kf = jnp.full((KF,), -1.0).at[best_of_group].max(cand_score)
    top_sc, top_id = jax.lax.top_k(per_kf, max_candidates)
    return jnp.where(top_sc > 0, top_id, -1), top_sc, min_score


@functools.partial(jax.jit, static_argnames=("max_candidates",))
def detect_reloc_candidates(db: KfDatabase, state: ms.MapState, words, valid,
                            max_candidates: int = 16):
    """Relocalization candidates for an untracked frame
    (reference :220-337 — no covisibility exclusion, no score floor). The
    reference returns an UNBOUNDED candidate list; 16 is the static bound
    (the batched relocalizer verifies all of them in one dispatch)."""
    scores, shared = _query_scores(db, words, valid)
    max_common = jnp.max(shared)
    min_common = (0.8 * max_common.astype(jnp.float32)).astype(jnp.int32)
    ok = shared > min_common
    KF = scores.shape[0]
    covis = state.covis
    top_w, top_ids = jax.lax.top_k(jnp.where(ok[:, None], covis, -1), 10)

    def group_score(i):
        members = top_ids[i]
        m_ok = (top_w[i] > 0) & jnp.take(ok, members)
        m_sc = jnp.where(m_ok, jnp.take(scores, members), 0.0)
        own = jnp.where(ok[i], scores[i], 0.0)
        acc = own + jnp.sum(m_sc)
        all_sc = jnp.concatenate([own[None], m_sc])
        all_id = jnp.concatenate([jnp.array([i]), members])
        best = jnp.argmax(all_sc)
        return acc, all_id[best]

    acc, best_of_group = jax.vmap(group_score)(jnp.arange(KF))
    acc = jnp.where(ok, acc, -1.0)
    best_acc = jnp.max(acc)
    keep = acc > 0.75 * best_acc
    cand_score = jnp.where(keep, jnp.take(scores, best_of_group), -1.0)
    per_kf = jnp.full((KF,), -1.0).at[best_of_group].max(cand_score)
    top_sc, top_id = jax.lax.top_k(per_kf, max_candidates)
    return jnp.where(top_sc > 0, top_id, -1), top_sc


@jax.jit
def score_between(db: KfDatabase, kf_a, kf_b):
    """Pairwise BoW score between two keyframes (for the min-score floor,
    reference src/LoopClosing.cc:140-154)."""
    words = db.kf_words[kf_a]
    valid = words >= 0
    scores, _ = _query_scores(db, words, valid)
    return scores[kf_b]
