"""Keyframe database: place-recognition queries over all keyframes.

Replaces reference KeyFrameDatabase (src/KeyFrameDatabase.cc). The
reference's inverted file (word -> keyframe list) becomes a DENSE
(KF, n_words) uint8 count matrix; queries gather only the QUERY'S words
(a frame carries at most its keypoint-capacity distinct words, <= 2048),
so the per-query cost is a (KF, n_q) column gather + reduction —
independent of vocabulary size. The per-keyframe L1 norm is maintained
incrementally at insert time under the idf of that moment (DBoW2's
weights are likewise frozen at training time, ScoringObject.cpp:23 —
recomputing historical norms under a drifting running-idf would match
neither DBoW2 nor the stored rows). This keeps 100k+-word vocabularies
affordable: the old all-words formulation scanned the full (KF, W)
matrix per query (~60 ms at W=100k vs ~2 ms sparse).

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

from my_orb_slam2_tpu.models import map_state as ms


class KfDatabase(NamedTuple):
    kf_bow: jnp.ndarray  # (KF, n_words) uint8 word counts (saturating)
    kf_valid: jnp.ndarray  # (KF,) bool (mirrors map kf_valid at insert time)
    kf_l1: jnp.ndarray  # (KF,) f32 L1 norm of the idf-weighted row (frozen
    # at insert time — see module docstring)
    df: jnp.ndarray  # (n_words,) int32 document frequency
    n_docs: jnp.ndarray  # () int32
    n_words: jnp.ndarray  # () int32 vocabulary size (static metadata)


def init_db(max_kf: int, n_kp: int, n_words: int) -> KfDatabase:
    return KfDatabase(
        kf_bow=jnp.zeros((max_kf, n_words), jnp.uint8),
        kf_valid=jnp.zeros((max_kf,), bool),
        kf_l1=jnp.zeros((max_kf,), jnp.float32),
        df=jnp.zeros((n_words,), jnp.int32),
        n_docs=jnp.zeros((), jnp.int32),
        n_words=jnp.asarray(n_words, jnp.int32),
    )


def _idf_from(df, n_docs):
    n = jnp.maximum(n_docs, 1).astype(jnp.float32)
    return jnp.log(n / (df.astype(jnp.float32) + 1.0) + 1.0)


def idf_table(db: KfDatabase) -> jnp.ndarray:
    """Running inverse document frequency (the procedural-vocabulary
    equivalent of DBoW2's trained idf weights)."""
    return _idf_from(db.df, db.n_docs)


@jax.jit
def add_keyframe(db: KfDatabase, kf_id, words, valid) -> KfDatabase:
    n_words = db.df.shape[0]
    ok = valid & (words >= 0)
    cnt_q = jnp.zeros((n_words + 1,), jnp.int32).at[
        jnp.where(ok, words, n_words)
    ].add(1)
    cnt = cnt_q[:n_words]
    row = jnp.minimum(cnt, 255).astype(jnp.uint8)
    df = db.df + (cnt > 0).astype(jnp.int32)
    n_docs = db.n_docs + 1
    # Row L1 under the idf as of THIS insert (df updated first so the row's
    # own words are counted): gather only the row's words.
    idf = _idf_from(df, n_docs)
    wq = jnp.where(ok, words, 0)
    contrib = jnp.take(idf, wq) * ok.astype(jnp.float32)
    l1 = jnp.sum(contrib)
    return db._replace(
        kf_bow=db.kf_bow.at[kf_id].set(row),
        kf_valid=db.kf_valid.at[kf_id].set(True),
        kf_l1=db.kf_l1.at[kf_id].set(jnp.maximum(l1, 1e-9)),
        df=df,
        n_docs=n_docs,
    )


@jax.jit
def erase_mask(db: KfDatabase, kill: jnp.ndarray) -> KfDatabase:
    """Batch-erase keyframes (culling sync; reference KeyFrame::SetBadFlag ->
    KeyFrameDatabase::erase, src/KeyFrameDatabase.cc:48-67)."""
    kill = kill & db.kf_valid
    df_dec = jnp.sum(
        (db.kf_bow > 0) & kill[:, None], axis=0, dtype=jnp.int32
    )
    return db._replace(
        kf_bow=jnp.where(kill[:, None], 0, db.kf_bow),
        kf_valid=db.kf_valid & ~kill,
        kf_l1=jnp.where(kill, 0.0, db.kf_l1),
        df=db.df - df_dec,
        n_docs=jnp.maximum(db.n_docs - jnp.sum(kill.astype(jnp.int32)), 0),
    )


@jax.jit
def erase_keyframe(db: KfDatabase, kf_id) -> KfDatabase:
    kill = jnp.zeros(db.kf_valid.shape, bool).at[kf_id].set(True)
    return erase_mask(db, kill)


# A query can carry at most its keypoint capacity of distinct words; every
# driver in this repo uses <= 2048 keypoints per frame.
MAX_QUERY_WORDS = 2048


def _query_scores_from_counts(db: KfDatabase, q_cnt):
    """TF-IDF L1 similarity of a (W,)-count query against every keyframe
    (DBoW2 L1 score, reference ScoringObject.cpp:23): for L1-normalized
    non-negative vectors s = sum_w min(v_hat_w, q_hat_w). Only the query's
    nonzero words can contribute (min(v, 0) = 0), so the whole score is a
    (KF, n_q) column gather + reduction — vocabulary-size independent."""
    W = db.df.shape[0]
    n_q = min(MAX_QUERY_WORDS, W)
    idf = idf_table(db)
    qw = jnp.nonzero(q_cnt > 0, size=n_q, fill_value=W)[0]  # (n_q,)
    ok_w = qw < W
    qwc = jnp.clip(qw, 0, W - 1)
    q_idf = jnp.take(idf, qwc)
    q_vals = jnp.take(q_cnt, qwc).astype(jnp.float32) * q_idf
    q_vals = jnp.where(ok_w, q_vals, 0.0)
    q_hat = q_vals / jnp.maximum(jnp.sum(q_vals), 1e-9)  # (n_q,)
    cols = db.kf_bow[:, qwc].astype(jnp.float32)  # (KF, n_q)
    cols = cols * ok_w[None, :]
    kf_w = cols * q_idf[None, :] / jnp.maximum(db.kf_l1, 1e-9)[:, None]
    inter = jnp.sum(jnp.minimum(kf_w, q_hat[None, :]), axis=1)
    shared = jnp.sum((cols > 0), axis=1).astype(jnp.int32)
    return (
        jnp.where(db.kf_valid, inter, -1.0),
        jnp.where(db.kf_valid, shared, 0),
    )


def _query_scores(db: KfDatabase, words, valid):
    """_query_scores_from_counts with the query given as keypoint words."""
    n_words = db.df.shape[0]
    q_cnt = jnp.zeros((n_words + 1,), jnp.int32).at[
        jnp.where(valid & (words >= 0), words, n_words)
    ].add(1)[:n_words]
    return _query_scores_from_counts(db, q_cnt)


def _group_accumulate(scores, ok, covis):
    """Covisibility-group accumulated scoring shared by both detectors
    (reference :149-192): group = candidate + its top-10 covis; acc score =
    sum of member scores that are themselves candidates; keep best-of-group
    for groups above 0.75 * best accumulated score. Returns the per-KF
    candidate score (-1 where not a kept best-of-group)."""
    KF = scores.shape[0]
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
    # dedup: a keyframe may be best of several groups — scatter max.
    per_kf = jnp.full((KF,), -1.0).at[best_of_group].max(cand_score)
    return per_kf


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
    scores, shared = _query_scores_from_counts(db, db.kf_bow[kf_id])
    # Min score over covisible neighbors (weight >= 15); 1.0 when none.
    connected = (state.covis[kf_id] >= 15) & state.kf_valid & db.kf_valid
    min_score = jnp.min(jnp.where(connected, scores, jnp.inf))
    min_score = jnp.where(jnp.isfinite(min_score), min_score, 1.0)
    # Exclude self + EVERY keyframe sharing at least one map point: the
    # reference's spConnectedKeyFrames comes from GetConnectedKeyFrames(),
    # which returns the FULL weight map (weight >= 1, KeyFrame.cc
    # UpdateConnections), not the >= 15 covisibility edges — a recent
    # keyframe sharing a handful of points must not be loop-eligible
    # (measured: a weight-<15 neighbor 120 frames into a rendered circuit
    # passed every Sim3 gate as a "loop" and its correction corrupted the
    # map). The >= 15 set still defines the min-score floor (reference
    # :140-154 uses the ordered covisible list there).
    excl = (
        ((state.covis[kf_id] >= 1) & state.kf_valid)
        | (jnp.arange(scores.shape[0]) == kf_id)
    )
    shared = jnp.where(excl, 0, shared)
    scores = jnp.where(excl, -1.0, scores)
    max_common = jnp.max(shared)
    min_common = (0.8 * max_common.astype(jnp.float32)).astype(jnp.int32)
    ok = (shared > min_common) & (scores >= min_score)
    per_kf = _group_accumulate(scores, ok, state.covis)
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
    per_kf = _group_accumulate(scores, ok, state.covis)
    top_sc, top_id = jax.lax.top_k(per_kf, max_candidates)
    return jnp.where(top_sc > 0, top_id, -1), top_sc


@jax.jit
def score_between(db: KfDatabase, kf_a, kf_b):
    """Pairwise BoW score between two keyframes (for the min-score floor,
    reference src/LoopClosing.cc:140-154)."""
    scores, _ = _query_scores_from_counts(db, db.kf_bow[kf_a])
    return scores[kf_b]
