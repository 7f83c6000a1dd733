"""Keyframe database: place-recognition queries over all keyframes.

Replaces reference KeyFrameDatabase (src/KeyFrameDatabase.cc): the inverted
file (word -> keyframe list) becomes a dense (KF, n_words) word-count matrix
queried by column gathers; the candidate logic reproduces the reference
gates:

- DetectLoopCandidates (src/KeyFrameDatabase.cc:76-208): exclude covisible
  keyframes, require shared words > 0.8 * max, score >= min_score,
  accumulate scores over covisibility groups (keyframe + top-10 covis),
  keep groups >= 0.75 * best accumulated score.
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
from my_orb_slam2_tpu.ops import bow as bow_ops


class KfDatabase(NamedTuple):
    kf_bow: jnp.ndarray  # (KF, n_words) uint16 word counts
    kf_valid: jnp.ndarray  # (KF,) bool (mirrors map kf_valid at insert time)
    df: jnp.ndarray  # (n_words,) int32 document frequency
    n_docs: jnp.ndarray  # () int32
    kf_words: jnp.ndarray  # (KF, N) int32 per-keypoint word ids (direct index)


def init_db(max_kf: int, n_kp: int, n_words: int) -> KfDatabase:
    return KfDatabase(
        kf_bow=jnp.zeros((max_kf, n_words), jnp.uint16),
        kf_valid=jnp.zeros((max_kf,), bool),
        df=jnp.zeros((n_words,), jnp.int32),
        n_docs=jnp.zeros((), jnp.int32),
        kf_words=jnp.zeros((max_kf, n_kp), jnp.int32),
    )


def idf_table(db: KfDatabase) -> jnp.ndarray:
    """Running inverse document frequency (the procedural-vocabulary
    equivalent of DBoW2's trained idf weights)."""
    n = jnp.maximum(db.n_docs, 1).astype(jnp.float32)
    return jnp.log(n / (db.df.astype(jnp.float32) + 1.0) + 1.0)


@jax.jit
def add_keyframe(db: KfDatabase, kf_id, words, valid) -> KfDatabase:
    n_words = db.kf_bow.shape[1]
    counts = bow_ops.bow_counts(words, valid, n_words)
    df_inc = (counts > 0).astype(jnp.int32)
    return db._replace(
        kf_bow=db.kf_bow.at[kf_id].set(counts),
        kf_valid=db.kf_valid.at[kf_id].set(True),
        df=db.df + df_inc,
        n_docs=db.n_docs + 1,
        kf_words=db.kf_words.at[kf_id].set(jnp.where(valid, words, -1)),
    )


@jax.jit
def erase_mask(db: KfDatabase, kill: jnp.ndarray) -> KfDatabase:
    """Batch-erase keyframes (culling sync; reference KeyFrame::SetBadFlag ->
    KeyFrameDatabase::erase, src/KeyFrameDatabase.cc:48-67)."""
    kill = kill & db.kf_valid
    df_dec = jnp.sum(
        jnp.where(kill[:, None], (db.kf_bow > 0).astype(jnp.int32), 0), axis=0
    )
    return db._replace(
        kf_bow=jnp.where(kill[:, None], 0, db.kf_bow),
        kf_valid=db.kf_valid & ~kill,
        df=db.df - df_dec,
        n_docs=jnp.maximum(db.n_docs - jnp.sum(kill.astype(jnp.int32)), 0),
    )


@jax.jit
def erase_keyframe(db: KfDatabase, kf_id) -> KfDatabase:
    counts = db.kf_bow[kf_id]
    return db._replace(
        kf_bow=db.kf_bow.at[kf_id].set(jnp.zeros_like(counts)),
        kf_valid=db.kf_valid.at[kf_id].set(False),
        df=db.df - (counts > 0).astype(jnp.int32),
        n_docs=jnp.maximum(db.n_docs - 1, 0),
    )


def _query_scores(db: KfDatabase, words, valid):
    idf = idf_table(db)
    kf_l1 = jnp.sum(
        db.kf_bow.astype(jnp.float32) * idf[None, :], axis=1
    )
    scores, shared = bow_ops.l1_scores_against_all(
        words, valid, db.kf_bow, kf_l1, idf
    )
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
                            max_candidates: int = 8):
    """Relocalization candidates for an untracked frame
    (reference :220-337 — no covisibility exclusion, no score floor)."""
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
