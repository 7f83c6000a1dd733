"""Direct-index (word-bucket) gating tests — the DBoW2 FeatureVector analog
(reference src/ORBmatcher.cc:702-877 joins candidates per vocabulary node).
"""

import numpy as np
import jax.numpy as jnp

from my_orb_slam2_tpu.ops import matching


def test_word_bucket_mask_semantics():
    w1 = jnp.asarray([0, 105, 312, -1])
    w2 = jnp.asarray([7, 99, 200, 310, -1])
    m = np.asarray(matching.word_bucket_mask(w1, w2, 100))
    # buckets: w1 -> [0, 1, 3, -]; w2 -> [0, 0, 2, 3, -]
    assert m[0, 0] and m[0, 1]          # bucket 0 matches bucket 0
    assert not m[0, 2] and not m[0, 3]  # 0 vs 2/3
    assert m[1, 0] is not None and not bool(m[1, 0])  # 1 vs 0
    assert m[2, 3]                      # 3 vs 3
    # missing words stay unrestricted on either side
    assert m[3].all()
    assert m[:, 4].all()


def test_search_brute_word_gate_blocks_aliases(rng):
    """Two IDENTICAL descriptors in different buckets must not match when
    the gate is on (the aliasing case the direct index exists to kill),
    and must match when it is off."""
    d = rng.integers(0, 2 ** 32, (1, 8), dtype=np.uint32)
    desc1 = jnp.asarray(d)
    desc2 = jnp.asarray(np.vstack([d, rng.integers(0, 2 ** 32, (1, 8), dtype=np.uint32)]))
    v1 = jnp.ones((1,), bool)
    v2 = jnp.ones((2,), bool)
    w1 = jnp.asarray([0])
    w2 = jnp.asarray([250, 0])  # the identical descriptor sits in bucket 2
    idx, ok, _ = matching.search_brute(
        desc1, v1, desc2, v2, check_rotation=False,
        words1=w1, words2=w2, bucket_div=100,
    )
    assert not bool(ok[0])  # cross-bucket: rejected despite distance 0
    idx, ok, _ = matching.search_brute(
        desc1, v1, desc2, v2, check_rotation=False,
    )
    assert bool(ok[0]) and int(idx[0]) == 0  # ungated: matches
