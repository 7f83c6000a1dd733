"""Fused FAST-9/16 + 3x3 NMS as a Pallas TPU kernel.

The XLA formulation in frontend.fast_score_map materializes 16 shifted
copies of the atlas through HBM (~77MB of traffic for a VGA atlas) plus the
arc-min chain and a reduce_window — measured ~6ms/image on v5e. This kernel
keeps the atlas VMEM-resident and computes the ring diffs, the cyclic
9-window arc test, the V-score and the 3x3 NMS per row-tile in registers:
one HBM read of the atlas + one write of the score map.

Semantics match frontend.nms3x3(frontend.fast_score_map(...)) on all pixels
at least 4 rows/cols away from the atlas border (the only region the
detector ever reads: every pyramid level sits >= GAP=8 from atlas edges and
detection applies a 19px in-level margin).

Reference: the per-cell OpenCV FAST of ORBextractor::ComputeKeyPointsOctTree
(reference src/ORBextractor.cc:776-850); the V-score is OpenCV's "max
threshold at which the pixel stays a corner".
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from my_orb_slam2_tpu.ops.frontend import FAST_RING

TILE = 64  # output rows per program
HALO = 4  # ring radius 3 + 1 NMS row


def _kernel(img_ref, out_ref, *, threshold: float, arc: int, n_rows: int, n_cols: int):
    i = pl.program_id(0)
    wp = img_ref.shape[1]
    # Slab: TILE output rows + HALO each side (input is pre-padded by HALO).
    slab = img_ref[pl.ds(i * TILE, TILE + 2 * HALO), :]  # (TILE+8, Wp)
    S = TILE + 2  # score rows computed: output rows +-1 for NMS

    # Score must be computed on slab rows [HALO-1, HALO+TILE+1) = [3, TILE+5).
    center = slab[3 : 3 + S, :]

    def shifted(dy: int, dx: int):
        rows = slab[3 + dy : 3 + dy + S, :]
        if dx:
            rows = pltpu.roll(rows, shift=(-dx) % wp, axis=1)
        return rows

    diffs = [shifted(int(dy), int(dx)) - center for dy, dx in FAST_RING]

    def arc_score(ds):
        """max over 16 cyclic starts of (min over `arc` consecutive diffs).
        (Tried log-step doubling: no gain — the kernel is roll-bound.)"""
        best = None
        for k in range(16):
            m = ds[k]
            for j in range(1, arc):
                m = jnp.minimum(m, ds[(k + j) % 16])
            best = m if best is None else jnp.maximum(best, m)
        return best

    bright = arc_score(diffs)
    dark = arc_score([-d for d in diffs])
    score = jnp.maximum(bright, dark)
    score = jnp.where(score > threshold, score, 0.0)

    # Global-coordinate interior mask (>=3px from the true image border),
    # matching fast_score_map's mask. Row coordinate of score row r is
    # i*TILE + r - 1 in unpadded image space.
    r0 = i * TILE - 1
    rows_g = r0 + jax.lax.broadcasted_iota(jnp.int32, (S, wp), 0)
    cols_g = jax.lax.broadcasted_iota(jnp.int32, (S, wp), 1)
    interior = (
        (rows_g >= 3) & (rows_g < n_rows - 3) & (cols_g >= 3) & (cols_g < n_cols - 3)
    )
    score = jnp.where(interior, score, 0.0)

    # 3x3 NMS on the middle TILE rows.
    neigh = None
    for dy in (0, 1, 2):
        row_band = score[dy : dy + TILE, :]
        for dx in (-1, 0, 1):
            v = pltpu.roll(row_band, shift=(-dx) % wp, axis=1) if dx else row_band
            neigh = v if neigh is None else jnp.maximum(neigh, v)
    mid = score[1 : 1 + TILE, :]
    out_ref[:] = jnp.where(mid >= neigh, mid, 0.0)


@functools.partial(jax.jit, static_argnames=("threshold", "arc", "interpret"))
def fast_nms_pallas(
    img: jnp.ndarray, threshold: float, arc: int = 9, interpret: bool = False
) -> jnp.ndarray:
    """Dense FAST V-score + 3x3 NMS over `img` (H, W) float32.

    Equivalent to nms3x3(fast_score_map(img, threshold, arc)) away from the
    outer 4px border (which the caller never reads).
    """
    h, w = img.shape
    wp = ((w + 127) // 128) * 128
    n_tiles = (h + TILE - 1) // TILE
    hp = n_tiles * TILE
    # Pad: HALO rows on top, HALO + tile rounding at bottom, zero columns.
    padded = jnp.zeros((hp + 2 * HALO, wp), img.dtype)
    padded = jax.lax.dynamic_update_slice(padded, img, (HALO, 0))

    out = pl.pallas_call(
        functools.partial(
            _kernel, threshold=float(threshold), arc=int(arc), n_rows=h, n_cols=w
        ),
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (hp + 2 * HALO, wp), lambda i: (0, 0), memory_space=pltpu.VMEM
            )
        ],
        out_specs=pl.BlockSpec((TILE, wp), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((hp, wp), img.dtype),
        interpret=interpret,
    )(padded)
    return out[:h, :w]
