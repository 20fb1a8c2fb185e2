"""Pallas TPU kernel: fused catalog scoring + streaming top-k.

Completes the fused lookup-and-score design (SURVEY.md §7 step 6b): item
tiles stream through VMEM, are scored against the resident user batch on the
MXU, and a running top-k (scores + item ids) is maintained on-chip — the
``(batch, num_items)`` score matrix never exists, so precision@k-style
evaluation scales to catalogs far larger than HBM would allow for
materialized scores (a 1M-item catalog at batch 256 would need 1 GB per
batch materialized; this kernel needs only the VMEM tile).

Layout: item-major — scores are ``(tile_items, batch)`` and the running
top-k is ``(k, batch)`` — so the selection loop indexes the **sublane**
axis, which Mosaic supports at runtime offsets.  (An earlier variant
statically unrolled the selection and kept one ``(batch, tile)`` temporary
live per selected element, overflowing the 16 MB VMEM scope beyond ~64
elements.)

Selection is exact and reproduces ``lax.top_k`` tie order (ties broken by
ascending item id).  Mosaic has no sort primitive, so selection is
max-extraction — but extractions are *data-dependent*, not ``k`` per tile:
each tile first counts, per user, how many of its scores beat the user's
current k-th best (one cheap compare+reduce pass, the same shape of work
as the rank kernel's per-target pass), and the extraction loop runs
``min(max_user_count, k)`` iterations.  In steady state the running
threshold is high and counts are tiny (the expected number of top-k
updates over a randomly ordered stream is ``k·ln(N/k)`` per user, spread
over ``N/tile`` tiles), so almost all tiles pay only the matmul + one
count pass — this is what closed the ~4.5x gap to the rank kernel's
roofline that the fixed ``k``-extraction-per-tile design left open
(round-4 VERDICT item 1).  Each extraction inserts into the sorted
``(k, B)`` output buffer by comparison-counting its position (O(k·B) VPU
work), so selection cost scales with the number of *actual* top-k updates
rather than ``k × num_tiles``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from spotlight_tpu.ops.kernels.ranking import _dot_scores

_NEG_INF = float('-inf')
_ID_SENTINEL = 2 ** 30

#: Resume-round width for very wide fetches: each top-k update pays an
#: O(k * batch) sorted insertion and the expected update count grows
#: ~k·ln(N/k), so single-launch selection cost grows ~quadratically in k
#: while rounds are linear with a per-round catalog-read term.  Measured
#: crossover at B=1024/N=200K: single launch wins to ~k=230 (k=192:
#: 9.35 ms vs 11.79 ms in 128-rounds; k=256: 12.60 vs 12.27) — so fetches
#: up to SINGLE_LAUNCH_K run in one catalog pass and wider ones in
#: ROUND_K-sized resume rounds.
ROUND_K = 128
SINGLE_LAUNCH_K = 192


def _topk_kernel(users_t_ref, resume_score_ref, resume_id_ref, items_ref,
                 bias_ref, out_scores_ref, out_ids_ref, working,
                 *, k, valid_items, tile_items, score_fn):
    """One grid step: score an item tile, merge it into the running top-k.

    Refs (item-major layout):
        users_t_ref      : (K, B)       VMEM, resident across steps (K =
                                        score_fn's user-feature rows)
        resume_score_ref : (1, B)       VMEM — selection resumes strictly
        resume_id_ref    : (1, B)         after this (score, id) key
        items_ref        : (TILE, D)    VMEM, this step's item tile
        bias_ref         : (TILE, 1)    VMEM
        out_scores_ref   : (k, B)       VMEM accumulator, sorted descending
        out_ids_ref      : (k, B)       VMEM accumulator
        working          : (TILE, B)    VMEM scratch: remaining candidates

    Selection: count how many tile scores beat each user's current k-th
    best (the sorted accumulator's last row), then run
    ``min(max_count, k)`` max-extractions, each inserting into the sorted
    accumulator at its comparison-counted position.  ``min(·, k)`` is
    exact: a tile element preceded by ``k`` same-tile elements can never
    be in the top-k, and extraction is per-user descending, so after k
    extractions nothing further from this tile can qualify.  Elements at
    or below the threshold never qualify either (the threshold row
    precedes them in the (score desc, id asc) total order — buffer ids
    always come from earlier tiles), so ``max_count`` iterations suffice;
    overshoot extractions insert at position >= k and are dropped by the
    same comparison count.  Step 0's full buffer fill runs exactly k
    extractions (count = tile size, clamped to k).
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_scores_ref[:] = jnp.full_like(out_scores_ref, _NEG_INF)
        out_ids_ref[:] = jnp.full_like(out_ids_ref, jnp.int32(_ID_SENTINEL))

    scores = score_fn(items_ref[:], users_t_ref[:])
    scores = scores + bias_ref[:]                     # (TILE, B)

    base = step * tile_items
    rows = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    global_rows = base + rows

    # Resume support for wide fetches: exclude every item at or before the
    # resume key in the selection total order (score desc, id asc), so a
    # later round continues exactly where the previous round stopped.
    resume_score = resume_score_ref[:]                # (1, B)
    resume_id = resume_id_ref[:]                      # (1, B)
    already_selected = ((scores > resume_score) |
                        ((scores == resume_score) &
                         (global_rows <= resume_id)))
    countable = (global_rows < valid_items) & ~already_selected

    working[:] = jnp.where(countable, scores, _NEG_INF)

    # One cheap pass: how many candidates beat each user's current k-th
    # best?  That bounds the extraction loop (min with k, see docstring).
    threshold = out_scores_ref[pl.ds(k - 1, 1), :]    # (1, B)
    counts = jnp.sum(jnp.where(working[:] > threshold, 1, 0),
                     axis=0, keepdims=True)           # (1, B) int32
    trip = jnp.minimum(jnp.max(counts), k)

    def extract(_, carry):
        w = working[:]
        best = jnp.max(w, axis=0, keepdims=True)                   # (1, B)
        best_row = jnp.min(
            jnp.where(w == best, rows, jnp.int32(_ID_SENTINEL)),
            axis=0, keepdims=True)                                 # (1, B)
        working[:] = jnp.where(rows == best_row, _NEG_INF, w)
        new_id = base + best_row

        # Sorted insertion at the comparison-counted position r: rows
        # j < r keep their entry, row r takes the new element, rows
        # j > r shift down by one (r == k drops the element).
        buf_s = out_scores_ref[:]
        buf_i = out_ids_ref[:]
        r = (jnp.sum(jnp.where(buf_s > best, 1, 0),
                     axis=0, keepdims=True) +
             jnp.sum(jnp.where((buf_s == best) & (buf_i < new_id), 1, 0),
                     axis=0, keepdims=True))                       # (1, B)
        slot = jax.lax.broadcasted_iota(jnp.int32, buf_s.shape, 0)
        shifted_s = pltpu.roll(buf_s, 1, 0)
        shifted_i = pltpu.roll(buf_i, 1, 0)
        out_scores_ref[:] = jnp.where(
            slot < r, buf_s, jnp.where(slot == r, best, shifted_s))
        out_ids_ref[:] = jnp.where(
            slot < r, buf_i, jnp.where(slot == r, new_id, shifted_i))
        return carry

    jax.lax.fori_loop(0, trip, extract, 0)


def _auto_tile_items(batch, k):
    """Tile rows sized so the (TILE, B) working scratch — and the ~3 live
    (TILE, B) temporaries of the count/extraction passes — stay ~2 MB of
    VMEM each at any user-batch width.  Multiple of 256 (sublane-aligned
    block shapes)."""
    del k  # selection cost no longer scales VMEM with k
    budget = (1 << 19) // max(batch, 1)
    return max(256, min(2048, (budget // 256) * 256))


def streaming_topk(user_reprs, item_matrix, item_bias, k, tile_items=None,
                   interpret=False, score_fn=None):
    """Exact top-k catalog items per user without materializing scores.

    Parameters
    ----------
    user_reprs : (B, K) float32
        Per-user scoring operand: user vectors (K = D) for the default dot
        scoring, or whatever ``score_fn`` consumes (e.g. stacked
        taste+attention vectors for mixture-of-tastes scoring)
    item_matrix : (N, D) float32; item_bias : (N,) float32
    k : int (static); must not exceed the catalog size

    Returns
    -------
    (scores, ids) : ((B, k), (B, k)) in descending score order, ties broken
        by ascending item id (lax.top_k parity).

    Any ``k`` up to the catalog size is supported.  ``k`` beyond
    ``SINGLE_LAUNCH_K`` runs in rounds: each round streams the catalog once
    and selects the next ``ROUND_K`` items *strictly after* the previous
    round's last selection in the total order (score descending, id
    ascending), carried between rounds as a per-user resume key.  A fetch
    of 512 therefore costs 4 catalog passes — with the score matrix still
    never materialized.
    """
    num_items = item_matrix.shape[0]
    if k > num_items:
        raise ValueError('k ({}) exceeds the catalog size ({})'
                         .format(k, num_items))
    batch = user_reprs.shape[0]
    if tile_items is None:
        tile_items = _auto_tile_items(batch, min(k, ROUND_K))
    score_fn = score_fn or _dot_scores
    if k <= SINGLE_LAUNCH_K:
        return _streaming_topk_call(user_reprs, item_matrix, item_bias, k,
                                    tile_items=tile_items,
                                    interpret=interpret, score_fn=score_fn)

    resume_score = jnp.full((batch, 1), jnp.inf, jnp.float32)
    resume_id = jnp.full((batch, 1), -1, jnp.int32)
    score_parts, id_parts = [], []
    remaining = k
    while remaining > 0:
        round_k = min(ROUND_K, remaining)
        scores, ids = _streaming_topk_call(
            user_reprs, item_matrix, item_bias, round_k,
            tile_items=tile_items, interpret=interpret,
            resume_score=resume_score, resume_id=resume_id,
            score_fn=score_fn)
        score_parts.append(scores)
        id_parts.append(ids)
        resume_score = scores[:, -1:]
        resume_id = ids[:, -1:]
        remaining -= round_k
    return (jnp.concatenate(score_parts, axis=1),
            jnp.concatenate(id_parts, axis=1))


@functools.partial(jax.jit,
                   static_argnames=('k', 'tile_items', 'interpret',
                                    'score_fn'))
def _streaming_topk_call(user_reprs, item_matrix, item_bias, k,
                         tile_items=1024, interpret=False,
                         resume_score=None, resume_id=None,
                         score_fn=_dot_scores):
    """One bounded-``k`` kernel launch, optionally resuming after a
    (score, id) key from a previous round."""
    batch, user_rows = user_reprs.shape
    num_items, dim = item_matrix.shape

    if resume_score is None:
        resume_score = jnp.full((batch, 1), jnp.inf, jnp.float32)
    if resume_id is None:
        resume_id = jnp.full((batch, 1), -1, jnp.int32)

    # Pad the selection width to the 8-sublane minimum (narrow blocks force
    # degenerate layouts); the extra selections are sliced off below.
    orig_k = k
    k = -(-k // 8) * 8

    padded_items = pl.cdiv(num_items, tile_items) * tile_items
    pad = padded_items - num_items
    if pad:
        item_matrix = jnp.concatenate(
            [item_matrix, jnp.zeros((pad, dim), item_matrix.dtype)])
        item_bias = jnp.concatenate(
            [item_bias, jnp.zeros((pad,), item_bias.dtype)])

    kernel = functools.partial(_topk_kernel, k=k, valid_items=num_items,
                               tile_items=tile_items, score_fn=score_fn)

    scores_t, ids_t = pl.pallas_call(
        kernel,
        grid=(padded_items // tile_items,),
        in_specs=[
            pl.BlockSpec((user_rows, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((k, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((k, batch), jnp.float32),
            jax.ShapeDtypeStruct((k, batch), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tile_items, batch), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * user_rows * padded_items,
            bytes_accessed=padded_items * dim * 4 + batch * user_rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_reprs.T, resume_score.T, resume_id.T, item_matrix,
      item_bias[:, None])
    return scores_t.T[:, :orig_k], ids_t.T[:, :orig_k]
