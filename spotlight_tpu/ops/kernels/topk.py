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
axis, which Mosaic supports at runtime offsets, and runs as a ``fori_loop``
with two reused VMEM pool buffers.  (An earlier variant statically unrolled
the selection and kept one ``(batch, tile)`` temporary live per selected
element, overflowing the 16 MB VMEM scope beyond ~64 elements.)

Selection is exact and reproduces ``lax.top_k`` tie order (ties broken by
ascending item id): Mosaic has no sort primitive, so the kernel repeatedly
extracts the maximum of a candidate pool holding the current tile's scores
plus the running top-k.
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

#: Widest selection handled by one kernel invocation: the per-tile selection
#: loop costs O(k * tile * batch) VPU work, so very wide fetches instead run
#: in resume-key rounds (see :func:`streaming_topk`), each re-streaming the
#: catalog once.
ROUND_K = 128


def _topk_kernel(users_t_ref, resume_score_ref, resume_id_ref, items_ref,
                 bias_ref, out_scores_ref, out_ids_ref, pool_s, pool_i,
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
        pool_s, pool_i   : (TILE+k, B)  VMEM scratch: candidate pool
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        out_scores_ref[:] = jnp.full_like(out_scores_ref, _NEG_INF)
        out_ids_ref[:] = jnp.full_like(out_ids_ref, jnp.int32(_ID_SENTINEL))

    scores = score_fn(items_ref[:], users_t_ref[:])
    scores = scores + bias_ref[:]                     # (TILE, B)

    base = step * tile_items
    rows = base + jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)

    # Resume support for wide fetches: exclude every item at or before the
    # resume key in the selection total order (score desc, id asc), so a
    # later round continues exactly where the previous round stopped.
    resume_score = resume_score_ref[:]                # (1, B)
    resume_id = resume_id_ref[:]                      # (1, B)
    already_selected = ((scores > resume_score) |
                        ((scores == resume_score) & (rows <= resume_id)))
    countable = (rows < valid_items) & ~already_selected

    # Candidate pool: this tile's scores plus the running top-k.
    pool_s[pl.ds(0, tile_items), :] = jnp.where(countable, scores, _NEG_INF)
    pool_i[pl.ds(0, tile_items), :] = rows
    pool_s[pl.ds(tile_items, k), :] = out_scores_ref[:]
    pool_i[pl.ds(tile_items, k), :] = out_ids_ref[:]

    def select(r, _):
        ps = pool_s[:]
        best = jnp.max(ps, axis=0, keepdims=True)                  # (1, B)
        best_id = jnp.min(
            jnp.where(ps == best, pool_i[:], jnp.int32(_ID_SENTINEL)),
            axis=0, keepdims=True)                                 # (1, B)
        out_scores_ref[pl.ds(r, 1), :] = best
        out_ids_ref[pl.ds(r, 1), :] = best_id
        # Remove the selected entry (ids are unique within the pool).
        pool_s[:] = jnp.where((pool_i[:] == best_id) & (ps == best),
                              _NEG_INF, ps)
        return 0

    jax.lax.fori_loop(0, k, select, 0)


def _auto_tile_items(batch, k):
    """Tile rows sized so the two (TILE + k, B) scratch pools stay ~4 MB
    of VMEM at any user-batch width (B=1024 at the old fixed 1024-row
    tile was measured to exceed the 16 MB scoped-vmem limit by ~3 MB).
    Multiple of 256 (sublane-aligned block shapes)."""
    budget = (1 << 19) // max(batch, 1) - k
    return max(256, min(1024, (budget // 256) * 256))


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

    Any ``k`` up to the catalog size is supported.  ``k`` beyond ``ROUND_K``
    runs in rounds: each round streams the catalog once and selects the next
    ``ROUND_K`` items *strictly after* the previous round's last selection in
    the total order (score descending, id ascending), carried between rounds
    as a per-user resume key.  A fetch of 512 therefore costs 4 catalog
    passes — with the score matrix still never materialized.
    """
    num_items = item_matrix.shape[0]
    if k > num_items:
        raise ValueError('k ({}) exceeds the catalog size ({})'
                         .format(k, num_items))
    batch = user_reprs.shape[0]
    if tile_items is None:
        tile_items = _auto_tile_items(batch, min(k, ROUND_K))
    score_fn = score_fn or _dot_scores
    if k <= ROUND_K:
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
            pltpu.VMEM((tile_items + k, batch), jnp.float32),
            pltpu.VMEM((tile_items + k, batch), jnp.int32),
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
