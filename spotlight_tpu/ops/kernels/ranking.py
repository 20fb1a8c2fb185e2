"""Pallas TPU kernel: fused catalog scoring + rank counting.

The evaluation hot path (SURVEY.md §3.3) scores every user against the whole
catalog and ranks their test items.  The XLA path materializes a
``(batch, num_items)`` score matrix in HBM, sorts it, and searches it —
three passes over ``batch x num_items`` data.

This kernel fuses the whole thing into one streaming pass: item-embedding
tiles are staged through VMEM, scored against the resident user batch on the
MXU, and immediately reduced to per-target ``count(score > target_score)``
and ``count(score == target_score)`` accumulators.  HBM traffic drops from
``3 * B * N * 4`` bytes to ``N * D * 4`` (the item table read once), and the
score matrix never exists.

Layout: everything runs *item-major* — scores are computed as
``(tile_items, batch)`` and targets/counters live as ``(T, batch)`` — so the
per-target loop indexes the **sublane** axis, which Mosaic supports at
runtime offsets.  (The lane axis only supports static indexing; an earlier
statically-unrolled variant held one ``(batch, tile)`` temporary live per
target and overflowed the 16 MB VMEM scope beyond ~64 targets.)  A
``fori_loop`` over targets keeps VMEM usage constant in T and compile time
flat.

The counts reproduce ``scipy.stats.rankdata`` average-rank semantics:
``rank = greater + (equal + 1) / 2`` (see
`/root/reference/spotlight/evaluation.py:52`).

Replaces the per-user Python loop + full materialization for MRR-style
metrics; top-k metrics use the streaming top-k kernel (ops/kernels/topk.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_scores(items, users_t):
    """Default per-tile scoring: one (TILE, D) @ (D, B) MXU matmul.

    ``items`` may arrive in bfloat16 (bf16 catalog streaming halves the
    tile's HBM bytes); the cast back to the user operand's float32 is
    value-exact, so scores — and therefore ranks and tie comparisons —
    are bit-identical to streaming the f32-cast table."""
    if items.dtype != users_t.dtype:
        items = items.astype(users_t.dtype)
    return jnp.dot(items, users_t, preferred_element_type=jnp.float32)


def mixture_combine(tastes, attns):
    """Softmax-weighted taste mixture from per-component score lists.

    ``tastes[m]`` and ``attns[m]`` are same-shaped score arrays for
    component m; returns ``sum_m softmax_m(attns)[m] * tastes[m]``.
    Shared by the item-major kernel scoring (:func:`make_mixture_score_fn`)
    and the batch-major per-shard scoring
    (`parallel.evaluation.batch_scores`), so the two stay arithmetically
    aligned.
    """
    amax = attns[0]
    for attn in attns[1:]:
        amax = jnp.maximum(amax, attn)
    weights = [jnp.exp(attn - amax) for attn in attns]
    denom = weights[0]
    for weight in weights[1:]:
        denom = denom + weight
    out = weights[0] * tastes[0]
    for weight, taste in zip(weights[1:], tastes[1:]):
        out = out + weight * taste
    return out / denom


@functools.lru_cache(maxsize=None)
def make_mixture_score_fn(num_mixtures, dim):
    """Per-tile scoring for mixture-of-tastes representations.

    The user-side operand stacks each user's taste and attention vectors
    into one ``(2 * num_mixtures * dim, B)`` matrix (tastes first).  Per
    item tile: M taste matmuls, M attention matmuls, a softmax over the M
    attention scores, and the softmax-weighted taste mixture — the
    streaming form of ``MixtureLSTMNet.score_catalog``
    (`spotlight_tpu/sequence/representations.py`).  M is static, so the
    mixture loop unrolls to straight-line MXU/VPU code.
    """
    def score(items, users_t):
        if items.dtype != users_t.dtype:
            items = items.astype(users_t.dtype)
        tastes, attns = [], []
        for m in range(num_mixtures):
            lo = m * dim
            taste = jnp.dot(items, users_t[lo:lo + dim, :],
                            preferred_element_type=jnp.float32)
            lo = (num_mixtures + m) * dim
            attn = jnp.dot(items, users_t[lo:lo + dim, :],
                           preferred_element_type=jnp.float32)
            tastes.append(taste)
            attns.append(attn)
        return mixture_combine(tastes, attns)

    return score


def _rank_weight_kernel(users_t_ref, tscore_ref, items_ref, bias_ref,
                        weight_ref, *, tile_items, score_fn, real_targets):
    """One grid step of the lean production rank kernel: score an item
    tile, accumulate the combined rank weight per target.

    Per (item, user, target) element the contribution is ``1`` for a
    strictly greater score, ``0.5`` for an exact tie, ``0`` otherwise —
    the average-tie rank is then ``weight + 0.5`` (the target itself
    contributes exactly ``0.5``, see :func:`rank_weights`).

    Leaner than :func:`_rank_count_kernel` by construction (the VPU
    comparison loop is the kernel's binding cost at small batch, see
    docs/performance.md "Roofline"):

    - no target-id operand, no per-tile iota, no id-exclusion compare —
      self-exclusion is arithmetic (matched target scores tie exactly);
    - no validity mask — callers pad ``item_bias`` with ``-FLOAT_MAX``,
      so padded rows can never contribute;
    - one fused select chain and ONE accumulator instead of two
      (2 compares + 2 selects + 1 add per element/target vs ~10 ops).

    Refs (item-major layout):
        users_t_ref : (K, B)      VMEM, resident across steps
        tscore_ref  : (T, B)      VMEM, matched target scores
        items_ref   : (TILE, D)   VMEM, this step's item tile
        bias_ref    : (TILE, 1)   VMEM (-FLOAT_MAX on padded rows)
        weight_ref  : (T, B)      VMEM accumulator (same block every step)
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        weight_ref[:] = jnp.zeros_like(weight_ref)

    scores = score_fn(items_ref[:], users_t_ref[:])
    scores = scores + bias_ref[:]  # (TILE, 1) broadcasts over users

    def body(t, _):
        ts = tscore_ref[pl.ds(t, 1), :]              # (1, B)
        contrib = jnp.where(
            scores > ts, 1.0,
            jnp.where(scores == ts, 0.5, 0.0))
        weight_ref[pl.ds(t, 1), :] += jnp.sum(contrib, axis=0,
                                              keepdims=True)
        return 0

    # fori_loop, not a static unroll (see _rank_count_kernel).  The loop
    # covers only the REAL targets (the 8-sublane block padding never
    # enters the VPU comparison loop — its accumulator rows stay at the
    # step-0 zeros): the comparison loop is the kernel's binding cost, so
    # at T=1 (sequence MRR) this alone is ~8x less VPU work than looping
    # the padded width.
    jax.lax.fori_loop(0, real_targets, body, 0)


def _auto_tile_items(batch, budget=1 << 20):
    """Item-tile rows sized so the (TILE, B) score block stays ~4 MB of
    VMEM (``budget`` elements) at any user-batch width.  rank_counts
    holds ~5 live (TILE, B) temporaries per target iteration (scores,
    iota, countable, two where-masks) vs rank_weights' ~2, so it uses a
    quarter budget — B=1024 at tile 512 was measured to exceed the 16 MB
    scoped-vmem limit by 6 MB.  Rounded down to a sublane multiple:
    Mosaic requires block rows divisible by 8, and ragged batch widths
    would otherwise produce tiles like 668."""
    return max(256, min(4096, budget // max(batch, 1)) // 8 * 8)


def rank_weights(user_reprs, item_matrix, item_bias, target_scores,
                 tile_items=None, interpret=False, score_fn=None):
    """Combined streaming rank weights of target scores vs the catalog.

    ``weights[b, t] = count(score > ts) + 0.5 * count(score == ts)`` over
    ALL catalog rows **including the target itself** — the average-tie
    rank is ``weights + 0.5`` (the target ties itself for exactly 0.5).

    REQUIRES matched target scores: ``target_scores`` must be computed
    with the same arithmetic as the kernel's tile scores
    (:func:`matched_target_scores` / :func:`matched_candidate_scores`),
    so the target's self-comparison lands in the tie bucket bit-exactly.
    For unmatched scores use :func:`rank_counts` (id-based
    self-exclusion, 1-ulp robust, ~2x the VPU work).

    This is the production evaluation kernel: one accumulator, no target
    ids, no validity mask (padding rows are excluded by giving them a
    ``-FLOAT_MAX`` bias, which also covers shard padding in the mesh
    path).  Replaces the reference's rankdata hot loop
    (`/root/reference/spotlight/evaluation.py:42-55`).

    Returns
    -------
    (B, T) float32 combined weights.
    """
    if tile_items is None:
        tile_items = _auto_tile_items(user_reprs.shape[0])
    orig_targets = target_scores.shape[1]
    pad_t = -orig_targets % 8
    if pad_t:
        target_scores = jnp.concatenate(
            [target_scores,
             jnp.repeat(target_scores[:, :1], pad_t, axis=1)], axis=1)
    weights = _rank_weights_call(
        user_reprs, item_matrix, item_bias, target_scores,
        tile_items=tile_items, interpret=interpret,
        score_fn=score_fn or _dot_scores, real_targets=orig_targets)
    return weights[:, :orig_targets]


@functools.partial(jax.jit,
                   static_argnames=('tile_items', 'interpret', 'score_fn',
                                    'real_targets'))
def _rank_weights_call(user_reprs, item_matrix, item_bias, target_scores,
                       tile_items=2048, interpret=False,
                       score_fn=_dot_scores, real_targets=None):
    batch, user_rows = user_reprs.shape
    num_items, dim = item_matrix.shape
    num_targets = target_scores.shape[1]
    if real_targets is None:
        real_targets = num_targets

    padded_items = pl.cdiv(num_items, tile_items) * tile_items
    pad = padded_items - num_items
    if pad:
        # Padding rows carry a -FLOAT_MAX bias: their scores can never
        # exceed or tie a real target score, so no validity mask is
        # needed in the kernel.
        item_matrix = jnp.concatenate(
            [item_matrix, jnp.zeros((pad, dim), item_matrix.dtype)])
        item_bias = jnp.concatenate(
            [item_bias,
             jnp.full((pad,), -jnp.finfo(jnp.float32).max,
                      item_bias.dtype)])

    grid = (padded_items // tile_items,)
    kernel = functools.partial(_rank_weight_kernel,
                               tile_items=tile_items,
                               score_fn=score_fn,
                               real_targets=real_targets)

    weights_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_rows, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((num_targets, batch), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * user_rows * padded_items +
            2 * batch * num_targets * padded_items,
            bytes_accessed=padded_items * dim * 4 + batch * user_rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_reprs.T, target_scores.T, item_matrix, item_bias[:, None])

    return weights_t.T


def _rank_count_kernel(users_t_ref, tscore_ref, tid_ref, items_ref, bias_ref,
                       greater_ref, equal_ref, *, valid_items, tile_items,
                       score_fn, real_targets):
    """One grid step: score a tile of items against all users, accumulate
    per-target comparison counts.

    The target item itself is excluded from the counts by id (not by score
    equality), making the rank robust to 1-ulp differences between the
    separately-computed target score and the tile matmul's value.

    Refs (item-major layout):
        users_t_ref : (K, B)      VMEM, resident across steps (K = the
                                  scoring function's user-feature rows;
                                  D for dot-product scoring)
        tscore_ref  : (T, B)      VMEM, target scores
        tid_ref     : (T, B)      VMEM, target item ids (int32)
        items_ref   : (TILE, D)   VMEM, this step's item tile
        bias_ref    : (TILE, 1)   VMEM
        greater_ref : (T, B)      VMEM accumulator (same block every step)
        equal_ref   : (T, B)      VMEM accumulator
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        greater_ref[:] = jnp.zeros_like(greater_ref)
        equal_ref[:] = jnp.zeros_like(equal_ref)

    # (TILE, B) scores (MXU matmul(s); mixture adds a VPU softmax).
    scores = score_fn(items_ref[:], users_t_ref[:])
    scores = scores + bias_ref[:]  # (TILE, 1) broadcasts over users

    # Global item id of each score row; rows past the catalog end (padding
    # of the final tile) never count.
    base = step * tile_items
    row = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 0)
    global_row = base + row
    in_range = global_row < valid_items

    def counts_at(t):
        ts = tscore_ref[pl.ds(t, 1), :]              # (1, B)
        tid = tid_ref[pl.ds(t, 1), :]                # (1, B)
        countable = in_range & (global_row != tid)
        greater = jnp.sum(
            jnp.where(countable & (scores > ts), 1.0, 0.0),
            axis=0, keepdims=True)
        equal = jnp.sum(
            jnp.where(countable & (scores == ts), 1.0, 0.0),
            axis=0, keepdims=True)
        return greater, equal

    def body(t, _):
        greater, equal = counts_at(t)
        greater_ref[pl.ds(t, 1), :] += greater
        equal_ref[pl.ds(t, 1), :] += equal
        return 0

    # A fori_loop (not a static unroll) even for tiny T: unrolled bodies
    # were measured ~10x slower here (Mosaic scheduled their static-offset
    # accumulator writes poorly), and the loop keeps VMEM flat in T.
    # Only the REAL targets are looped; sublane-padding rows keep their
    # step-0 zeros (see _rank_weight_kernel).
    jax.lax.fori_loop(0, real_targets, body, 0)


def rank_counts(user_reprs, item_matrix, item_bias, target_scores,
                target_ids, tile_items=None, interpret=False,
                score_fn=None):
    """Streaming comparison counts of target scores against the catalog.

    Parameters
    ----------
    user_reprs : (B, K) float32
        Per-user scoring operand: the user vectors (K = D) for the default
        dot-product scoring, or whatever ``score_fn`` consumes (e.g. the
        stacked taste+attention vectors, K = 2*M*D, for mixture scoring).
    item_matrix : (N, D) float32
    item_bias : (N,) float32
    target_scores : (B, T) float32
        Already-computed scores of the target items (cheap: T gathers+dots).
    target_ids : (B, T) int32
        The targets' item ids (excluded from their own counts).
    tile_items : int
        Item rows staged per VMEM tile.
    score_fn : callable ((TILE, D), (K, B)) -> (TILE, B), optional
        Per-tile scoring function (default: MXU dot product).  Must be a
        stable (cached) callable — it keys the jit cache.

    Returns
    -------
    (greater, equal) : (B, T) float32 counts over the catalog *excluding the
        target itself*; the average-tie rank is
        ``greater + equal / 2 + 1``.

    Any target width is supported: the kernel loops over targets with a
    ``fori_loop`` on the sublane axis, so VMEM usage and compile time do not
    grow with T (the catalog is still read exactly once).
    """
    if tile_items is None:
        tile_items = _auto_tile_items(user_reprs.shape[0], budget=1 << 18)
    # Pad the target axis to the 8-sublane minimum *outside* the jitted
    # call: narrower blocks force degenerate layouts, and folding the pad
    # into the compiled program measured ~10x slower through the dev
    # tunnel than sharing the padded-width executable.
    orig_targets = target_scores.shape[1]
    pad_t = -orig_targets % 8
    if pad_t:
        target_scores = jnp.concatenate(
            [target_scores,
             jnp.repeat(target_scores[:, :1], pad_t, axis=1)], axis=1)
        target_ids = jnp.concatenate(
            [jnp.asarray(target_ids),
             jnp.repeat(jnp.asarray(target_ids)[:, :1], pad_t, axis=1)],
            axis=1)
    greater, equal = _rank_counts_call(
        user_reprs, item_matrix, item_bias, target_scores, target_ids,
        tile_items=tile_items, interpret=interpret,
        score_fn=score_fn or _dot_scores, real_targets=orig_targets)
    return greater[:, :orig_targets], equal[:, :orig_targets]


@functools.partial(jax.jit,
                   static_argnames=('tile_items', 'interpret', 'score_fn',
                                    'real_targets'))
def _rank_counts_call(user_reprs, item_matrix, item_bias, target_scores,
                      target_ids, tile_items=512, interpret=False,
                      score_fn=_dot_scores, real_targets=None):
    batch, user_rows = user_reprs.shape
    num_items, dim = item_matrix.shape
    num_targets = target_scores.shape[1]
    if real_targets is None:
        real_targets = num_targets

    padded_items = pl.cdiv(num_items, tile_items) * tile_items
    pad = padded_items - num_items
    if pad:
        item_matrix = jnp.concatenate(
            [item_matrix, jnp.zeros((pad, dim), item_matrix.dtype)])
        item_bias = jnp.concatenate(
            [item_bias, jnp.zeros((pad,), item_bias.dtype)])

    grid = (padded_items // tile_items,)
    kernel = functools.partial(_rank_count_kernel,
                               valid_items=num_items,
                               tile_items=tile_items,
                               score_fn=score_fn,
                               real_targets=real_targets)

    greater_t, equal_t = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((user_rows, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_items, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((num_targets, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((num_targets, batch), jnp.float32),
            jax.ShapeDtypeStruct((num_targets, batch), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * batch * user_rows * padded_items +
            2 * batch * num_targets * padded_items,
            bytes_accessed=padded_items * dim * 4 + batch * user_rows * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(user_reprs.T, target_scores.T, target_ids.astype(jnp.int32).T,
      item_matrix, item_bias[:, None])

    return greater_t.T, equal_t.T


def matched_target_scores(user_reprs, item_matrix, item_bias, safe_targets,
                          chunk=64):
    """Target scores computed with MXU-matmul arithmetic.

    The obvious ``einsum('bd,btd->bt')`` is lowered by XLA as a fused
    VPU reduction for small T, whose accumulation order differs from the
    MXU matmul the rank kernel uses by ~1 ulp — enough to flip an ``==``
    comparison into ``>`` on exact ties (measured: counts diverged at
    T<=16, matched at T=512 where the einsum lowers to a real matmul).
    Computing the target scores through an actual matmul keeps every score
    in the comparison bit-identical to the kernel's tile scores.

    Cost: B x T x B x D flops in T-chunks — ~0.1 ms at B=256, T=512, D=64,
    negligible next to the catalog stream.
    """
    batch, dim = user_reprs.shape
    num_targets = safe_targets.shape[1]
    users_t = user_reprs.T                                  # (D, B)
    lane = jnp.arange(batch)
    parts = []
    for start in range(0, num_targets, chunk):
        stop = min(start + chunk, num_targets)
        tgt = jax.lax.slice_in_dim(safe_targets, start, stop, axis=1)
        rows = item_matrix[tgt.reshape(-1)]                 # (B*C, D)
        # bf16 catalogs: the same exact-valued upcast the kernel tiles
        # apply (see _dot_scores), so ties stay bit-exact.
        rows = rows.astype(users_t.dtype)
        prod = jnp.dot(rows, users_t,
                       preferred_element_type=jnp.float32)  # (B*C, B)
        prod = prod.reshape(batch, stop - start, batch)
        diag = jnp.take_along_axis(
            prod, lane[:, None, None], axis=2)[..., 0]      # (B, C)
        parts.append(diag + item_bias[tgt])
    return jnp.concatenate(parts, axis=1)


def reciprocal_ranks_streaming(user_reprs, item_matrix, item_bias,
                               targets, target_mask, tile_items=512,
                               interpret=False):
    """Mean reciprocal rank per user via the streaming kernel.

    Parameters
    ----------
    user_reprs : (B, D)
    item_matrix : (N, D); item_bias : (N,)
    targets : (B, T) int item ids (clipped-gather on pads)
    target_mask : (B, T) bool

    Returns
    -------
    (B,) mean reciprocal (average-tie) rank over each row's valid targets.
    """
    safe_targets = jnp.clip(targets, 0, item_matrix.shape[0] - 1)
    target_scores = matched_target_scores(user_reprs, item_matrix,
                                          item_bias, safe_targets)

    greater, equal = rank_counts(user_reprs, item_matrix, item_bias,
                                 target_scores, safe_targets,
                                 tile_items=tile_items,
                                 interpret=interpret)
    # Self excluded from counts: rank = greater + (equal_incl_self + 1) / 2
    # with equal_incl_self = equal + 1.
    ranks = greater + equal * 0.5 + 1.0
    rr = jnp.where(target_mask, 1.0 / ranks, 0.0)
    denom = jnp.maximum(target_mask.sum(axis=1), 1)
    return rr.sum(axis=1) / denom


def _tile_scores_kernel(users_t_ref, rows_ref, bias_ref, out_ref, *,
                        score_fn):
    out_ref[:] = score_fn(rows_ref[:], users_t_ref[:]) + bias_ref[:]


@functools.partial(jax.jit,
                   static_argnames=('score_fn', 'tile_rows', 'interpret'))
def _candidate_scores_call(user_reprs, rows, bias, score_fn, tile_rows=None,
                           interpret=False):
    """Score gathered candidate rows against every user: (R, D) -> (R, B),
    through the same per-tile ``score_fn`` the streaming kernels use."""
    batch, user_rows = user_reprs.shape
    if tile_rows is None:
        tile_rows = _auto_tile_items(batch, budget=1 << 18)
    num_rows, dim = rows.shape
    padded = pl.cdiv(num_rows, tile_rows) * tile_rows
    pad = padded - num_rows
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((pad, dim), rows.dtype)])
        bias = jnp.concatenate([bias, jnp.zeros((pad, 1), bias.dtype)])
    out = pl.pallas_call(
        functools.partial(_tile_scores_kernel, score_fn=score_fn),
        grid=(padded // tile_rows,),
        in_specs=[
            pl.BlockSpec((user_rows, batch), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, dim), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_rows, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_rows, batch), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((padded, batch), jnp.float32),
        interpret=interpret,
    )(user_reprs.T, rows, bias)
    return out[:num_rows]


def matched_candidate_scores(user_reprs, item_matrix, item_bias,
                             candidates, score_fn, chunk=64,
                             tile_rows=None, interpret=False):
    """Per-user scores of candidate item ids for arbitrary scoring.

    Generalizes :func:`matched_target_scores` beyond dot products: the
    candidates' rows are gathered and scored by a Pallas kernel running
    the *same* ``score_fn`` as the streaming rank/top-k tiles, so every
    score is bit-identical to the tile score of the same (item, user) pair
    (matmul results are per-element deterministic on the MXU, and
    transcendentals come from the same Mosaic lowering — the tie-exactness
    requirement matched_target_scores documents for the dot case).

    Parameters
    ----------
    user_reprs : (B, K); candidates : (B, T) int

    Returns
    -------
    (B, T) float32 scores of candidate t for its own row's user.
    """
    batch = user_reprs.shape[0]
    num_targets = candidates.shape[1]
    lane = jnp.arange(batch)
    parts = []
    for start in range(0, num_targets, chunk):
        stop = min(start + chunk, num_targets)
        tgt = jax.lax.slice_in_dim(candidates, start, stop, axis=1)
        flat = tgt.reshape(-1)
        rows = item_matrix[flat]
        brows = item_bias[flat][:, None]
        scores = _candidate_scores_call(user_reprs, rows, brows, score_fn,
                                        tile_rows=tile_rows,
                                        interpret=interpret)
        scores = scores.reshape(batch, stop - start, batch)
        diag = jnp.take_along_axis(
            scores, lane[:, None, None], axis=2)[..., 0]
        parts.append(diag)
    return jnp.concatenate(parts, axis=1)
