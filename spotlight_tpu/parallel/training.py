"""Distributed training engine: one jitted epoch over a device mesh.

Parallelism layout (the BASELINE.json north star):

- the minibatch axis is sharded over ``'data'``;
- embedding tables are row-sharded over ``'model'`` (lookups psum partial
  rows, see :mod:`spotlight_tpu.parallel.sharding`); dense parameters are
  replicated;
- gradients take one ``psum`` over ``'data'``; table gradients stay local to
  their owning model shard (the lookup's psum transposes to identity);
- the masked-mean loss divides each shard's local loss sum by the *global*
  mask count (``psum('data')``), so the distributed loss and gradients equal
  the single-device ones exactly — which is how the 8-virtual-device CPU
  tests assert correctness.

The optimizer update runs inside ``shard_map``: Adam's elementwise moments
act on local table shards directly, so optimizer state is sharded exactly
like the parameters and no parameter ever needs to be materialized whole.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import optax
from jax.sharding import PartitionSpec as P

from jax import shard_map


def opt_specs_like(opt_state, params, param_specs):
    """Build a PartitionSpec tree for optimizer state by structure-matching
    against the parameter tree.

    Optimizer moments (Adam's mu/nu) are pytrees with exactly the
    parameters' structure and inherit the parameters' specs wholesale;
    every other subtree (step counts, empty states) replicates.  Matching
    on tree *structure* (not leaf shapes) cannot mis-shard a dense
    parameter that coincidentally shares a table's shape.
    """
    params_treedef = jax.tree_util.tree_structure(params)

    def is_params_like(subtree):
        try:
            return (jax.tree_util.tree_structure(subtree) ==
                    params_treedef)
        except Exception:
            return False

    def assign(subtree):
        if is_params_like(subtree):
            return param_specs
        return jax.tree_util.tree_map(lambda _: P(), subtree)

    return jax.tree_util.tree_map(assign, opt_state,
                                  is_leaf=is_params_like)


def epoch_scan_distributed(params, opt_state, key, data, n_valid,
                           num_batches, batch_size, elems_fn, optimizer,
                           mesh, param_specs, opt_specs, exchange='psum'):
    """Distributed analogue of :func:`spotlight_tpu.utils.training.epoch_scan`.

    Parameters
    ----------
    elems_fn : callable(params, batch, key) -> (elementwise_loss, mask)
        Both outputs have identical shape; the engine performs the global
        masked-mean reduction.
    param_specs, opt_specs : PartitionSpec trees for params / opt state.
    exchange : 'psum' (default) or 'alltoall'
        Must match the :class:`ShardedEmbedding` exchange mode.  The psum
        mode runs under vma-aware shard_map (gradient reductions inserted
        by the AD transpose).  The all-to-all mode cannot typecheck under
        vma (its output is replicated in value but typed varying), so it
        runs with ``check_vma=False`` and performs the gradient calculus
        manually:

        - the per-replica loss is divided by the model-axis size: every
          model shard computes the identical loss, and each one's backward
          sends cotangents through the reversed all-to-all to the owning
          table shard, which therefore accumulates ``model_size`` copies;
        - table gradients then need only the data-axis psum; replicated
          (dense) gradients need the psum over both axes.
    """
    from spotlight_tpu.utils.training import shuffle_and_batch

    perm_key, negatives_key = jax.random.split(key)
    batched = shuffle_and_batch(perm_key, data, n_valid, num_batches,
                                batch_size)
    batch_keys = jax.random.split(negatives_key, num_batches)

    # Capacity-factored exchange shards the batch over BOTH axes: each
    # device computes the loss on its own batch sub-slice (no redundant
    # per-model-shard recomputation) and its lookups exchange only
    # per-owner buckets.
    cf = exchange == 'alltoall_cf'
    batch_axes = ('data', 'model') if cf else 'data'
    batch_specs = {name: P(batch_axes) for name in batched}
    model_size = mesh.shape.get('model', 1)

    def _psum_grads_by_spec(grads):
        """Per-parameter gradient reduction for the all-to-all modes."""
        def reduce_one(grad, spec):
            sharded_over_model = any(
                axis == 'model'
                for axis in jax.tree_util.tree_leaves(tuple(spec)))
            if sharded_over_model:
                return jax.lax.psum(grad, 'data')
            return jax.lax.psum(grad, ('data', 'model'))

        return jax.tree_util.tree_map(
            reduce_one, grads, param_specs,
            is_leaf=lambda x: isinstance(x, P))

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(param_specs, opt_specs, batch_specs, P()),
        out_specs=(param_specs, opt_specs, P()),
        check_vma=(exchange == 'psum'))
    def sharded_step(params, opt_state, batch, batch_key):
        # Distinct negative-sampling stream per batch shard.
        shard_key = jax.random.fold_in(
            batch_key, jax.lax.axis_index('data'))
        if cf:
            shard_key = jax.random.fold_in(
                shard_key, jax.lax.axis_index('model'))

        def local_loss(params):
            elems, mask = elems_fn(params, batch, shard_key)
            mask = mask.astype(elems.dtype)
            global_count = jax.lax.psum(jnp.sum(mask), batch_axes)
            loss = jnp.sum(elems * mask) / jnp.maximum(global_count, 1.0)
            if exchange == 'alltoall':
                # Every model shard recomputes the same loss; divide so
                # each owner row's cotangent arrives model_size times but
                # sums to the true gradient.
                loss = loss / model_size
            return loss

        local, grads = jax.value_and_grad(local_loss)(params)

        if exchange == 'alltoall':
            grads = _psum_grads_by_spec(grads)
            loss = jax.lax.psum(local, 'data') * model_size
        elif cf:
            # Batch rows exist once globally: table-row cotangents arrive
            # exactly once through the reversed exchange (within the model
            # axis); only the data-axis replicas of each table shard — and
            # both axes for replicated dense params — need reducing.
            grads = _psum_grads_by_spec(grads)
            loss = jax.lax.psum(local, ('data', 'model'))
        else:
            # With vma-aware shard_map (check_vma=True), params are marked
            # invariant over 'data'; jax.grad's transpose then inserts the
            # gradient psum over 'data' automatically — adding an explicit
            # one would double-count.
            loss = jax.lax.psum(local, 'data')

        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def step(carry, batch_and_key):
        params, opt_state = carry
        batch, batch_key = batch_and_key
        params, opt_state, loss = sharded_step(params, opt_state, batch,
                                               batch_key)
        return (params, opt_state), loss

    (params, opt_state), losses = jax.lax.scan(
        step, (params, opt_state), (batched, batch_keys))
    return params, opt_state, jnp.mean(losses)
