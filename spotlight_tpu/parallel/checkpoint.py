"""Sharded checkpointing of training state (orbax-backed).

The reference's only persistence is whole-object ``torch.save``
(`/root/reference/tests/test_serialization.py:29-30`), which requires
materializing every tensor on one host.  For row-sharded embedding tables
that is exactly what must be avoided: orbax writes each parameter shard from
the device that owns it and restores with the same (or a different) sharding
layout, so multi-host checkpoints never gather a table onto a single machine.

For small single-device models, :mod:`spotlight_tpu.utils.serialization`'s
pickle round-trip remains the simple path; this module is the scale path.

Usage::

    from spotlight_tpu.parallel import checkpoint

    checkpoint.save_state(path, model)           # params + opt state + key
    checkpoint.restore_state(path, model)        # in-place restore
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np


def _checkpointer():
    import orbax.checkpoint as ocp
    return ocp.PyTreeCheckpointer()


def _state_dict(model):
    return {
        'params': model._params,
        'opt_state': model._opt_state,
        'key': model._key,
    }


def save_state(path, model, force=True):
    """Write the model's training state (parameters, optimizer moments,
    PRNG key) as an orbax checkpoint.  Sharded arrays are written
    shard-by-shard from their owning devices."""
    path = os.path.abspath(path)
    if not model._initialized:
        raise ValueError('Cannot checkpoint an unfitted model.')
    _checkpointer().save(path, _state_dict(model), force=force)
    return path


def restore_state(path, model):
    """Restore training state in place.

    The model must already be initialized (so the parameter tree structure,
    shardings, and optimizer exist); array values are replaced with the
    checkpointed ones, placed according to the model's current shardings —
    which may differ from the shardings at save time (reshard-on-restore).

    Cross-layout restores are supported even when the *padded* table
    shapes differ (padding depends on the model-axis shard count): an
    8-shard checkpoint loads onto 4-shard, 2-shard, 1-device, and
    unsharded layouts and vice versa.  Leading-dimension differences are
    reconciled by stripping / re-applying shard padding — provably exact,
    because block sharding keeps real rows at ``[0, num_embeddings)`` in
    every layout and padding rows are all-zero (verified before any row is
    dropped).  Any other shape difference raises.
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not model._initialized:
        raise ValueError('Initialize the model (e.g. via fit on one batch '
                         'or _initialize) before restoring.')

    template = _state_dict(model)
    checkpointer = _checkpointer()
    meta_tree = checkpointer.metadata(path).item_metadata.tree

    if _shapes_match(meta_tree, template):
        def restore_args(value):
            if isinstance(value, jax.Array) and hasattr(value, 'sharding'):
                return ocp.ArrayRestoreArgs(sharding=value.sharding)
            return ocp.RestoreArgs()

        args = jax.tree_util.tree_map(restore_args, template)
        restored = checkpointer.restore(
            path, item=template, restore_args=args)
    else:
        # Shape mismatch (table padding depends on the shard count):
        # reconcile the layouts leaf by leaf.  Detected from metadata up
        # front — orbax's direct restore does not validate stored shapes
        # against the template and would happily hand back a
        # differently-padded table.
        restored = _restore_cross_layout(checkpointer, path, template,
                                         meta_tree)

    model._params = restored['params']
    model._opt_state = restored['opt_state']
    model._key = jax.numpy.asarray(np.asarray(restored['key']))
    return model


def _shapes_match(meta_tree, template):
    """True when every checkpoint leaf's stored shape equals the model's.

    A checkpoint whose tree *structure* differs from the model's (e.g. a
    dense optax optimizer state restored onto a ``sparse=True`` model's
    ``{mu, nu, t}`` state, or vice versa) cannot be reconciled at all —
    raise a clear error instead of letting orbax's tree mapping surface
    an opaque ``KeyError`` deep inside ``deserialize_tree``.
    """
    import orbax.checkpoint as ocp

    try:
        meta_on_template = ocp.tree.deserialize_tree(meta_tree,
                                                     target=template)
        metas = jax.tree_util.tree_leaves(meta_on_template)
    except Exception as error:
        raise ValueError(
            'Checkpoint structure does not match the model ({!r}). The '
            'checkpoint was saved from a different engine configuration '
            '(e.g. sparse=True vs a dense optax optimizer state, or a '
            'different representation); construct the model with the '
            'same settings it was saved with before restoring.'
            .format(error)) from error
    # deserialize_tree yields the template's structure on success, so the
    # leaf counts always agree here; structural mismatches raise above.
    leaves = jax.tree_util.tree_leaves(template)
    return all(tuple(meta.shape) == tuple(leaf.shape)
               for meta, leaf in zip(metas, leaves))


def _restore_cross_layout(checkpointer, path, template, meta_tree):
    """Restore a checkpoint whose padded table shapes differ from the
    model's.

    The checkpoint is read to host numpy (topology-independent), mapped
    back onto the template's tree structure by name
    (``orbax.checkpoint.tree.deserialize_tree``), and each leaf's leading
    dimension is sliced or zero-padded to the template's.  Dropped rows
    must be exactly zero — real rows always occupy ``[0, num_embeddings)``
    under block sharding, and shard-padding rows are zero-initialized and
    receive no updates (zero gradients keep Adam deltas at exactly zero) —
    so a non-zero dropped row means the checkpoint genuinely does not fit
    and raises instead of silently truncating state.
    """
    import orbax.checkpoint as ocp

    as_numpy = jax.tree_util.tree_map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta_tree)
    raw = checkpointer.restore(path, restore_args=as_numpy)
    loaded = ocp.tree.deserialize_tree(raw, target=template)

    def adapt(value, like):
        value = np.asarray(value)
        like_shape = tuple(like.shape)
        if value.shape != like_shape:
            if (value.ndim != like.ndim or value.ndim < 1
                    or value.shape[1:] != like_shape[1:]):
                raise ValueError(
                    'Checkpoint leaf of shape {} cannot be adapted to {}: '
                    'only leading-dimension (shard padding) differences '
                    'are reconcilable.'.format(value.shape, like_shape))
            rows = like_shape[0]
            if value.shape[0] > rows:
                dropped = value[rows:]
                if np.any(dropped):
                    raise ValueError(
                        'Cross-layout restore would drop non-zero rows '
                        '({} -> {}): the checkpoint holds more real rows '
                        'than the model.'.format(value.shape, like_shape))
                value = value[:rows]
            else:
                value = np.concatenate(
                    [value, np.zeros((rows - value.shape[0],)
                                     + value.shape[1:], value.dtype)])
        value = value.astype(like.dtype)
        if isinstance(like, jax.Array) and hasattr(like, 'sharding'):
            return jax.device_put(value, like.sharding)
        return jnp.asarray(value)

    return jax.tree_util.tree_map(adapt, loaded, template)
