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
    """
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if not model._initialized:
        raise ValueError('Initialize the model (e.g. via fit on one batch '
                         'or _initialize) before restoring.')

    template = _state_dict(model)

    def restore_args(value):
        if isinstance(value, jax.Array) and hasattr(value, 'sharding'):
            return ocp.ArrayRestoreArgs(sharding=value.sharding)
        return ocp.RestoreArgs()

    args = jax.tree_util.tree_map(restore_args, template)
    try:
        restored = _checkpointer().restore(
            path, item=template, restore_args=args)
    except ValueError as error:
        # Table padding depends on the shard count, so checkpoints only
        # restore onto layouts with identical global shapes.
        raise ValueError(
            'Checkpoint shape mismatch (table padding depends on the shard '
            'count; restore onto a mesh whose model-axis size yields the '
            'same padded table sizes): {}'.format(error)) from error

    model._params = restored['params']
    model._opt_state = restored['opt_state']
    model._key = jax.numpy.asarray(np.asarray(restored['key']))
    return model
