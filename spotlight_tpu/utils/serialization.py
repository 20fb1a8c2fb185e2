"""Model serialization.

The reference round-trips whole estimators with ``torch.save``/``torch.load``
(`/root/reference/tests/test_serialization.py:23-35`), preserving parameters
*and* optimizer state so that training can resume after reload.  Here the
same contract is provided by pickling the estimator: parameters, optimizer
moments, and the PRNG key are converted to host numpy arrays on save and
restored on load, while unpicklable runtime artefacts (jitted functions, the
optax transformation's closures) are dropped and rebuilt lazily.

Usage::

    from spotlight_tpu.utils import serialization
    serialization.save(model, 'model.pkl')
    model = serialization.load('model.pkl')

For sharded multi-host checkpoints of large embedding tables, use
:mod:`spotlight_tpu.parallel` checkpoint helpers (orbax-backed) instead.
"""

from __future__ import annotations

import pickle

import jax
import numpy as np


def to_host(tree):
    """Convert every jax array in a pytree to numpy."""
    return jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, 'device') or hasattr(
            x, 'devices') else x, tree)


# Runtime artefacts that cannot (and need not) be pickled; rebuilt lazily.
_UNPICKLABLE_FIELDS = (
    '_optimizer',          # optax transformation (closures)
    '_predict_pairs_fn',   # cached jitted functions
    '_score_catalog_fn',
    '_catalog_fn',
    '_epoch_fn_cache',
    '_rank_factors_jit',
    '_item_factor_cache',
    '_placed_data_cache',  # device-resident epoch data (fit-to-fit reuse)
    '_mesh',               # holds live device objects; re-set after load to
                           # resume distributed training on a new mesh
)


class SerializableEstimatorMixin:
    """Pickle support for estimators: host-side arrays, rebuilt jit caches."""

    def __getstate__(self):
        state = {key: value for key, value in self.__dict__.items()
                 if key not in _UNPICKLABLE_FIELDS}
        state['_had_optimizer'] = self.__dict__.get(
            '_optimizer') is not None
        return to_host(state)

    def __setstate__(self, state):
        had_optimizer = state.pop('_had_optimizer', False)
        self.__dict__.update(state)
        self.__dict__['_epoch_fn_cache'] = {}
        self.__dict__['_optimizer'] = None
        self.__dict__['_mesh'] = None
        if had_optimizer:
            from spotlight_tpu.utils import training
            self.__dict__['_optimizer'] = training.make_optimizer(
                self._learning_rate, self._l2, self._optimizer_func)


def save(model, path_or_file):
    """Serialize a fitted (or unfitted) estimator to a file."""
    if hasattr(path_or_file, 'write'):
        pickle.dump(model, path_or_file)
    else:
        with open(path_or_file, 'wb') as fh:
            pickle.dump(model, fh)


def load(path_or_file):
    """Load an estimator serialized with :func:`save`."""
    if hasattr(path_or_file, 'read'):
        return pickle.load(path_or_file)
    with open(path_or_file, 'rb') as fh:
        return pickle.load(fh)
