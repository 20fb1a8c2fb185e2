"""spotlight_tpu — a TPU-native recommender framework.

A from-scratch JAX/XLA/Pallas implementation of deep and shallow recommender
models with the capabilities of maciejkula/spotlight: explicit and implicit
matrix factorization, sequence models (pooling / causal CNN / LSTM /
mixture-of-tastes), bloom-compressed embeddings, interaction data pipelines,
and full-catalog ranking evaluation — built TPU-first:

- training epochs compile to a single ``lax.scan`` over minibatches; shuffling
  and negative sampling happen on device,
- evaluation is batched full-catalog scoring on the MXU,
- embedding tables can be row-sharded across a device mesh with collective
  lookups (see :mod:`spotlight_tpu.parallel`),
- hot kernels have Pallas implementations (see :mod:`spotlight_tpu.ops.kernels`).
"""

__version__ = '0.1.0'


def __getattr__(name):
    """Convenience top-level access to the main estimators and data types
    (submodule imports, reference-style, remain the canonical paths)."""
    from importlib import import_module

    homes = {
        'ExplicitFactorizationModel': 'spotlight_tpu.factorization',
        'ImplicitFactorizationModel': 'spotlight_tpu.factorization',
        'BilinearNet': 'spotlight_tpu.factorization',
        'ImplicitSequenceModel': 'spotlight_tpu.sequence',
        'Interactions': 'spotlight_tpu.data',
        'SequenceInteractions': 'spotlight_tpu.data',
    }
    if name in homes:
        return getattr(import_module(homes[name]), name)
    raise AttributeError(
        'module {!r} has no attribute {!r}'.format(__name__, name))
