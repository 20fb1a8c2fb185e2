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
