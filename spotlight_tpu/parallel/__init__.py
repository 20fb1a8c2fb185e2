"""Multi-chip parallelism: device meshes, sharded embedding tables,
distributed training steps and evaluation.

The reference is strictly single-device (SURVEY.md §2.2); this package is the
TPU-native scaling design that replaces it:

- dense model towers are replicated and run **data-parallel** over the
  ``'data'`` mesh axis, with one gradient ``psum``;
- user/item embedding tables — the memory giants of a recommender — are
  **row-sharded** over the ``'model'`` mesh axis; lookups gather locally-owned
  rows and combine partial results with a ``psum`` over the model axis
  (Megatron-style vocab-parallel embedding), which XLA lowers to ICI
  collectives;
- full-catalog evaluation keeps item shards local, scoring each shard on its
  owner and merging via collective matmul layouts.
"""

from spotlight_tpu.parallel import checkpoint  # noqa: F401
from spotlight_tpu.parallel import multihost  # noqa: F401
from spotlight_tpu.parallel.evaluation import (  # noqa: F401
    sharded_candidate_scores,
    sharded_rank_counts,
    sharded_rank_weights,
    sharded_topk,
)
from spotlight_tpu.parallel.mesh import make_mesh  # noqa: F401
from spotlight_tpu.parallel.sharding import (  # noqa: F401
    ShardedBloomEmbedding,
    ShardedEmbedding,
    shard_params,
)
