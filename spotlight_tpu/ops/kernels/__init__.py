"""Pallas TPU kernels for the framework's hot paths.

- :func:`~spotlight_tpu.ops.kernels.ranking.rank_weights` — fused catalog
  scoring + combined average-tie rank weights (the lean production MRR
  kernel; requires matched target scores).
- :func:`~spotlight_tpu.ops.kernels.ranking.rank_counts` /
  :func:`~spotlight_tpu.ops.kernels.ranking.reciprocal_ranks_streaming` —
  separate (greater, equal) counts with id-based self-exclusion (1-ulp
  robust general form).
- :func:`~spotlight_tpu.ops.kernels.topk.streaming_topk` — fused scoring +
  exact running top-k (precision@k fast path).
- :func:`~spotlight_tpu.ops.kernels.bloom.bloom_gather_sum` — multi-hash
  bloom gather with pipelined row DMAs (benchmarked alternative to the XLA
  gather; see docs/kernels.md).
- :func:`~spotlight_tpu.ops.kernels.multihot.multihot_gather_sum` — bloom
  gather+sum as a multi-hot MXU matmul with the transposed-matmul backward
  (benchmarked alternative; the gather/scatter engines win at realistic
  table sizes — docs/performance.md).
"""

from spotlight_tpu.ops.kernels.bloom import bloom_gather_sum  # noqa: F401
from spotlight_tpu.ops.kernels.multihot import (  # noqa: F401
    multihot_gather_sum,
)
from spotlight_tpu.ops.kernels.ranking import (  # noqa: F401
    rank_counts,
    rank_weights,
    reciprocal_ranks_streaming,
)
from spotlight_tpu.ops.kernels.topk import streaming_topk  # noqa: F401
