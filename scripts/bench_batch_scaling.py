"""Batch-size scaling of the headline bench config, both stacks.

Round-2 step-cost work (docs/performance.md) made per-step fixed costs
(Adam sweep + scan floor, ~0.65 ms of a ~1.1 ms step) the dominant term at
batch 8192, so larger batches should now amortize them.  This script
measures the identical implicit-MF config at several batch sizes on both
sides — ours on the default jax platform (TPU under the driver), the
reference on torch CPU — to pick `bench.py`'s headline configuration on
data rather than habit.

Run:  timeout 1800 python scripts/bench_batch_scaling.py
"""

import importlib.util
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

spec = importlib.util.spec_from_file_location(
    'bench', os.path.join(REPO, 'bench.py'))
bench = importlib.util.module_from_spec(spec)
spec.loader.exec_module(bench)

BATCH_SIZES = (8192, 32768, 131072)


def measure_ref_at(batch_size):
    key = 'implicit_mf_bpr_d{}_b{}_n{}'.format(
        bench.EMBEDDING_DIM, batch_size, bench.NUM_INTERACTIONS)
    cache = {}
    if os.path.exists(bench.BASELINE_CACHE):
        with open(bench.BASELINE_CACHE) as fh:
            cache = json.load(fh)
    if key in cache:
        return cache[key]

    sys.path.insert(0, '/root/reference')
    try:
        from spotlight.factorization.implicit import (
            ImplicitFactorizationModel as RefModel)
        from spotlight.interactions import Interactions as RefInteractions
    finally:
        sys.path.pop(0)

    n = 200_000
    user_ids, item_ids = bench._make_data(n)
    interactions = RefInteractions(user_ids.astype(np.int32),
                                   item_ids.astype(np.int32),
                                   num_users=bench.NUM_USERS,
                                   num_items=bench.NUM_ITEMS)
    model = RefModel(loss=bench.LOSS, embedding_dim=bench.EMBEDDING_DIM,
                     n_iter=1, batch_size=batch_size,
                     learning_rate=bench.LEARNING_RATE, use_cuda=False,
                     random_state=np.random.RandomState(42))
    model.fit(interactions)
    start = time.perf_counter()
    model.fit(interactions)
    rate = n / (time.perf_counter() - start)
    cache[key] = rate
    with open(bench.BASELINE_CACHE, 'w') as fh:
        json.dump(cache, fh)
    return rate


def main():
    for batch_size in BATCH_SIZES:
        bench.BATCH_SIZE = batch_size
        ours = bench.measure_ours()
        ref = measure_ref_at(batch_size)
        print(json.dumps({
            'batch_size': batch_size,
            'ours_examples_per_s': round(ours, 1),
            'reference_examples_per_s': round(ref, 1),
            'vs_baseline': round(ours / ref, 2),
        }), flush=True)


if __name__ == '__main__':
    main()
