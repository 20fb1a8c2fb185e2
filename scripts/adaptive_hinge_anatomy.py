"""Round-5 probe: where the bpr -> adaptive_hinge throughput gap goes.

`bench_suite_r04.json`: bpr 6.70M examples/s vs adaptive_hinge 5.35M
(-20%) at the identical config.  k=5 negatives ride the fused
concatenated gather, so naive cost scaling does not explain it; this
probe isolates the terms through the real estimator fit path:

- bpr -> hinge           : loss-form cost at the same 1-negative shape
- hinge -> ah(k=1)       : the adaptive max-over-negatives structure
                           (tiling, max reduce) at width 1
- ah(k=1) -> ah(3) -> ah(5): the per-negative width cost (gather bytes,
                           scatter-add width in the backward)

Methodology: bench.py's — warm-up fit, then best-of-2 timed 4-epoch fits
(the scan pipelines steps; the fit's readback is data-dependent).
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '.')


def main():
    from spotlight_tpu.data import Interactions
    from spotlight_tpu.factorization import ImplicitFactorizationModel

    rs = np.random.RandomState(42)
    n = 1_000_000
    interactions = Interactions(
        rs.randint(0, 100_000, n).astype(np.int64),
        rs.randint(0, 20_000, n).astype(np.int64),
        num_users=100_000, num_items=20_000)

    configs = [
        ('bpr', dict(loss='bpr')),
        ('hinge', dict(loss='hinge')),
        ('adaptive_hinge_k1', dict(loss='adaptive_hinge',
                                   num_negative_samples=1)),
        ('adaptive_hinge_k3', dict(loss='adaptive_hinge',
                                   num_negative_samples=3)),
        ('adaptive_hinge_k5', dict(loss='adaptive_hinge',
                                   num_negative_samples=5)),
    ]
    epochs = 4
    for name, cfg in configs:
        model = ImplicitFactorizationModel(
            embedding_dim=64, n_iter=1, batch_size=8192,
            random_state=np.random.RandomState(42), **cfg)
        model.fit(interactions)     # warm-up + compile
        model._n_iter = epochs
        best = float('inf')
        for _ in range(2):
            start = time.perf_counter()
            model.fit(interactions)
            best = min(best, time.perf_counter() - start)
        rate = epochs * n / best
        print(json.dumps(dict(
            metric='step_anatomy_{}'.format(name),
            examples_per_s=round(rate / 1e3) * 1e3,
            ms_per_epoch=round(best / epochs * 1e3, 1))), flush=True)
        if name == 'bpr':
            # Health gate: the bpr fit is the bench.py headline
            # (6.5-6.7M examples/s healthy) — a sick window shows here.
            assert rate > 5e6, 'training path looks sick ({:.2f}M ex/s); ' \
                'rerun'.format(rate / 1e6)
        del model


if __name__ == '__main__':
    main()
