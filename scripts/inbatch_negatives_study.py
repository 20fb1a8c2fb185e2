"""Uniform vs in-batch negatives on popularity-skewed data.

The in-batch option (docs/performance.md "In-batch negatives") trades
uniform negatives for the batch's empirical item-popularity distribution.
On the uniform-popularity synthetic fixtures it costs accuracy (gates in
tests/test_inbatch_negatives.py); this study measures both samplers on
the Amazon-like fixture (`data/fixtures.generate_amazon_like`), whose
item popularity is Zipf (exponent ~1.05) like the real SNAP set — the
regime popularity-weighted negatives are designed for.

    python scripts/inbatch_negatives_study.py
"""

import json
import sys
import time

import numpy as np

sys.path.insert(0, '/root/repo')

from spotlight_tpu.data import Interactions, random_train_test_split
from spotlight_tpu.data.fixtures import generate_amazon_like
from spotlight_tpu.evaluation import mrr_score
from spotlight_tpu.factorization import ImplicitFactorizationModel


def main():
    columns = generate_amazon_like()
    raw_users = columns['user_id']
    raw_items = columns['item_id']
    # Contiguous remap (what get_amazon_dataset does via searchsorted).
    uniq_users = np.unique(raw_users)
    uniq_items = np.unique(raw_items)
    users = np.searchsorted(uniq_users, raw_users).astype(np.int64)
    items = np.searchsorted(uniq_items, raw_items).astype(np.int64)
    interactions = Interactions(users, items,
                                num_users=len(uniq_users),
                                num_items=len(uniq_items))
    train, test = random_train_test_split(
        interactions, random_state=np.random.RandomState(0))

    for sampler in ('uniform', 'in_batch'):
        mrrs = []
        rates = []
        for seed in (42, 43, 44):
            model = ImplicitFactorizationModel(
                loss='bpr', embedding_dim=64, n_iter=15, batch_size=1024,
                negative_sampling=sampler,
                random_state=np.random.RandomState(seed))
            model.fit(train)  # includes compile
            start = time.perf_counter()
            model._n_iter = 5
            model.fit(train)
            elapsed = time.perf_counter() - start
            rates.append(5 * len(train.user_ids) / elapsed)
            mrrs.append(float(mrr_score(model, test, train=train).mean()))
        print(json.dumps({
            'sampler': sampler,
            'test_mrr_mean': round(float(np.mean(mrrs)), 4),
            'test_mrr_runs': [round(m, 4) for m in mrrs],
            'examples_per_s': round(float(np.mean(rates)), 0),
        }), flush=True)


if __name__ == '__main__':
    main()
