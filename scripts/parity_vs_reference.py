"""Accuracy parity: our models vs the actual reference implementation on
identical data.

Generates one synthetic Markov dataset, splits it once, and trains both
stacks (reference = maciejkula/spotlight, torch CPU, from /root/reference)
with the same hyperparameters, comparing test MRR.  Prints a markdown table
(docs/parity.md is produced from this).

    python scripts/parity_vs_reference.py
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update('jax_platforms', 'cpu')  # same hardware for both stacks

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(1, '/root/reference')


def build_datasets():
    from spotlight_tpu.data import user_based_train_test_split
    from spotlight_tpu.data.synthetic import generate_sequential

    interactions = generate_sequential(
        num_users=100, num_items=100, num_interactions=10000,
        concentration_parameter=1e-3, order=2,
        random_state=np.random.RandomState(42))
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(42))
    ours_train = train.to_sequence(max_sequence_length=10)
    ours_test = test.to_sequence(max_sequence_length=10)

    from spotlight.interactions import Interactions as RefInteractions

    ref_train = RefInteractions(
        train.user_ids.astype(np.int32), train.item_ids.astype(np.int32),
        timestamps=train.timestamps.astype(np.int64),
        num_users=train.num_users, num_items=train.num_items
    ).to_sequence(max_sequence_length=10)
    ref_test = RefInteractions(
        test.user_ids.astype(np.int32), test.item_ids.astype(np.int32),
        timestamps=test.timestamps.astype(np.int64),
        num_users=test.num_users, num_items=test.num_items
    ).to_sequence(max_sequence_length=10)

    assert np.array_equal(ours_train.sequences, ref_train.sequences), \
        'sequence pipelines diverge'
    return ours_train, ours_test, ref_train, ref_test


CONFIGS = [
    # (label, representation, loss, n_iter, lr, l2)
    ('pooling/bpr', 'pooling', 'bpr', 8, 1e-1, 1e-9),
    ('lstm/bpr', 'lstm', 'bpr', 25, 1e-2, 1e-7),
    ('lstm/adaptive_hinge', 'lstm', 'adaptive_hinge', 25, 1e-2, 1e-7),
    ('cnn/bpr', 'cnn', 'bpr', 25, 1e-2, 0.0),
    ('mixture/bpr', 'mixture', 'bpr', 40, 1e-2, 1e-7),
]


def run_ours(train, test, rep, loss, n_iter, lr, l2):
    from spotlight_tpu.evaluation import sequence_mrr_score
    from spotlight_tpu.sequence import ImplicitSequenceModel

    model = ImplicitSequenceModel(
        loss=loss, representation=rep, embedding_dim=32, batch_size=128,
        learning_rate=lr, l2=l2, n_iter=n_iter,
        random_state=np.random.RandomState(42))
    start = time.time()
    model.fit(train)
    elapsed = time.time() - start
    return float(sequence_mrr_score(model, test).mean()), elapsed


def run_reference(train, test, rep, loss, n_iter, lr, l2):
    from spotlight.evaluation import sequence_mrr_score
    from spotlight.sequence.implicit import ImplicitSequenceModel

    model = ImplicitSequenceModel(
        loss=loss, representation=rep, embedding_dim=32, batch_size=128,
        learning_rate=lr, l2=l2, n_iter=n_iter, use_cuda=False,
        random_state=np.random.RandomState(42))
    start = time.time()
    model.fit(train)
    elapsed = time.time() - start
    return float(sequence_mrr_score(model, test).mean()), elapsed


def factorization_parity():
    """Implicit + explicit MF on identical low-rank interaction data."""
    from spotlight_tpu.data import random_train_test_split
    from spotlight_tpu.data.synthetic import generate_factorization

    from spotlight.interactions import Interactions as RefInteractions

    def to_ref(split):
        return RefInteractions(
            split.user_ids.astype(np.int32),
            split.item_ids.astype(np.int32),
            ratings=(None if split.ratings is None
                     else split.ratings.astype(np.float32)),
            num_users=split.num_users, num_items=split.num_items)

    implicit = generate_factorization(
        num_users=600, num_items=400, num_interactions=30000, rank=8,
        noise=0.15, random_state=np.random.RandomState(42))
    train, test = random_train_test_split(
        implicit, random_state=np.random.RandomState(0))

    for loss in ('bpr', 'adaptive_hinge', 'pointwise'):
        from spotlight.evaluation import mrr_score as ref_mrr_score
        from spotlight.factorization.implicit import (
            ImplicitFactorizationModel as RefImplicit)

        from spotlight_tpu.evaluation import mrr_score
        from spotlight_tpu.factorization import ImplicitFactorizationModel

        kwargs = dict(loss=loss, embedding_dim=32, n_iter=15,
                      batch_size=1024, learning_rate=1e-2, l2=1e-6)
        ref = RefImplicit(use_cuda=False,
                          random_state=np.random.RandomState(42), **kwargs)
        start = time.time()
        ref.fit(to_ref(train))
        ref_s = time.time() - start
        ref_mrr = float(ref_mrr_score(ref, to_ref(test),
                                      train=to_ref(train)).mean())

        ours = ImplicitFactorizationModel(
            random_state=np.random.RandomState(42), **kwargs)
        start = time.time()
        ours.fit(train)
        our_s = time.time() - start
        our_mrr = float(mrr_score(ours, test, train=train).mean())

        print('| implicit-mf/{} | {:.4f} | {:.4f} | {:.1f} | {:.1f} |'
              .format(loss, ref_mrr, our_mrr, ref_s, our_s), flush=True)

    explicit = generate_factorization(
        num_users=600, num_items=400, num_interactions=30000, rank=8,
        noise=0.15, explicit=True, random_state=np.random.RandomState(42))
    etrain, etest = random_train_test_split(
        explicit, random_state=np.random.RandomState(0))

    from spotlight.evaluation import rmse_score as ref_rmse_score
    from spotlight.factorization.explicit import (
        ExplicitFactorizationModel as RefExplicit)

    from spotlight_tpu.evaluation import rmse_score
    from spotlight_tpu.factorization import ExplicitFactorizationModel

    kwargs = dict(loss='regression', embedding_dim=32, n_iter=15,
                  batch_size=1024, learning_rate=1e-2, l2=1e-6)
    ref = RefExplicit(use_cuda=False,
                      random_state=np.random.RandomState(42), **kwargs)
    start = time.time()
    ref.fit(to_ref(etrain))
    ref_s = time.time() - start
    ref_rmse = float(ref_rmse_score(ref, to_ref(etest)))

    ours = ExplicitFactorizationModel(
        random_state=np.random.RandomState(42), **kwargs)
    start = time.time()
    ours.fit(etrain)
    our_s = time.time() - start
    our_rmse = float(rmse_score(ours, etest))
    print('| explicit-mf/regression (RMSE, lower better) | {:.4f} | {:.4f} '
          '| {:.1f} | {:.1f} |'.format(ref_rmse, our_rmse, ref_s, our_s),
          flush=True)


def main():
    ours_train, ours_test, ref_train, ref_test = build_datasets()
    print('| config | reference | ours | reference fit (s) '
          '| ours fit (s) |', flush=True)
    print('|---|---|---|---|---|', flush=True)
    for label, rep, loss, n_iter, lr, l2 in CONFIGS:
        ref_mrr, ref_s = run_reference(ref_train, ref_test, rep, loss,
                                       n_iter, lr, l2)
        our_mrr, our_s = run_ours(ours_train, ours_test, rep, loss,
                                  n_iter, lr, l2)
        print('| {} | {:.4f} | {:.4f} | {:.1f} | {:.1f} |'.format(
            label, ref_mrr, our_mrr, ref_s, our_s),
            flush=True)
    factorization_parity()


if __name__ == '__main__':
    main()
