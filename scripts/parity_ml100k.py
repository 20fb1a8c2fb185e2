"""Head-to-head vs the reference at MovieLens-100K scale.

Feeds the *identical* ML-100K-scale fixture
(:mod:`spotlight_tpu.data.fixtures`) to both stacks — the reference
(torch CPU, `/root/reference`) and spotlight_tpu — with the reference CI's
own hyperparameters (`/root/reference/tests/factorization/test_implicit.py`,
`test_explicit.py`), and prints test-set MRR / RMSE side by side.

Both sides split with ``random_train_test_split(random_state=
RandomState(42))``; the script asserts the resulting train/test index sets
are identical before training.

Run on CPU:  JAX_PLATFORMS=cpu python scripts/parity_ml100k.py
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))

import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')

from spotlight_tpu.cross_validation import random_train_test_split  # noqa
from spotlight_tpu.data.fixtures import generate_movielens_100k_like  # noqa
from spotlight_tpu.data.interactions import Interactions  # noqa
from spotlight_tpu.evaluation import mrr_score, rmse_score  # noqa
from spotlight_tpu.factorization import (  # noqa
    ExplicitFactorizationModel, ImplicitFactorizationModel)

sys.path.insert(0, '/root/reference')
from spotlight.cross_validation import (  # noqa
    random_train_test_split as ref_split)
from spotlight.evaluation import mrr_score as ref_mrr  # noqa
from spotlight.evaluation import rmse_score as ref_rmse  # noqa
from spotlight.factorization.explicit import (  # noqa
    ExplicitFactorizationModel as RefExplicit)
from spotlight.factorization.implicit import (  # noqa
    ImplicitFactorizationModel as RefImplicit)
from spotlight.interactions import Interactions as RefInteractions  # noqa

sys.path.pop(0)


def datasets():
    cols = generate_movielens_100k_like()
    ours = Interactions(cols['user_id'], cols['item_id'],
                        ratings=cols['rating'],
                        timestamps=cols['timestamp'])
    ref = RefInteractions(cols['user_id'].astype(np.int64),
                          cols['item_id'].astype(np.int64),
                          ratings=cols['rating'],
                          timestamps=cols['timestamp'].astype(np.int64))

    train, test = random_train_test_split(
        ours, random_state=np.random.RandomState(42))
    rtrain, rtest = ref_split(ref, random_state=np.random.RandomState(42))

    np.testing.assert_array_equal(train.user_ids, rtrain.user_ids)
    np.testing.assert_array_equal(train.item_ids, rtrain.item_ids)
    np.testing.assert_array_equal(test.item_ids, rtest.item_ids)
    return (train, test), (rtrain, rtest)


def run_implicit(loss, ours, ref):
    train, test = ours
    rtrain, rtest = ref

    model = ImplicitFactorizationModel(
        loss=loss, n_iter=10, batch_size=1024, learning_rate=1e-2,
        l2=1e-6, random_state=np.random.RandomState(42))
    model.fit(train)
    mine = mrr_score(model, test, train=train).mean()

    rmodel = RefImplicit(loss=loss, n_iter=10, batch_size=1024,
                         learning_rate=1e-2, l2=1e-6, use_cuda=False,
                         random_state=np.random.RandomState(42))
    rmodel.fit(rtrain)
    theirs = ref_mrr(rmodel, rtest, train=rtrain).mean()
    print('implicit {:16s} reference {:.4f}  spotlight_tpu {:.4f}'.format(
        loss, theirs, mine), flush=True)


def run_explicit(loss, lr, l2, ours, ref):
    train, test = ours
    rtrain, rtest = ref

    model = ExplicitFactorizationModel(
        loss=loss, n_iter=10, batch_size=1024, learning_rate=lr, l2=l2,
        random_state=np.random.RandomState(42))
    model.fit(train)
    mine = rmse_score(model, test)

    rmodel = RefExplicit(loss=loss, n_iter=10, batch_size=1024,
                         learning_rate=lr, l2=l2, use_cuda=False,
                         random_state=np.random.RandomState(42))
    rmodel.fit(rtrain)
    theirs = ref_rmse(rmodel, rtest)
    print('explicit {:16s} reference {:.4f}  spotlight_tpu {:.4f}'.format(
        loss, theirs, mine), flush=True)


def main():
    ours, ref = datasets()
    for loss in ('pointwise', 'bpr', 'hinge', 'adaptive_hinge'):
        run_implicit(loss, ours, ref)
    run_explicit('regression', 1e-3, 1e-5, ours, ref)
    run_explicit('poisson', 1e-3, 1e-6, ours, ref)


if __name__ == '__main__':
    main()
