"""Explicit matrix factorization walkthrough.

TPU-native analogue of the reference's explicit-feedback notebook
(`/root/reference/examples/movielens_explicit/`): fit an
:class:`ExplicitFactorizationModel` on rating data and report train/test
RMSE.  Uses MovieLens-100K when the dataset cache is present, else the
synthetic explicit generator.
"""

import numpy as np

from spotlight_tpu.data import random_train_test_split
from spotlight_tpu.evaluation import rmse_score
from spotlight_tpu.factorization import ExplicitFactorizationModel


def load_data(random_state):
    try:
        from spotlight_tpu.data.movielens import get_movielens_dataset

        return get_movielens_dataset('100K')
    except Exception:
        from spotlight_tpu.data.synthetic import generate_factorization

        print('MovieLens unavailable; using the synthetic explicit set.')
        return generate_factorization(
            num_users=1000, num_items=1500, num_interactions=100000,
            explicit=True, random_state=random_state)


def main():
    random_state = np.random.RandomState(42)
    dataset = load_data(random_state)
    train, test = random_train_test_split(dataset,
                                          random_state=random_state)
    print('Split into \n {} and \n {}.'.format(train, test))

    model = ExplicitFactorizationModel(
        loss='regression', embedding_dim=128, n_iter=10, batch_size=1024,
        l2=1e-9, learning_rate=1e-3, random_state=random_state)
    model.fit(train, verbose=True)

    train_rmse = rmse_score(model, train)
    test_rmse = rmse_score(model, test)
    print('Train RMSE {:.3f}, test RMSE {:.3f}'.format(train_rmse,
                                                       test_rmse))


if __name__ == '__main__':
    main()
