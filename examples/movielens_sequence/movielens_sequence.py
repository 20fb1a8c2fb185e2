"""Random hyperparameter search over sequence representations.

TPU-native analogue of the reference's sweep driver
(`/root/reference/examples/movielens_sequence/movielens_sequence.py`): a
resumable random search (JSONL log keyed by config hash) over pooling /
LSTM / CNN / mixture representations, evaluated with validation and test
MRR.

Runs against MovieLens-1M when the dataset cache is available
(``~/spotlight_data``); in network-free environments pass ``--synthetic`` to
sweep on the Markov-chain fixture instead.

Usage::

    python movielens_sequence.py {pooling,lstm,cnn,mixture} [--synthetic]
"""

import argparse
import time

import numpy as np

from spotlight_tpu.data import user_based_train_test_split
from spotlight_tpu.evaluation import sequence_mrr_score
from spotlight_tpu.sequence import CNNNet, ImplicitSequenceModel
from spotlight_tpu.utils.results import Results

NUM_SAMPLES = 100
RANDOM_SEED = 42


def sample_cnn_hyperparameters(random_state, num):
    from sklearn.model_selection import ParameterSampler

    space = {
        'n_iter': list(range(5, 20)),
        'batch_size': [32, 64, 128, 256],
        'l2': [1e-6, 1e-5, 0.0],
        'learning_rate': [1e-3, 5e-3, 1e-2],
        'loss': ['adaptive_hinge', 'bpr', 'hinge', 'pointwise'],
        'embedding_dim': [8, 16, 32, 64, 128, 256],
        'kernel_width': [3, 5, 7],
        'num_layers': list(range(1, 10)),
        'dilation_multiplier': [1, 2],
        'nonlinearity': ['tanh', 'relu'],
        'residual': [True, False],
    }
    for params in ParameterSampler(space, n_iter=num,
                                   random_state=random_state):
        params['dilation'] = tuple(
            params['dilation_multiplier'] ** i
            for i in range(params['num_layers']))
        yield params


def sample_sequence_hyperparameters(random_state, num):
    from sklearn.model_selection import ParameterSampler

    space = {
        'n_iter': list(range(5, 20)),
        'batch_size': [32, 64, 128, 256],
        'l2': [1e-6, 1e-5, 0.0],
        'learning_rate': [1e-3, 5e-3, 1e-2],
        'loss': ['adaptive_hinge', 'bpr', 'hinge', 'pointwise'],
        'embedding_dim': [8, 16, 32, 64, 128, 256],
    }
    yield from ParameterSampler(space, n_iter=num,
                                random_state=random_state)


def build_model(representation_name, hyperparameters, train, random_state):
    h = dict(hyperparameters)
    if representation_name == 'cnn':
        representation = CNNNet(
            train.num_items,
            embedding_dim=h['embedding_dim'],
            kernel_width=h['kernel_width'],
            dilation=h['dilation'],
            num_layers=h['num_layers'],
            nonlinearity=h['nonlinearity'],
            residual_connections=h['residual'])
    else:
        representation = representation_name

    return ImplicitSequenceModel(
        loss=h['loss'],
        representation=representation,
        embedding_dim=h['embedding_dim'],
        batch_size=h['batch_size'],
        learning_rate=h['learning_rate'],
        l2=h['l2'],
        n_iter=h['n_iter'],
        random_state=random_state)


def load_data(synthetic, random_state, max_sequence_length=200,
              min_sequence_length=20):
    if synthetic:
        from spotlight_tpu.data.synthetic import generate_sequential

        dataset = generate_sequential(
            num_users=1000, num_items=2000, num_interactions=100000,
            concentration_parameter=0.01, order=3,
            random_state=random_state)
        max_sequence_length, min_sequence_length = 50, 10
    else:
        from spotlight_tpu.data.movielens import get_movielens_dataset

        dataset = get_movielens_dataset('1M')

    rest, test = user_based_train_test_split(
        dataset, test_percentage=0.2, random_state=random_state)
    train, validation = user_based_train_test_split(
        rest, test_percentage=0.2, random_state=random_state)

    to_seq = dict(max_sequence_length=max_sequence_length,
                  min_sequence_length=min_sequence_length,
                  step_size=max_sequence_length)
    return (train.to_sequence(**to_seq),
            validation.to_sequence(**to_seq),
            test.to_sequence(**to_seq))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('representation',
                        choices=('pooling', 'lstm', 'cnn', 'mixture'))
    parser.add_argument('--synthetic', action='store_true')
    parser.add_argument('--num-samples', type=int, default=NUM_SAMPLES)
    args = parser.parse_args()

    random_state = np.random.RandomState(RANDOM_SEED)
    train, validation, test = load_data(args.synthetic, random_state)
    print('Data: {} / {} / {}'.format(train, validation, test))

    results = Results('{}_results.jsonl'.format(args.representation))

    sampler = (sample_cnn_hyperparameters
               if args.representation == 'cnn'
               else sample_sequence_hyperparameters)

    for hyperparameters in sampler(random_state, args.num_samples):
        if hyperparameters in results:
            continue

        print('Evaluating {}'.format(hyperparameters))
        start = time.time()
        model = build_model(args.representation, hyperparameters, train,
                            random_state)
        try:
            model.fit(train, verbose=True)
        except ValueError as error:  # degenerate-loss guard
            print('Skipping: {}'.format(error))
            results.save(hyperparameters, validation_mrr=0.0, test_mrr=0.0,
                         elapsed=time.time() - start, degenerate=True)
            continue

        validation_mrr = sequence_mrr_score(model, validation).mean()
        test_mrr = sequence_mrr_score(model, test).mean()
        elapsed = time.time() - start
        print('MRR validation {:.4f} test {:.4f} ({:.0f}s)'.format(
            validation_mrr, test_mrr, elapsed))

        results.save(hyperparameters,
                     validation_mrr=float(validation_mrr),
                     test_mrr=float(test_mrr),
                     elapsed=elapsed)

    best = results.best('validation_mrr')
    print('Best (by validation MRR): {}'.format(best))


if __name__ == '__main__':
    main()
