"""Statistical learning gates for the sequence models, mirroring the
reference's learnable-vs-random contrast strategy
(`/root/reference/tests/sequence/test_sequence_implicit.py`): a low-entropy
Markov chain (concentration 1e-3) must be learned to high MRR, a near-random
chain (1e2) must still clear the chance floor.  Thresholds are the
reference's own gates; hyperparameters are tuned per representation exactly
as the reference does.

Like the reference, the fixture seed is pinned (RANDOM_SEED = 42): the
generated chain's intrinsic learnability varies across generation seeds
(e.g. the same LSTM config reaches 0.63-0.68 at seed 42 but ~0.49 at seed
123 on that seed's harder chain), so the gates are calibrated against the
pinned fixture — the reference's methodology.  Cross-implementation
accuracy parity on identical data is checked separately
(`scripts/parity_vs_reference.py`, docs/parity.md)."""

import numpy as np
import pytest

from spotlight_tpu.data import user_based_train_test_split
from spotlight_tpu.evaluation import sequence_mrr_score
from spotlight_tpu.ops import BloomEmbedding
from spotlight_tpu.sequence import (CNNNet, LSTMNet,
                                    ImplicitSequenceModel)

from tests._fixtures import sequential_dataset

RANDOM_SEED = 42
NUM_EPOCHS = 5
EMBEDDING_DIM = 32
BATCH_SIZE = 128
LOSS = 'bpr'


def _get_synthetic_data(randomness=0.01, num_interactions=10000,
                        max_sequence_length=10):
    interactions = sequential_dataset(
        num_users=100, num_items=100, num_interactions=num_interactions,
        concentration_parameter=randomness, order=2, seed=RANDOM_SEED)
    train, test = user_based_train_test_split(
        interactions, random_state=np.random.RandomState(RANDOM_SEED))
    return (train.to_sequence(max_sequence_length=max_sequence_length),
            test.to_sequence(max_sequence_length=max_sequence_length))


@pytest.mark.parametrize('randomness, expected_mrr', [
    (1e-3, 0.18),
    (1e2, 0.03),
])
def test_implicit_pooling_synthetic(randomness, expected_mrr):
    train, test = _get_synthetic_data(randomness=randomness)
    model = ImplicitSequenceModel(
        loss=LOSS, batch_size=BATCH_SIZE, embedding_dim=EMBEDDING_DIM,
        learning_rate=1e-1, l2=1e-9, n_iter=NUM_EPOCHS + 3,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('randomness, expected_mrr', [
    (1e-3, 0.61),
    (1e2, 0.03),
])
def test_implicit_lstm_synthetic(randomness, expected_mrr):
    train, test = _get_synthetic_data(randomness=randomness)
    model = ImplicitSequenceModel(
        loss=LOSS, representation='lstm', batch_size=BATCH_SIZE,
        embedding_dim=EMBEDDING_DIM, learning_rate=1e-2, l2=1e-7,
        n_iter=NUM_EPOCHS * 5,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('randomness, expected_mrr', [
    (1e-3, 0.65),
    (1e2, 0.03),
])
def test_implicit_cnn_synthetic(randomness, expected_mrr):
    train, test = _get_synthetic_data(randomness=randomness)
    model = ImplicitSequenceModel(
        loss=LOSS,
        representation=CNNNet(train.num_items, embedding_dim=EMBEDDING_DIM,
                              kernel_width=5, num_layers=1),
        batch_size=BATCH_SIZE, learning_rate=1e-2, l2=0.0,
        n_iter=NUM_EPOCHS * 8,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('num_layers, dilation, expected_mrr', [
    (1, (1,), 0.65),
    (2, (1, 2), 0.65),
])
def test_implicit_cnn_dilation_synthetic(num_layers, dilation, expected_mrr):
    train, test = _get_synthetic_data(randomness=1e-3,
                                      num_interactions=20000)
    model = ImplicitSequenceModel(
        loss=LOSS,
        representation=CNNNet(train.num_items, embedding_dim=EMBEDDING_DIM,
                              kernel_width=3, dilation=dilation,
                              num_layers=num_layers),
        batch_size=BATCH_SIZE, learning_rate=1e-2, l2=0.0,
        n_iter=NUM_EPOCHS * 5 * num_layers,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('randomness, expected_mrr', [
    (1e-3, 0.3),
    (1e2, 0.03),
])
def test_implicit_lstm_mixture_synthetic(randomness, expected_mrr):
    train, test = _get_synthetic_data(randomness=randomness)
    model = ImplicitSequenceModel(
        loss=LOSS, representation='mixture', batch_size=BATCH_SIZE,
        embedding_dim=EMBEDDING_DIM, learning_rate=1e-2, l2=1e-7,
        n_iter=NUM_EPOCHS * 10,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('loss, expected_mrr', [
    ('pointwise', 0.15),
    ('hinge', 0.16),
    ('bpr', 0.18),
    ('adaptive_hinge', 0.16),
])
def test_implicit_pooling_losses(loss, expected_mrr):
    train, test = _get_synthetic_data(randomness=1e-3)
    model = ImplicitSequenceModel(
        loss=loss, batch_size=BATCH_SIZE, embedding_dim=EMBEDDING_DIM,
        learning_rate=1e-1, l2=1e-9, n_iter=NUM_EPOCHS + 3,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


@pytest.mark.parametrize('compression_ratio, expected_mrr', [
    (0.2, 0.18),
    (0.5, 0.40),
    (1.0, 0.60),
])
def test_bloom_lstm(compression_ratio, expected_mrr):
    train, test = _get_synthetic_data(randomness=1e-3,
                                      num_interactions=20000)
    embedding = BloomEmbedding(train.num_items, EMBEDDING_DIM,
                               compression_ratio=compression_ratio,
                               num_hash_functions=4)
    representation = LSTMNet(train.num_items, embedding_dim=EMBEDDING_DIM,
                             item_embedding_layer=embedding)
    model = ImplicitSequenceModel(
        loss=LOSS, representation=representation, batch_size=BATCH_SIZE,
        learning_rate=1e-2, l2=1e-7, n_iter=NUM_EPOCHS * 5,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > expected_mrr


def test_subsequence_training_windows():
    """Training on sliding windows (step_size 1) also learns."""
    train, test = _get_synthetic_data(randomness=1e-3)
    train_windows = sequential_dataset(
        num_users=100, num_items=100, num_interactions=10000,
        concentration_parameter=1e-3, order=2, seed=RANDOM_SEED)
    train_windows, _ = user_based_train_test_split(
        train_windows, random_state=np.random.RandomState(RANDOM_SEED))
    train_windows = train_windows.to_sequence(
        max_sequence_length=10, step_size=5)

    model = ImplicitSequenceModel(
        loss=LOSS, representation='lstm', batch_size=BATCH_SIZE,
        embedding_dim=EMBEDDING_DIM, learning_rate=1e-2, l2=1e-7,
        n_iter=NUM_EPOCHS * 3,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train_windows)
    assert sequence_mrr_score(model, test).mean() > 0.5


def test_predict_rejects_multirow_batch():
    """predict() is a single-sequence contract (reference
    `sequence/implicit.py:288-331`); a (B, T) batch must raise instead of
    silently concatenating rows into one long sequence."""
    train, _ = _get_synthetic_data(num_interactions=2000)
    model = ImplicitSequenceModel(
        loss=LOSS, batch_size=BATCH_SIZE, embedding_dim=8, n_iter=1,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)

    single = model.predict(train.sequences[0])
    assert single.shape == (train.num_items,)
    # 2-d input with a single row is equivalent to the 1-d form.
    np.testing.assert_array_equal(
        model.predict(train.sequences[:1]), single)

    with pytest.raises(ValueError, match='single sequence'):
        model.predict(train.sequences[:2])


def test_bf16_tables_lstm_gate():
    """bfloat16 item-table storage (scores compute in f32) must clear the
    same learnability gate as the f32 table — mirrors the factorization
    bf16 gate (`tests/test_ml100k_gates.py::test_bf16_tables_bpr_gate`)."""
    import jax.numpy as jnp

    train, test = _get_synthetic_data(randomness=1e-3)
    model = ImplicitSequenceModel(
        loss=LOSS,
        representation=LSTMNet(train.num_items,
                               embedding_dim=EMBEDDING_DIM,
                               table_dtype=jnp.bfloat16),
        batch_size=BATCH_SIZE, learning_rate=1e-2, l2=1e-7,
        n_iter=NUM_EPOCHS * 5,
        random_state=np.random.RandomState(RANDOM_SEED))
    model.fit(train)
    assert sequence_mrr_score(model, test).mean() > 0.61
