"""Smoke tests that the example drivers' machinery executes end to end
(tiny sizes; the scripts themselves run the full configurations)."""

import runpy


def _load(path):
    return runpy.run_path(path)


def test_bloom_performance_machinery(tmp_path, monkeypatch):
    module = _load('examples/bloom_embeddings/performance.py')

    import numpy as np

    data = module['_synthetic_sequences'](50, np.random.RandomState(0))
    assert data.sequences.shape[1] == module['SEQ_LEN']

    from spotlight_tpu.sequence import ImplicitSequenceModel, LSTMNet

    model = ImplicitSequenceModel(
        loss='bpr',
        representation=LSTMNet(50, embedding_dim=8),
        batch_size=256, n_iter=1,
        random_state=np.random.RandomState(0))
    # Shrink the dataset for the timing helper.
    from spotlight_tpu.data.interactions import SequenceInteractions

    small = SequenceInteractions(data.sequences[:512], num_items=50)
    elapsed = module['time_fitting'](model, small, repetitions=1)
    assert elapsed > 0


def test_sweep_driver_machinery(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    module = _load(
        '/root/repo/examples/movielens_sequence/movielens_sequence.py')

    import numpy as np

    rs = np.random.RandomState(0)
    configs = list(module['sample_cnn_hyperparameters'](rs, 3))
    assert len(configs) == 3
    assert all('dilation' in c for c in configs)

    train, validation, test = module['load_data'](
        True, np.random.RandomState(0))
    assert train.num_items == validation.num_items == test.num_items
    model = module['build_model']('pooling', dict(
        configs[0], embedding_dim=8, n_iter=1, batch_size=64,
        learning_rate=1e-2, l2=0.0, loss='bpr'), train,
        np.random.RandomState(0))
    model.fit(train)
    assert model.predict(test.sequences[0][:-1]).shape == (
        train.num_items,)
