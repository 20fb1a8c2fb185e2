"""Tests for the resumable sweep harness and throughput meters."""

import time

from spotlight_tpu.utils.profiling import ThroughputMeter
from spotlight_tpu.utils.results import Results


def test_results_roundtrip(tmp_path):
    results = Results(str(tmp_path / 'sweep.jsonl'))
    config_a = {'lr': 0.01, 'dim': 32}
    config_b = {'lr': 0.1, 'dim': 64}

    assert config_a not in results
    results.save(config_a, test_mrr=0.5, elapsed=1.0)
    results.save(config_b, test_mrr=0.7, elapsed=2.0)

    assert config_a in results
    assert results[config_a]['test_mrr'] == 0.5
    assert len(results) == 2
    assert results.best('test_mrr')['lr'] == 0.1

    # Resumability: a new Results over the same file sees everything.
    resumed = Results(str(tmp_path / 'sweep.jsonl'))
    assert config_b in resumed

    resumed.remove(config_a)
    assert config_a not in resumed
    assert config_b in resumed


def test_results_hash_insensitive_to_key_order(tmp_path):
    results = Results(str(tmp_path / 'sweep.jsonl'))
    results.save({'a': 1, 'b': 2}, metric=1.0)
    assert {'b': 2, 'a': 1} in results


def test_throughput_meter_excludes_warmup():
    meter = ThroughputMeter(warmup_steps=1)
    for _ in range(3):
        with meter.step(100):
            time.sleep(0.01)
    assert meter.measured_steps == 2
    rate = meter.examples_per_second()
    assert 1000 < rate < 20000
