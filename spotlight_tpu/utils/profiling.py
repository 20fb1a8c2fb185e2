"""Profiling and throughput instrumentation.

The reference's only performance tooling is wall-clock timing in example
scripts (`/root/reference/examples/bloom_embeddings/performance.py:24-38`).
Here profiling is first-class:

- :func:`trace` — context manager around ``jax.profiler`` emitting an XPlane
  trace viewable in TensorBoard/Perfetto,
- :class:`ThroughputMeter` — examples/s (per chip) counters with warm-up
  exclusion, the measurement convention ``bench.py`` uses.
"""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def trace(log_dir='/tmp/spotlight_tpu_trace'):
    """Capture a profiler trace of the enclosed block.

    View with ``tensorboard --logdir <log_dir>`` or load the contained
    ``.trace.json.gz`` into Perfetto.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Examples/s counter with warm-up exclusion.

    Usage::

        meter = ThroughputMeter(warmup_steps=1)
        for epoch in range(n):
            with meter.step(num_examples):
                run_epoch()
        print(meter.examples_per_second())
    """

    def __init__(self, warmup_steps=1):
        self._warmup_steps = warmup_steps
        self._steps = 0
        self._examples = 0
        self._elapsed = 0.0

    @contextlib.contextmanager
    def step(self, num_examples):
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self._steps += 1
        if self._steps > self._warmup_steps:
            self._examples += num_examples
            self._elapsed += elapsed

    def examples_per_second(self, num_chips=1):
        if not self._elapsed:
            return 0.0
        return self._examples / self._elapsed / num_chips

    @property
    def measured_steps(self):
        return max(0, self._steps - self._warmup_steps)
