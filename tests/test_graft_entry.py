"""The driver entry points must keep compiling: entry() single-device and
dryrun_multichip() on the virtual mesh."""

import jax
import numpy as np
import pytest


def test_entry_compiles_and_runs():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    predictions, catalog = jax.jit(fn)(*args)
    assert predictions.shape == (128, 64)
    assert catalog.shape == (128, 2048)
    assert np.isfinite(np.asarray(predictions)).all()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_dryrun_multichip():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)
