"""Multi-host helpers, exercised in their single-process degenerate form."""

import jax
import numpy as np
import pytest

from spotlight_tpu.parallel import make_mesh, multihost


def test_is_primary_single_process():
    assert multihost.is_primary()


@pytest.mark.skipif(len(jax.devices()) < 8, reason='needs 8 devices')
def test_global_batch_array_single_process():
    mesh = make_mesh(data=2, model=4)
    local = np.arange(32, dtype=np.float32).reshape(16, 2)
    global_arr = multihost.global_batch_array(mesh, local)
    assert global_arr.shape == (16, 2)
    np.testing.assert_array_equal(np.asarray(global_arr), local)
    # Sharded over the data axis.
    assert len(global_arr.sharding.device_set) == 8
