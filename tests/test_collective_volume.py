"""Pin the per-step collective exchange volumes from compiled HLO.

Round-3 VERDICT item 5: the communication claims (the capacity-factored
exchange's S-factor per-device volume reduction, the lazy engine's
table-size-independent traffic) are asserted from the actual compiled
programs, not argued.  Bytes are extracted from `compile().as_text()` of
the jitted epoch on the 8-virtual-device CPU mesh; any engine change
that silently regresses exchange volume fails here.
"""

import re

import jax
import numpy as np
import pytest

from spotlight_tpu.factorization import ExplicitFactorizationModel
from spotlight_tpu.parallel import make_mesh
from spotlight_tpu.utils import training as T

from tests._fixtures import factorization_dataset

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason='needs 8 (virtual) devices')

DTYPE_BYTES = {'f32': 4, 'f16': 2, 'bf16': 2, 's32': 4, 'u32': 4,
               's64': 8, 'f64': 8, 'pred': 1, 's8': 1, 'u8': 1}
SHAPE_RE = re.compile(r'(\w+)\[([\d,]*)\]')
OPS = ('all-to-all(', 'all-reduce(', 'all-gather(', 'reduce-scatter(',
       'collective-permute(')


def collective_bytes(hlo_text):
    """Output bytes per collective op kind, summed over the module.

    The training scan body appears once in the module text, so these are
    per-*step* volumes (program-counted, not execution-counted)."""
    totals = {}
    for line in hlo_text.splitlines():
        for op in OPS:
            idx = line.find(' ' + op)
            if idx < 0:
                continue
            lhs = line[:idx]
            if '=' not in lhs:
                continue
            total = 0
            for dtype, dims in SHAPE_RE.findall(lhs.split('=', 1)[1]):
                n = 1
                for d in dims.split(','):
                    if d:
                        n *= int(d)
                total += n * DTYPE_BYTES.get(dtype, 4)
            totals[op[:-1]] = totals.get(op[:-1], 0) + total
    return totals


# Mesh and problem geometry shared by the pins below.
DATA, MODEL = 2, 4
BATCH = 256
DIM = 16
WIDTH = DIM + 1          # fused bias column
USERS, ITEMS = 160, 128  # both divisible by MODEL: no padding terms
N_D = BATCH // DATA      # per-data-shard batch rows
N_DM = BATCH // (DATA * MODEL)  # cf mode: batch sharded over both axes


def _compiled_epoch(exchange, sparse=False, num_users=USERS,
                    num_items=ITEMS):
    interactions = factorization_dataset(
        num_users=num_users, num_items=num_items,
        num_interactions=4096, explicit=True)
    model = ExplicitFactorizationModel(
        loss='regression', embedding_dim=DIM, n_iter=1, batch_size=BATCH,
        sparse=sparse, mesh=make_mesh(data=DATA, model=MODEL),
        exchange=exchange, random_state=np.random.RandomState(0))
    model._initialize(interactions)
    n = len(interactions.user_ids)
    padded, num_batches = T.pad_to_batches(n, BATCH)
    data = T.place_data({
        'user_ids': T.pad_array(interactions.user_ids.astype(np.int32),
                                padded),
        'item_ids': T.pad_array(interactions.item_ids.astype(np.int32),
                                padded),
        'ratings': T.pad_array(interactions.ratings.astype(np.float32),
                               padded),
    }, model._mesh)
    fn = model._epoch_fn(num_batches)
    lowered = fn.lower(model._params, model._opt_state,
                       jax.random.PRNGKey(0), data, n)
    return collective_bytes(lowered.compile().as_text())


def test_psum_engine_volume_pinned():
    """Vocab-parallel psum engine: two row-psums (activation-sized) +
    the data-axis gradient reduction (table-shard-sized) + 2 scalars."""
    got = _compiled_epoch('psum')
    lookups = 2 * N_D * WIDTH * 4                  # user + item row psums
    table_grads = (USERS // MODEL + ITEMS // MODEL) * WIDTH * 4
    scalars = 2 * 4                                # loss + mask count
    assert got.get('all-to-all', 0) == 0
    assert got['all-reduce'] == lookups + table_grads + scalars


def test_alltoall_engine_volume_pinned():
    """Three-phase id exchange: id requests + row payloads forward, row
    cotangents back, per table; gradients keep the data-axis psum."""
    got = _compiled_epoch('alltoall')
    per_table = (MODEL * N_D * 4            # phase-1 id requests (s32)
                 + MODEL * N_D * WIDTH * 4  # phase-3 row payloads
                 + MODEL * N_D * WIDTH * 4)  # transposed cotangents
    table_grads = (USERS // MODEL + ITEMS // MODEL) * WIDTH * 4
    assert got['all-to-all'] == 2 * per_table
    assert got['all-reduce'] == table_grads + 2 * 4


def test_capacity_factored_exchange_cuts_volume_by_shard_count():
    """The cf mode's whole point (parallel/sharding.py): batch sharded
    over BOTH axes -> per-device exchange volume drops by exactly the
    model-shard count vs the replicated all-to-all mode."""
    a2a = _compiled_epoch('alltoall')['all-to-all']
    cf = _compiled_epoch('alltoall_cf')['all-to-all']
    assert cf * MODEL == a2a
    per_table = (MODEL * N_DM * 4
                 + 2 * MODEL * N_DM * WIDTH * 4)
    assert cf == 2 * per_table


def test_lazy_engine_volume_independent_of_table_size():
    """The lazy mesh engine exchanges only activation-sized tensors
    (row psums + role-ordered gradient all_gathers): its per-step
    collective bytes must NOT grow with the table, while the dense psum
    engine's data-axis gradient reduction does."""
    lazy_small = _compiled_epoch('psum', sparse=True)
    lazy_big = _compiled_epoch('psum', sparse=True,
                               num_users=4 * USERS, num_items=4 * ITEMS)
    assert lazy_small == lazy_big

    dense_small = _compiled_epoch('psum')
    dense_big = _compiled_epoch('psum', num_users=4 * USERS,
                                num_items=4 * ITEMS)
    table_grads = (USERS // MODEL + ITEMS // MODEL) * WIDTH * 4
    assert (dense_big['all-reduce'] - dense_small['all-reduce']
            == 3 * table_grads)

    # No all-to-all in the lazy engine; its gathers are batch-sized:
    # ids (s32) + fused gradient rows (f32) per table, in role order.
    gathers = 2 * (BATCH * 4 + BATCH * WIDTH * 4)
    assert lazy_small.get('all-to-all', 0) == 0
    assert lazy_small['all-gather'] == gathers


def test_lazy_exchange_volume_pinned():
    """Lazy engine x exchanges (round-4 VERDICT item 5).  The cf mode's
    composition win, pinned from compiled HLO:

    - forward lookup volume drops by exactly the model-shard count vs the
      replicated all-to-all mode (batch sharded over BOTH axes), and the
      psum mode's activation-sized row reductions disappear entirely;
    - the update stream (ids + per-occurrence gradient rows, all_gathered
      in global batch order for bit-parity) stays global-batch-sized in
      every mode — irreducible without capacity-dropping gradient rows
      (docs/parallelism.md "Lazy x cf composition").
    """
    psum = _compiled_epoch('psum', sparse=True)
    a2a = _compiled_epoch('alltoall', sparse=True)
    cf = _compiled_epoch('alltoall_cf', sparse=True)

    # Update stream identical across modes: ids (s32) + (B, W) rows (f32)
    # per table, global batch width.
    gathers = 2 * (BATCH * 4 + BATCH * WIDTH * 4)
    assert psum['all-gather'] == gathers
    assert a2a['all-gather'] == gathers
    assert cf['all-gather'] == gathers

    # Forward exchange: cf = alltoall / MODEL, exactly.
    per_table_cf = MODEL * N_DM * 4 + MODEL * N_DM * WIDTH * 4
    assert cf['all-to-all'] == 2 * per_table_cf
    assert a2a['all-to-all'] == cf['all-to-all'] * MODEL

    # cf and alltoall reduce only the two scalars (loss + mask count);
    # psum's row assembly adds two activation-sized reductions.
    assert cf['all-reduce'] == 2 * 4
    assert a2a['all-reduce'] == 2 * 4
    assert psum['all-reduce'] == 2 * N_D * WIDTH * 4 + 2 * 4
