"""Multi-device tests on the virtual 8-device CPU mesh (the reference's
fake-NUMA analogue; scheduler/topology.hpp:64-78)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from hyrise_tpu.parallel.mesh import QueryMesh, partition_table
from hyrise_tpu.parallel.distributed import (
    make_distributed_join_agg_step,
    make_distributed_scan_agg_step,
)
from hyrise_tpu.storage.table import Table


@pytest.fixture(scope="module")
def qmesh():
    return QueryMesh()


def test_mesh_has_8_devices(qmesh):
    assert qmesh.n == 8


def test_partition_table(qmesh):
    t = Table.from_dict({"a": list(range(1000)), "s": ["x"] * 1000})
    st = partition_table(t, qmesh)
    assert st.num_rows == 1000
    assert st.row_valid.shape[0] == 8
    total_valid = int(jnp.sum(st.row_valid))
    assert total_valid == 1000


def test_distributed_scan_agg(qmesh):
    rows = 8 * 128
    rng = np.random.default_rng(0)
    slots = rng.integers(0, 4, size=rows)
    values = rng.random(rows)
    mask = rng.random(rows) < 0.5
    step = make_distributed_scan_agg_step(qmesh, num_groups=4)
    sums, counts = step(
        jnp.asarray(mask).reshape(8, -1),
        jnp.asarray(slots).reshape(8, -1),
        jnp.asarray(values).reshape(8, -1),
    )
    for g in range(4):
        expect = values[(slots == g) & mask].sum()
        assert abs(float(sums[g]) - expect) < 1e-9
        assert int(counts[g]) == int(((slots == g) & mask).sum())


def test_distributed_join_agg(qmesh):
    rows = 8 * 128
    rng = np.random.default_rng(1)
    # probe: keys 0..63 with group slots and values; build: even keys only
    p_keys = rng.integers(0, 64, size=rows)
    p_slot = p_keys % 4
    p_val = rng.random(rows)
    b_keys = np.arange(0, 64, 2)
    b = np.zeros(rows, dtype=np.int64)
    b[: len(b_keys)] = b_keys
    b_valid = np.zeros(rows, dtype=bool)
    b_valid[: len(b_keys)] = True

    step = make_distributed_join_agg_step(
        qmesh, bucket_cap=256, join_out_cap=2048, num_groups=4
    )
    sums, counts, overflow = step(
        jnp.asarray(p_keys).reshape(8, -1),
        jnp.ones((8, rows // 8), dtype=bool),
        jnp.asarray(p_slot).reshape(8, -1),
        jnp.asarray(p_val).reshape(8, -1),
        jnp.asarray(b).reshape(8, -1),
        jnp.asarray(b_valid).reshape(8, -1),
    )
    assert int(overflow) == 0
    matched = p_keys % 2 == 0
    for g in range(4):
        sel = matched & (p_slot == g)
        assert abs(float(sums[g]) - p_val[sel].sum()) < 1e-9
        assert int(counts[g]) == int(sel.sum())


def test_bloom_build_probe():
    """No false negatives; most absent keys filtered (2^20 bits)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from hyrise_tpu.parallel import shuffle as shf
    from hyrise_tpu.parallel.mesh import QueryMesh, SHARD_AXIS

    mesh = QueryMesh()
    n = mesh.n
    per = 256
    build = np.arange(n * per, dtype=np.int64).reshape(n, per) * 7
    probe = np.concatenate([build.reshape(-1)[:512],
                            np.arange(10**6, 10**6 + 512 * 7, 7)])
    probe = np.resize(probe, n * per).reshape(n, per)

    def local(bk, pk):
        bloom = shf.bloom_build(bk.reshape(-1),
                                jnp.ones(per, dtype=bool))
        return shf.bloom_probe(bloom, pk.reshape(-1)).reshape(1, -1)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh.mesh,
        in_specs=(P(SHARD_AXIS, None), P(SHARD_AXIS, None)),
        out_specs=P(SHARD_AXIS, None), check_vma=False,
    ))
    sb = jax.device_put(build, mesh.sharding(P(SHARD_AXIS, None)))
    sp = jax.device_put(probe, mesh.sharding(P(SHARD_AXIS, None)))
    hit = np.asarray(fn(sb, sp)).reshape(-1)
    present = np.isin(probe.reshape(-1), build.reshape(-1))
    assert (hit[present]).all(), "bloom false negative"
    absent = ~present
    # overwhelming majority of absent keys must be pruned (2^20 bits,
    # ~2k entries -> false-positive rate well under 1%)
    assert hit[absent].mean() < 0.05
