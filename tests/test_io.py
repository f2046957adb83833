"""File I/O + checkpoint tests (reference: python tests
test_wholememory_io.py — filelist load over partition plans incl.
round-robin; embedding save/load with optimizer states)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import wholegraph_tpu.embedding as emb_mod
from wholegraph_tpu.embedding import Embedding
from wholegraph_tpu.io import (
    load_embedding,
    load_filelist,
    load_table_checkpoint,
    save_embedding,
    save_table_checkpoint,
    store_table,
)
from wholegraph_tpu.io.file_io import load_table_from_parts
from wholegraph_tpu.memory import PartitionPlan, ShardedTable

from conftest import deterministic_rows


def write_filelist(tmp_path, arr, nfiles=3):
    """Split rows of arr across nfiles binary files (uneven split)."""
    paths = []
    n = arr.shape[0]
    cuts = [0, n // 4, n // 2 + 3, n]
    assert nfiles == 3
    for i in range(nfiles):
        p = str(tmp_path / f"feat_{i}.bin")
        arr[cuts[i] : cuts[i + 1]].tofile(p)
        paths.append(p)
    return paths


@pytest.mark.parametrize("use_native", [False, True])
def test_load_filelist_block(mesh8, tmp_path, use_native, monkeypatch):
    n, dim = 200, 16
    arr = deterministic_rows(n, dim)
    paths = write_filelist(tmp_path, arr)
    if not use_native:
        import wholegraph_tpu.io.file_io as fio
        monkeypatch.setattr(fio, "_read_rows", fio._read_rows)  # keep pure path
        import sys
        monkeypatch.setitem(sys.modules, "wholegraph_tpu.io.native", None)
    tab = load_filelist(paths, mesh8, dim, np.float32)
    np.testing.assert_allclose(tab.to_array(), arr)


def test_load_filelist_round_robin(mesh8, tmp_path):
    n, dim = 100, 8
    arr = deterministic_rows(n, dim)
    paths = write_filelist(tmp_path, arr)
    tab = load_filelist(paths, mesh8, dim, np.float32, round_robin_size=4)
    assert tab.plan.mode == "round_robin"
    np.testing.assert_allclose(tab.to_array(), arr)
    # gather through the rr plan
    ids = np.random.RandomState(0).randint(0, n, 64)
    from jax.sharding import NamedSharding, PartitionSpec as P
    out = tab.gather(jax.device_put(jnp.asarray(ids), NamedSharding(mesh8, P("data"))))
    np.testing.assert_allclose(np.asarray(out), arr[ids])


def test_load_filelist_validates(mesh8, tmp_path):
    p = str(tmp_path / "bad.bin")
    np.zeros(13, np.uint8).tofile(p)  # not a multiple of entry size
    with pytest.raises(Exception):
        load_filelist([p], mesh8, 4, np.float32)


def test_store_load_roundtrip(mesh8, tmp_path):
    n, dim = 123, 8
    arr = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, arr)
    store_table(tab, str(tmp_path / "ckpt"))
    tab2 = load_table_from_parts(str(tmp_path / "ckpt"), 8, mesh8, dim, np.float32)
    np.testing.assert_allclose(tab2.to_array(), arr)


def test_repartition_reload(mesh8, mesh4, tmp_path):
    """Save with 8 parts, reload onto a 4-way mesh (part_count tolerance)."""
    n, dim = 96, 4
    arr = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, arr)
    save_table_checkpoint(tab, str(tmp_path), "t8")
    tab4 = load_table_checkpoint(mesh4, str(tmp_path), "t8")
    assert tab4.plan.world == 4
    np.testing.assert_allclose(tab4.to_array(), arr)


def test_round_robin_checkpoint_reload(mesh8, tmp_path):
    n, dim = 90, 4
    plan = PartitionPlan.round_robin(n, 8, 8)
    arr = deterministic_rows(n, dim)
    tab = ShardedTable.from_array(mesh8, arr, plan=plan)
    save_table_checkpoint(tab, str(tmp_path), "rr")
    tab2 = load_table_checkpoint(mesh8, str(tmp_path), "rr")
    np.testing.assert_allclose(tab2.to_array(), arr)


def test_embedding_save_load(mesh8, tmp_path):
    from jax.sharding import NamedSharding, PartitionSpec as P

    n, dim, B = 80, 8, 32
    opt = emb_mod.LazyAdam()
    emb = Embedding.create(mesh8, n, dim, optimizer=opt)
    state = emb.from_array(deterministic_rows(n, dim))
    rng = np.random.RandomState(0)
    ids = rng.randint(0, n, B).astype(np.int64)
    grads = rng.randn(B, dim).astype(np.float32)
    state = emb.apply_gradients(
        state,
        jax.device_put(jnp.asarray(ids), NamedSharding(mesh8, P("data"))),
        jax.device_put(jnp.asarray(grads), NamedSharding(mesh8, P("data", None))),
        0.1,
    )
    save_embedding(emb, state, str(tmp_path), "emb")
    state2 = load_embedding(emb, str(tmp_path), "emb")
    np.testing.assert_allclose(emb.to_array(state2), emb.to_array(state))
    for k in opt.slot_names:
        np.testing.assert_allclose(
            emb.slot_to_array(state2, k), emb.slot_to_array(state, k)
        )
    assert int(state2.step) == int(state.step) == 1


def test_sharded_table_from_filelist(mesh8, tmp_path):
    arr = deterministic_rows(150, 8)
    p = str(tmp_path / "t.bin")
    arr.tofile(p)
    tab = ShardedTable.from_filelist(mesh8, [p], 8, np.float32)
    np.testing.assert_allclose(tab.to_array(), arr)


def test_embedding_from_filelist(mesh8, tmp_path):
    n, dim = 96, 8
    arr = deterministic_rows(n, dim)
    p = str(tmp_path / "e.bin")
    arr.tofile(p)
    emb = Embedding.create(mesh8, n, dim, optimizer=emb_mod.LazyAdam())
    state = emb.from_filelist([p])
    np.testing.assert_allclose(emb.to_array(state), arr)
    assert set(state.slots) == {"m", "v"}
    # round-robin variant needs a matching plan
    rr_plan = PartitionPlan.round_robin(n, 8, 4)
    emb_rr = Embedding.create(mesh8, n, dim, plan=rr_plan)
    state_rr = emb_rr.from_filelist([p], round_robin_size=4)
    np.testing.assert_allclose(emb_rr.to_array(state_rr), arr)


def test_host_embedding_checkpoint_roundtrip(mesh8, tmp_path):
    """Host-tier checkpoint: table + optimizer slots + hot set survive a
    save/load and training resumes identically (reference save/load flow,
    torch/embedding.py:358-377, applied to device_cached_host)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from wholegraph_tpu.embedding import HostEmbedding, LazyAdam
    from wholegraph_tpu.io import load_host_embedding, save_host_embedding

    n, dim, B = 128, 16, 64
    emb = HostEmbedding.create(mesh8, n, dim, optimizer=LazyAdam(), cache_ratio=0.3)
    rs = np.random.RandomState(0)
    init = rs.randn(n, dim).astype(np.float32)
    state = emb.from_array(init, hot_ids=np.arange(0, n, 2))

    ids = jax.device_put(
        jnp.asarray(rs.randint(0, n, B)), NamedSharding(mesh8, P("data"))
    )
    grads = jax.device_put(
        jnp.asarray(rs.randn(B, dim).astype(np.float32)),
        NamedSharding(mesh8, P("data", None)),
    )
    state = emb.apply_gradients(state, ids, grads, 0.1)
    save_host_embedding(emb, state, str(tmp_path), "htab")

    state2 = load_host_embedding(emb, str(tmp_path), "htab")
    np.testing.assert_allclose(emb.to_array(state2), emb.to_array(state))
    assert int(state2.step) == 1
    # resume: one more identical step on both must stay identical
    s_a = emb.apply_gradients(state, ids, grads, 0.1)
    s_b = emb.apply_gradients(state2, ids, grads, 0.1)
    np.testing.assert_allclose(emb.to_array(s_b), emb.to_array(s_a), rtol=1e-6)


def test_async_checkpointer_embedding(mesh8, tmp_path):
    """Async save == sync save: snapshot-then-background-write, meta last,
    no .tmp litter; a second save to the same name supersedes the first."""
    from wholegraph_tpu.io import AsyncCheckpointer, load_embedding

    n, dim = 64, 8
    emb = Embedding.create(mesh8, n, dim, optimizer=emb_mod.SGD())
    state = emb.from_array(deterministic_rows(n, dim))
    with AsyncCheckpointer() as ckpt:
        ckpt.save_embedding(emb, state, str(tmp_path), "a")
        # mutate the live state immediately (donation-style reuse): the
        # snapshot must be isolated from it
        state2 = emb.from_array(2.0 * deterministic_rows(n, dim))
        ckpt.save_embedding(emb, state2, str(tmp_path), "b")
        ckpt.wait()
    got_a = emb.to_array(load_embedding(emb, str(tmp_path), "a"))
    got_b = emb.to_array(load_embedding(emb, str(tmp_path), "b"))
    np.testing.assert_array_equal(got_a, deterministic_rows(n, dim))
    np.testing.assert_array_equal(got_b, 2.0 * deterministic_rows(n, dim))
    leftovers = [p for p in os.listdir(tmp_path) if p.endswith(".tmp")]
    assert leftovers == []


def test_async_checkpointer_error_propagates():
    """A failure in the background WRITE phase surfaces from wait()."""
    from wholegraph_tpu.io import checkpoint as ck

    ckpt = ck.AsyncCheckpointer()
    bad = ([("/no-such-dir-wgtpu/part_0_of_1", np.zeros((2, 2), np.float32))], [])
    ckpt._submit(bad)
    with pytest.raises(Exception):
        ckpt.wait()
    ckpt.close()


def test_async_checkpointer_table(mesh8, tmp_path):
    from wholegraph_tpu.io import AsyncCheckpointer

    tab = ShardedTable.from_array(mesh8, deterministic_rows(48, 16))
    with AsyncCheckpointer() as ckpt:
        ckpt.save_table(tab, str(tmp_path), "tt")
    tab2 = load_table_checkpoint(mesh8, str(tmp_path), "tt")
    np.testing.assert_array_equal(tab2.to_array(), deterministic_rows(48, 16))


def test_native_read_direct_io(tmp_path):
    """O_DIRECT read variant (reference _directio loaders, file_io.cpp:883):
    bit-identical to buffered reads, with per-file fallback where the
    filesystem refuses O_DIRECT."""
    from wholegraph_tpu.io.native import read_rows_native

    rng = np.random.RandomState(5)
    arrs = [rng.randn(100 + i * 7, 32).astype(np.float32) for i in range(3)]
    paths = []
    for i, a in enumerate(arrs):
        p = str(tmp_path / f"d{i}.bin")
        a.tofile(p)
        paths.append(p)
    starts = np.cumsum([0] + [a.shape[0] for a in arrs])
    full = np.concatenate(arrs)
    es = 32 * 4
    for lo, hi in ((0, len(full)), (13, 250), (101, 129)):
        out_b = np.empty((hi - lo) * es, np.uint8)
        out_d = np.empty((hi - lo) * es, np.uint8)
        read_rows_native(paths, starts, es, lo, hi, out_b, direct=False)
        read_rows_native(paths, starts, es, lo, hi, out_d, direct=True)
        np.testing.assert_array_equal(out_b, out_d)
        np.testing.assert_array_equal(
            out_d.view(np.float32).reshape(hi - lo, 32), full[lo:hi]
        )
