"""Off-hardware TRACE tests for the pallas kernels' shape plumbing.

The pallas ring/window kernels only *execute* on TPU (tests/test_pallas_tpu.py),
but their shape logic — 2-D vs native 3-D tables, padding, VJP cotangent
reshapes — is pure trace-time Python that jax.eval_shape exercises on any
backend.  Round-2 regression: _gather_rows_pallas3_impl unpacked
`N, D = table.shape` and crashed at trace time for every native-layout
caller (ops/gather.py local_take, embedding ring apply, local_take_sorted),
which CPU tests never reached because the dispatch is backend-gated.
"""

import jax
import jax.numpy as jnp
import pytest

from wholegraph_tpu.ops.gather_pallas import (
    _gather_rows_pallas3_impl,
    gather_rows_pallas,
    gather_rows_pallas3,
    scatter_rows_masked3,
    scatter_rows_pallas3,
)


def _aval(shape, dtype=jnp.float32):
    return jax.ShapeDtypeStruct(shape, dtype)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_gather3_traces_2d_table(dtype):
    out = jax.eval_shape(
        _gather_rows_pallas3_impl, _aval((8192, 256), dtype), _aval((2048,), jnp.int32)
    )
    assert out.shape == (2048, 2, 128) and out.dtype == dtype


@pytest.mark.parametrize("nplanes", [1, 2, 4])
def test_gather3_traces_native3_table(nplanes):
    """Native [cap, D//128, 128] loop-carry shards (embedding state layout)."""
    out = jax.eval_shape(
        _gather_rows_pallas3_impl,
        _aval((8192, nplanes, 128)),
        _aval((2048,), jnp.int32),
    )
    assert out.shape == (2048, nplanes, 128)


def test_gather3_traces_nondefault_ring_params():
    # the embedding ring apply uses id_block=256/n_inflight=128
    f = lambda t, i: _gather_rows_pallas3_impl(t, i, id_block=256, n_inflight=128)
    out = jax.eval_shape(f, _aval((4096, 2, 128)), _aval((1024,), jnp.int32))
    assert out.shape == (1024, 2, 128)


@pytest.mark.parametrize("tshape", [(8192, 256), (8192, 2, 128)])
def test_gather3_vjp_traces_both_layouts(tshape):
    """The custom VJP's cotangent scatter-add must match the table layout."""

    def loss(t):
        return gather_rows_pallas3(t, jnp.zeros((1024,), jnp.int32)).astype(
            jnp.float32
        ).sum()

    g = jax.eval_shape(jax.grad(loss), _aval(tshape))
    assert g.shape == tshape


def test_flat_wrapper_traces():
    out = jax.eval_shape(
        gather_rows_pallas, _aval((8192, 384)), _aval((1024,), jnp.int32)
    )
    assert out.shape == (1024, 384)


def test_scatter3_traces_native3():
    out = jax.eval_shape(
        scatter_rows_pallas3,
        _aval((8192, 2, 128)),
        _aval((1024,), jnp.int32),
        _aval((1024, 2, 128)),
    )
    assert out.shape == (8192, 2, 128)


def test_scatter_masked3_traces_native3():
    out = jax.eval_shape(
        scatter_rows_masked3,
        _aval((8192, 2, 128)),
        _aval((1024,), jnp.int32),
        _aval((1024, 2, 128)),
    )
    assert out.shape == (8192, 2, 128)


def test_embedding_ring_apply_traces():
    """The full native-layout optimizer ring step traces end-to-end: this is
    the exact program (gather rings + masked scatter rings over table and
    slots) that tests/test_pallas_tpu.py::test_native_layout_apply_ring_tpu
    executes on hardware."""
    from unittest import mock

    from wholegraph_tpu.embedding.embedding import _optimizer_step
    from wholegraph_tpu.embedding.optimizers import create_optimizer
    from wholegraph_tpu.memory import PartitionPlan

    plan = PartitionPlan.equal(8192, 1)
    opt = create_optimizer("lazy_adam")
    names = opt.slot_names
    R = 2048

    def step(shard, slots, uids, grads):
        return _optimizer_step(
            shard, slots, uids, grads, jnp.int32(1), jnp.float32(1e-3),
            plan=plan, opt=opt, slot_names=names,
        )

    with mock.patch(
        "wholegraph_tpu.embedding.embedding.jax.default_backend",
        return_value="tpu",
    ):
        out = jax.eval_shape(
            step,
            _aval((8192, 2, 128)),
            tuple(_aval((8192, 2, 128)) for _ in names),
            _aval((R,), jnp.int32),
            _aval((R, 256)),
        )
    assert out[0].shape == (8192, 2, 128)


@pytest.mark.parametrize("nplanes,itemsize_dtype", [
    (2, jnp.float32), (6, jnp.float32), (12, jnp.float32),
    (16, jnp.bfloat16),
])
def test_wide_row_split_heuristic(nplanes, itemsize_dtype):
    """Auto-split is ALWAYS whole-row: the r3 hardware A/B refuted the
    2KB-cliff hypothesis (whole slabs 229-272 GB/s at 3-6KB rows, every
    split slower — scripts/exp_widerow.py; DESIGN.md perf notes)."""
    from wholegraph_tpu.ops.gather_pallas import _wide_row_split

    assert _wide_row_split(nplanes, jnp.dtype(itemsize_dtype).itemsize) == 1


@pytest.mark.parametrize("nplanes", [6, 8, 12])
def test_wide_row_gather_scatter_trace(nplanes):
    """Wide-row split paths keep their logical shapes through tracing."""
    out = jax.eval_shape(
        _gather_rows_pallas3_impl,
        _aval((8192, nplanes, 128)),
        _aval((2048,), jnp.int32),
    )
    assert out.shape == (2048, nplanes, 128)
    out = jax.eval_shape(
        scatter_rows_pallas3,
        _aval((8192, nplanes, 128)),
        _aval((1024,), jnp.int32),
        _aval((1024, nplanes, 128)),
    )
    assert out.shape == (8192, nplanes, 128)
    out = jax.eval_shape(
        scatter_rows_masked3,
        _aval((8192, nplanes, 128)),
        _aval((1024,), jnp.int32),
        _aval((1024, nplanes, 128)),
    )
    assert out.shape == (8192, nplanes, 128)


class TestHostSpanPlan:
    """_span_plan is pure jnp: validate the coalescing plan on CPU by
    emulating the span fetch with numpy and checking row-exact recovery."""

    def _emulate(self, slots_np, n_rows, dim, span_rows, max_spans):
        import numpy as np

        from wholegraph_tpu.ops.gather_pallas import _span_plan

        table = np.arange(n_rows * dim, dtype=np.float32).reshape(n_rows, dim)
        fetch_ids, idx_orig, overflow = jax.jit(
            _span_plan, static_argnums=(1, 2)
        )(jnp.asarray(slots_np), span_rows, max_spans)
        fetch_ids = np.asarray(fetch_ids)
        idx_orig = np.asarray(idx_orig)
        # emulate _host_fetch_chunks: span id s -> rows [s*span_rows, +span_rows)
        fetched = np.zeros((max_spans * span_rows, dim), np.float32)
        for k, sid in enumerate(fetch_ids):
            if sid >= 0:
                fetched[k * span_rows:(k + 1) * span_rows] = table[
                    sid * span_rows:(sid + 1) * span_rows
                ]
        out = fetched[np.clip(idx_orig, 0, len(fetched) - 1)]
        return out, bool(overflow), table

    def test_clustered_exact(self):
        import numpy as np

        rs = np.random.RandomState(0)
        n_rows, dim, span_rows = 100_000, 8, 32
        B = 4096
        base = rs.randint(0, n_rows - 8000)
        slots = np.sort(rs.choice(8000, B, replace=False)).astype(np.int32) + base
        rs.shuffle(slots)  # plan sorts internally
        max_spans = 2 * ((B + span_rows - 1) // span_rows)
        out, overflow, table = self._emulate(slots, n_rows, dim, span_rows, max_spans)
        assert not overflow
        np.testing.assert_array_equal(out, table[slots])

    def test_invalid_slots_are_garbage_not_crash(self):
        import numpy as np

        rs = np.random.RandomState(1)
        n_rows, dim, span_rows, B = 50_000, 8, 32, 2048
        slots = np.sort(rs.choice(3000, B - 100, replace=False)).astype(np.int32)
        slots = np.concatenate([slots, np.full(100, -1, np.int32)])
        rs.shuffle(slots)
        out, overflow, table = self._emulate(slots, n_rows, dim, span_rows, 512)
        assert not overflow
        valid = slots >= 0
        np.testing.assert_array_equal(out[valid], table[slots[valid]])

    def test_scattered_overflows(self):
        import numpy as np

        rs = np.random.RandomState(2)
        n_rows, dim, span_rows, B = 1_000_000, 8, 32, 4096
        slots = rs.choice(n_rows, B, replace=False).astype(np.int32)
        max_spans = 2 * ((B + span_rows - 1) // span_rows)  # << B distinct spans
        _, overflow, _ = self._emulate(slots, n_rows, dim, span_rows, max_spans)
        assert overflow

    def test_duplicate_slots_share_span_fetch(self):
        import numpy as np

        rs = np.random.RandomState(3)
        n_rows, dim, span_rows, B = 10_000, 8, 32, 1024
        slots = rs.choice(600, B, replace=True).astype(np.int32)
        out, overflow, table = self._emulate(slots, n_rows, dim, span_rows, 256)
        assert not overflow
        np.testing.assert_array_equal(out, table[slots])


def test_weighted_block_ladder_traces_tpu_path():
    """The TPU weighted sampler (block ladder + single-shot 2-block fast
    path under lax.cond) traces end-to-end off-hardware."""
    from unittest import mock

    from wholegraph_tpu.ops.sampling import _sample_positions_weighted

    B, K = 512, 15
    start = _aval((B,), jnp.int32)
    deg = _aval((B,), jnp.int32)
    centers = _aval((B,), jnp.int32)
    weights = _aval((200_000,), jnp.float32)

    def f(start, deg, centers, weights):
        return _sample_positions_weighted(
            start, deg, K, 7, centers, 0, weights, 65536
        )

    with mock.patch(
        "wholegraph_tpu.ops.sampling.jax.default_backend", return_value="tpu"
    ):
        pos, mask = jax.eval_shape(f, start, deg, centers, weights)
    assert pos.shape == (B, K) and mask.shape == (B, K)
