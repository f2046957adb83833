"""Trainable embedding + sparse optimizer tests vs host reference
(reference: cpp/tests/wholememory_ops/wholememory_embedding_gradient_apply_tests.cu
— deduped gradient apply compared against a host optimizer replay, swept over
optimizer types and partition plans)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

import wholegraph_tpu.embedding as emb_mod
from wholegraph_tpu.embedding import Embedding, EmbeddingState
from wholegraph_tpu.memory import PartitionPlan

from conftest import deterministic_rows


# ---------------------------------------------------------------------------
# Host reference optimizers (numpy replay of the reference CUDA kernels)
# ---------------------------------------------------------------------------


def host_dedup(ids, grads):
    uids, inv = np.unique(ids, return_inverse=True)
    seg = np.zeros((len(uids), grads.shape[1]), np.float64)
    np.add.at(seg, inv, grads.astype(np.float64))
    return uids, seg


def host_apply(opt, table, slots, ids, grads, step, lr):
    uids, g = host_dedup(ids, grads)
    w = table[uids].astype(np.float64)
    if opt.name == "sgd":
        g = g + opt.weight_decay * w
        table[uids] = (w - lr * g).astype(table.dtype)
    elif opt.name == "lazy_adam":
        if not opt.adam_w:
            g = g + opt.weight_decay * w
        m = opt.beta1 * slots["m"][uids] + (1 - opt.beta1) * g
        v = opt.beta2 * slots["v"][uids] + (1 - opt.beta2) * g * g
        mhat = m / (1 - opt.beta1**step)
        vhat = v / (1 - opt.beta2**step)
        upd = mhat / (np.sqrt(vhat) + opt.epsilon)
        if opt.adam_w:
            upd = upd + opt.weight_decay * w
        table[uids] = (w - lr * upd).astype(table.dtype)
        slots["m"][uids] = m
        slots["v"][uids] = v
    elif opt.name == "rms_prop":
        g = g + opt.weight_decay * w
        v = opt.alpha * slots["v"][uids] + (1 - opt.alpha) * g * g
        table[uids] = (w - lr * g / (np.sqrt(v) + opt.epsilon)).astype(table.dtype)
        slots["v"][uids] = v
    elif opt.name == "ada_grad":
        g = g + opt.weight_decay * w
        s = slots["state_sum"][uids] + g * g
        table[uids] = (w - lr * g / (np.sqrt(s) + opt.epsilon)).astype(table.dtype)
        slots["state_sum"][uids] = s
    return table, slots


OPTS = [
    emb_mod.SGD(weight_decay=0.01),
    emb_mod.LazyAdam(),
    emb_mod.LazyAdam(adam_w=True, weight_decay=0.01),
    emb_mod.RMSProp(),
    emb_mod.AdaGrad(),
]


def put(mesh, x, spec):
    return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))


@pytest.mark.parametrize("opt", OPTS, ids=lambda o: o.name + ("_w" if getattr(o, "adam_w", False) else ""))
def test_apply_gradients_matches_host(mesh8, opt):
    n, dim, B = 500, 16, 128
    emb = Embedding.create(mesh8, n, dim, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)

    ref_table = init.astype(np.float64).copy()
    ref_slots = {k: np.zeros((n, dim), np.float64) for k in opt.slot_names}

    rng = np.random.RandomState(0)
    lr = 0.1
    for step in range(1, 4):
        ids = rng.randint(0, n, B).astype(np.int64)  # includes duplicates
        grads = rng.randn(B, dim).astype(np.float32)
        state = emb.apply_gradients(
            state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)), lr
        )
        ref_table, ref_slots = host_apply(opt, ref_table, ref_slots, ids, grads, step, lr)

    np.testing.assert_allclose(emb.to_array(state), ref_table, rtol=2e-5, atol=2e-5)
    for k in opt.slot_names:
        np.testing.assert_allclose(
            emb.slot_to_array(state, k), ref_slots[k], rtol=2e-5, atol=2e-5
        )
    assert int(state.step) == 3


def test_apply_gradients_world1():
    mesh1 = jax.sharding.Mesh(np.asarray(jax.devices()[:1]), ("data",))
    n, dim, B = 100, 8, 32
    opt = emb_mod.LazyAdam()
    emb = Embedding.create(mesh1, n, dim, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    rng = np.random.RandomState(1)
    ids = rng.randint(0, n, B).astype(np.int64)
    grads = rng.randn(B, dim).astype(np.float32)
    state = emb.apply_gradients(state, jnp.asarray(ids), jnp.asarray(grads), 0.05)
    ref_table, ref_slots = host_apply(
        opt, init.astype(np.float64).copy(),
        {k: np.zeros((n, dim), np.float64) for k in opt.slot_names},
        ids, grads, 1, 0.05,
    )
    np.testing.assert_allclose(emb.to_array(state), ref_table, rtol=2e-5, atol=2e-5)


def test_untouched_rows_and_slots_unchanged(mesh8):
    n, dim = 200, 8
    opt = emb_mod.LazyAdam()
    emb = Embedding.create(mesh8, n, dim, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    ids = np.array([3] * 8 + [77] * 8, dtype=np.int64)  # only rows 3 and 77
    grads = np.ones((16, dim), np.float32)
    state = emb.apply_gradients(
        state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)), 0.1
    )
    out = emb.to_array(state)
    touched = np.array([3, 77])
    untouched = np.setdiff1d(np.arange(n), touched)
    np.testing.assert_allclose(out[untouched], init[untouched])
    assert not np.allclose(out[touched], init[touched])
    m = emb.slot_to_array(state, "m")
    assert np.allclose(m[untouched], 0)
    assert not np.allclose(m[touched], 0)


def test_gather_roundtrip_with_custom_plan(mesh8):
    n, dim = 333, 16
    plan = PartitionPlan.round_robin(n, 8, 16)
    emb = Embedding.create(mesh8, n, dim, optimizer=emb_mod.SGD(), plan=plan)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    ids = np.random.RandomState(2).randint(0, n, 64)
    rows = emb.gather(state, put(mesh8, ids.astype(np.int64), P("data")))
    np.testing.assert_allclose(np.asarray(rows), init[ids])


def test_training_reduces_loss(mesh8):
    """End-to-end sanity: embedding rows learn a fixed target via gather +
    grad-on-rows + apply_gradients (the documented training pattern)."""
    n, dim, B = 64, 8, 64
    emb = Embedding.create(mesh8, n, dim, optimizer=emb_mod.LazyAdam())
    state = emb.init(jax.random.PRNGKey(0))
    target = deterministic_rows(n, dim)

    def loss_fn(rows, tgt):
        return jnp.mean((rows - tgt) ** 2)

    ids = np.arange(n, dtype=np.int64)
    ids_dev = put(mesh8, ids, P("data"))
    tgt_dev = put(mesh8, target, P("data", None))

    @jax.jit
    def train_step(state):
        rows = emb.gather(state, ids_dev)
        loss, grad_rows = jax.value_and_grad(loss_fn)(rows, tgt_dev)
        return emb.apply_gradients(state, ids_dev, grad_rows, 0.05), loss

    losses = []
    for _ in range(30):
        state, loss = train_step(state)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.2, losses[::10]


@pytest.mark.parametrize("opt", [emb_mod.SGD(weight_decay=0.01), emb_mod.LazyAdam()],
                         ids=["sgd", "lazy_adam"])
def test_apply_gradients_exact_under_full_skew(mesh8, opt):
    """EXACT apply path: a batch whose unique ids all live on one shard
    (maximal bucket overflow) loses nothing — matches the host replay, like
    the reference's dynamic alltoallv (embedding.cpp gather_gradient_apply
    never drops).  With local pre-dedup each device contributes one entry
    per unique id, so the common per-round dedup applies each optimizer step
    once with the full summed gradient."""
    n, dim, B = 512, 8, 256
    emb = Embedding.create(mesh8, n, dim, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    rng = np.random.RandomState(7)
    # ids restricted to shard 0's rows [0, 64): every bucket targets owner 0
    ids = rng.randint(0, 64, B).astype(np.int64)
    grads = rng.randn(B, dim).astype(np.float32)
    state = emb.apply_gradients(
        state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)), 0.1,
        capacity_factor=1.0,
    )
    ref_table, _ = host_apply(
        opt, init.astype(np.float64).copy(),
        {k: np.zeros((n, dim), np.float64) for k in opt.slot_names},
        ids, grads, 1, 0.1,
    )
    np.testing.assert_allclose(emb.to_array(state), ref_table, rtol=2e-5, atol=2e-5)


def test_apply_gradients_mask_excludes_padding(mesh8):
    """Padding slots (mask=False) must not touch any row's optimizer state —
    the id-0 spurious-momentum bug (ADVICE r1): masked ids map to the OOB
    sentinel and are dropped before bucketing."""
    n, dim = 128, 8
    opt = emb_mod.LazyAdam()
    emb = Embedding.create(mesh8, n, dim, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    # slots: half valid (row 5), half padding pointing at id 0
    ids = np.array([5] * 32 + [0] * 32, dtype=np.int64)
    mask = np.array([True] * 32 + [False] * 32)
    grads = np.ones((64, dim), np.float32)
    state = emb.apply_gradients(
        state,
        put(mesh8, ids, P("data")),
        put(mesh8, grads, P("data", None)),
        0.1,
        mask=put(mesh8, mask, P("data")),
    )
    out = emb.to_array(state)
    m = emb.slot_to_array(state, "m")
    np.testing.assert_allclose(out[0], init[0])  # row 0 untouched
    assert np.allclose(m[0], 0)  # no momentum leaked into row 0
    assert not np.allclose(out[5], init[5])  # the real id trained


@pytest.mark.parametrize("unique_chunk", [None, 1024])
def test_apply_assume_unique_matches_default(mesh8, unique_chunk):
    """assume_unique=True (skip the local dedup sort — the append_unique
    contract) and unique_chunk (touched-rows-proportional chunked apply,
    r5) must produce the same state as the default path for unique ids
    with suffix padding — the sampler unique-buffer shape."""
    n, dim, B = 700, 16, 2048
    opt = emb_mod.LazyAdam()
    rng = np.random.RandomState(3)
    perm = rng.permutation(n)
    n_valid = 600
    ids = np.full((B,), 0, np.int64)
    ids[:n_valid] = perm[:n_valid]  # unique valid prefix
    mask = np.zeros((B,), bool)
    mask[:n_valid] = True
    grads = rng.randn(B, dim).astype(np.float32)

    init = deterministic_rows(n, dim)
    results = []
    for kw in (
        dict(),
        dict(assume_unique=True, unique_chunk=unique_chunk),
    ):
        emb = Embedding.create(mesh8, n, dim, optimizer=opt)
        state = emb.from_array(init)
        state = emb.apply_gradients(
            state,
            put(mesh8, ids, P("data")),
            put(mesh8, grads, P("data", None)),
            0.1,
            mask=put(mesh8, mask, P("data")),
            **kw,
        )
        results.append(
            (emb.to_array(state),) + tuple(
                emb.slot_to_array(state, k) for k in opt.slot_names
            )
        )
    for a, b in zip(results[0], results[1]):
        np.testing.assert_array_equal(a, b)


def test_apply_unique_chunk_interior_padding_exact():
    """unique_chunk's loop bound is the LAST valid position, not a prefix
    assumption: interior all-padding chunks and a valid id in the final
    chunk must both be handled exactly (world=1 path)."""
    import wholegraph_tpu.parallel as par

    n, dim = 300, 8
    mesh1 = par.create_global_mesh(jax.devices()[:1])
    opt = emb_mod.LazyAdam()
    B = 4096
    ids = np.zeros((B,), np.int64)
    mask = np.zeros((B,), bool)
    # valid ids scattered: chunk 0 has some, chunk 1 empty, chunk 2 has one,
    # chunk 3 (last) empty -> loop must run 3 chunks and stop
    ids[5], mask[5] = 7, True
    ids[900], mask[900] = 11, True
    ids[2500], mask[2500] = 13, True
    grads = np.ones((B, dim), np.float32)
    init = deterministic_rows(n, dim)

    results = []
    for kw in (dict(), dict(assume_unique=True, unique_chunk=1024)):
        emb = Embedding.create(mesh1, n, dim, optimizer=opt)
        state = emb.from_array(init)
        state = emb.apply_gradients(
            state, jnp.asarray(ids), jnp.asarray(grads), 0.1,
            mask=jnp.asarray(mask), **kw,
        )
        results.append(emb.to_array(state))
    np.testing.assert_array_equal(results[0], results[1])
    # the three touched rows actually trained
    for r in (7, 11, 13):
        assert not np.allclose(results[1][r], init[r])


def test_apply_assume_unique_cross_device_dups(mesh8):
    """assume_unique only warrants per-device uniqueness; the SAME id on
    different devices must still be merged exactly by the receiver-side
    re-dedup of the exchange."""
    n, dim = 256, 8
    opt = emb_mod.SGD()
    B = 64  # 8 per device
    ids = np.full((B,), 42, np.int64)  # id 42 on EVERY device, once each
    mask = np.zeros((B,), bool)
    mask[::8] = True  # exactly one valid slot per device shard
    grads = np.ones((B, dim), np.float32)
    init = deterministic_rows(n, dim)

    results = []
    for kw in (dict(), dict(assume_unique=True)):
        emb = Embedding.create(mesh8, n, dim, optimizer=opt)
        state = emb.from_array(init)
        state = emb.apply_gradients(
            state, put(mesh8, ids, P("data")),
            put(mesh8, grads, P("data", None)), 0.1,
            mask=put(mesh8, mask, P("data")), **kw,
        )
        results.append(emb.to_array(state))
    np.testing.assert_array_equal(results[0], results[1])
    # 8 unit-grad contributions merged: row 42 moved by -0.1 * 8
    np.testing.assert_allclose(
        results[1][42], init[42] - 0.8, rtol=1e-5, atol=1e-5
    )


def test_bf16_table_end_to_end(mesh8):
    """bf16 embedding tables (reference half/bf16 dtype coverage,
    tensor_description.h:29-40) — gather serves bf16 rows bit-equal to the
    cast table; apply reads bf16 rows, steps in f32, and writes back the
    bf16 cast of the f32 result (slots stay f32)."""
    import ml_dtypes

    n, dim, B = 256, 16, 256
    opt = emb_mod.SGD()
    emb = Embedding.create(mesh8, n, dim, dtype=jnp.bfloat16, optimizer=opt)
    init = deterministic_rows(n, dim)
    state = emb.from_array(init)
    init_bf = init.astype(ml_dtypes.bfloat16)

    ids = np.arange(B, dtype=np.int64) % n
    rows = emb.gather(state, put(mesh8, ids, P("data")))
    assert rows.dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(rows).view(np.uint16), init_bf[ids % n].view(np.uint16)
    )

    grads = np.ones((B, dim), np.float32) * 0.5
    state = emb.apply_gradients(
        state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)),
        0.1,
    )
    out = emb.to_array(state)
    # host replay: read bf16 -> f32 math -> cast back to bf16
    ref = (
        init_bf[:B].astype(np.float32) - 0.1 * grads[:B]
    ).astype(ml_dtypes.bfloat16)
    np.testing.assert_array_equal(
        out[:B].view(np.uint16), ref.view(np.uint16)
    )
    # untouched rows unchanged
    np.testing.assert_array_equal(
        out[B:].view(np.uint16) if B < n else out[:0],
        init_bf[B:].view(np.uint16) if B < n else out[:0],
    )


def test_bf16_train_step_loss_decreases(mesh8):
    n, dim, B = 128, 16, 128
    emb = Embedding.create(mesh8, n, dim, dtype=jnp.bfloat16,
                           optimizer=emb_mod.LazyAdam())
    state = emb.init(jax.random.PRNGKey(0))
    target = deterministic_rows(n, dim)
    tgt_dev = put(mesh8, target, P("data", None))
    ids_dev = put(mesh8, np.arange(B, dtype=np.int64), P("data"))
    step = emb.make_train_step(
        lambda rows, tgt: jnp.mean(
            (rows.astype(jnp.float32) - tgt[: rows.shape[0]]) ** 2
        ),
        lr=0.05,
        apply_kwargs=dict(assume_unique=True),
    )
    losses = []
    for _ in range(20):
        state, loss = step(state, ids_dev, tgt_dev)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.5, losses[::5]


def test_make_train_step(mesh8):
    n, dim, B = 64, 8, 64
    emb = Embedding.create(mesh8, n, dim, optimizer=emb_mod.LazyAdam())
    state = emb.init(jax.random.PRNGKey(0))
    target = deterministic_rows(n, dim)
    tgt_dev = put(mesh8, target, P("data", None))
    ids_dev = put(mesh8, np.arange(n, dtype=np.int64), P("data"))

    step = emb.make_train_step(
        lambda rows, tgt: jnp.mean((rows - tgt) ** 2), lr=0.05
    )
    losses = []
    for _ in range(25):
        state, loss = step(state, ids_dev, tgt_dev)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.3, losses[::8]


def test_native_layout_bitequal_to_flat(mesh8):
    """native_layout=True stores table+slots as [cap, dim//128, 128]; every
    public result (gather, apply, to_array, slot_to_array) must be BIT-equal
    to the flat-layout twin — the layout changes only how rows move, not the
    math (elementwise optimizers run directly on the native row shape)."""
    from wholegraph_tpu.embedding import LazyAdam

    n, dim, B = 600, 128, 256
    init = deterministic_rows(n, dim)
    rng = np.random.RandomState(7)
    states = {}
    embs = {}
    for native in (False, True):
        emb = Embedding.create(
            mesh8, n, dim, optimizer=LazyAdam(), native_layout=native
        )
        embs[native] = emb
        states[native] = emb.from_array(init)
    assert states[True].table.ndim == 3 and states[False].table.ndim == 2

    for step in range(1, 4):
        ids = rng.randint(0, n, B).astype(np.int64)
        mask = rng.rand(B) > 0.1
        grads = rng.randn(B, dim).astype(np.float32)
        outs = {}
        for native in (False, True):
            emb, st = embs[native], states[native]
            rows = emb.gather(st, put(mesh8, ids, P("data")))
            outs[native] = np.asarray(rows)
            states[native] = emb.apply_gradients(
                st, put(mesh8, ids, P("data")),
                put(mesh8, grads, P("data", None)), 0.05,
                mask=put(mesh8, mask, P("data")),
            )
        np.testing.assert_array_equal(outs[False], outs[True])

    np.testing.assert_array_equal(
        embs[False].to_array(states[False]), embs[True].to_array(states[True])
    )
    for k in ("m", "v"):
        np.testing.assert_array_equal(
            embs[False].slot_to_array(states[False], k),
            embs[True].slot_to_array(states[True], k),
        )


def test_native_layout_checkpoint_roundtrip(mesh8, tmp_path):
    """save_embedding/load_embedding round-trips a native-layout state
    (parts are written flat; reload converts back to native)."""
    from wholegraph_tpu.embedding import LazyAdam
    from wholegraph_tpu.io.checkpoint import load_embedding, save_embedding

    n, dim = 300, 128
    emb = Embedding.create(mesh8, n, dim, optimizer=LazyAdam(), native_layout=True)
    state = emb.from_array(deterministic_rows(n, dim))
    ids = np.arange(64)
    grads = np.ones((64, dim), np.float32)
    state = emb.apply_gradients(
        state, put(mesh8, ids, P("data")), put(mesh8, grads, P("data", None)), 0.1
    )
    save_embedding(emb, state, str(tmp_path), "nat")
    state2 = load_embedding(emb, str(tmp_path), "nat")
    assert state2.table.ndim == 3
    np.testing.assert_array_equal(emb.to_array(state), emb.to_array(state2))
    for k in ("m", "v"):
        np.testing.assert_array_equal(
            emb.slot_to_array(state, k), emb.slot_to_array(state2, k)
        )
    assert int(state2.step) == int(state.step)
