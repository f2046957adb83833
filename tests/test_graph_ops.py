"""append_unique / self-loop / padded↔CSR tests (reference:
cpp/tests/graph_ops/append_unique_tests.cu, csr_add_self_loop_tests.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from wholegraph_tpu.ops.graph_ops import (
    add_self_loop_padded,
    append_unique,
    csr_add_self_loop,
    padded_to_csr,
)


def ref_append_unique(targets, neighbors, mask):
    uniq = list(targets)
    seen = set(targets)
    extra = sorted(set(int(x) for x, m in zip(neighbors, mask) if m) - seen)
    uniq += extra
    index = {v: i for i, v in enumerate(uniq)}
    nmap = np.array(
        [index[int(x)] if m else -1 for x, m in zip(neighbors, mask)], np.int32
    )
    return np.array(uniq, np.int32), nmap


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_append_unique_matches_reference(seed):
    rs = np.random.RandomState(seed)
    targets = rs.choice(1000, 20, replace=False).astype(np.int32)
    neighbors = rs.choice(
        np.concatenate([targets, rs.randint(0, 1000, 100)]), 64
    ).astype(np.int32)
    mask = rs.rand(64) > 0.2
    uids, ucount, nmap = append_unique(
        jnp.asarray(targets), jnp.asarray(neighbors), jnp.asarray(mask)
    )
    ref_uniq, ref_map = ref_append_unique(targets, neighbors, mask)
    uids = np.asarray(uids)
    assert int(ucount) == len(ref_uniq)
    np.testing.assert_array_equal(uids[: len(ref_uniq)], ref_uniq)
    assert (uids[len(ref_uniq):] == -1).all()
    np.testing.assert_array_equal(np.asarray(nmap), ref_map)


def test_append_unique_all_masked():
    uids, ucount, nmap = append_unique(
        jnp.asarray([5, 9]), jnp.asarray([1, 2, 3]), jnp.zeros(3, bool)
    )
    assert int(ucount) == 2
    np.testing.assert_array_equal(np.asarray(uids)[:2], [5, 9])
    np.testing.assert_array_equal(np.asarray(nmap), [-1, -1, -1])


def test_padded_to_csr_roundtrip():
    nbrs = jnp.asarray([[1, 2, -1], [3, -1, -1], [-1, -1, -1], [4, 5, 6]])
    mask = nbrs >= 0
    row_ptr, col, total = padded_to_csr(nbrs, mask)
    np.testing.assert_array_equal(np.asarray(row_ptr), [0, 2, 3, 3, 6])
    np.testing.assert_array_equal(np.asarray(col)[:6], [1, 2, 3, 4, 5, 6])
    assert int(total) == 6
    assert (np.asarray(col)[6:] == -1).all()


def test_csr_add_self_loop():
    # subgraph with 3 nodes: adjacency in local indices
    row_ptr = jnp.asarray([0, 2, 2, 3], jnp.int32)
    col = jnp.asarray([1, 2, 0, -1], jnp.int32)  # one pad slot
    new_ptr, new_col = csr_add_self_loop(row_ptr, col)
    np.testing.assert_array_equal(np.asarray(new_ptr), [0, 3, 4, 6])
    np.testing.assert_array_equal(np.asarray(new_col)[:6], [0, 1, 2, 1, 2, 0])


def test_add_self_loop_padded():
    nbrs = jnp.asarray([[7, -1], [8, 9]])
    mask = nbrs >= 0
    self_ids = jnp.asarray([0, 1])
    n2, m2 = add_self_loop_padded(nbrs, mask, self_ids)
    np.testing.assert_array_equal(np.asarray(n2), [[0, 7, -1], [1, 8, 9]])
    np.testing.assert_array_equal(np.asarray(m2), [[True, True, False], [True, True, True]])
