"""Public API surface smoke: every exported symbol imports and is real
(guards against refactors silently breaking the package interface)."""

import importlib

import pytest

MODULES = [
    "wholegraph_tpu",
    "wholegraph_tpu.memory",
    "wholegraph_tpu.parallel",
    "wholegraph_tpu.ops",
    "wholegraph_tpu.embedding",
    "wholegraph_tpu.graph",
    "wholegraph_tpu.models",
    "wholegraph_tpu.io",
    "wholegraph_tpu.utils",
    "wholegraph_tpu.config",
    "wholegraph_tpu.testing",
    "wholegraph_tpu.interop",
]


@pytest.mark.parametrize("mod", MODULES)
def test_module_all_resolves(mod):
    m = importlib.import_module(mod)
    for name in getattr(m, "__all__", []):
        assert getattr(m, name, None) is not None, f"{mod}.{name} missing"


def test_key_entry_points_exist():
    import wholegraph_tpu as wg

    assert callable(wg.ShardedTable.from_array)
    assert callable(wg.ShardedTable.from_filelist)
    assert callable(wg.ops.gather)
    assert callable(wg.ops.gather_hierarchical)
    assert callable(wg.ops.csr_sample_neighbors)
    assert callable(wg.embedding.Embedding.create)
    assert callable(wg.embedding.build_hot_cache)
    assert callable(wg.graph.GraphStructure.from_coo)
    assert callable(wg.io.load_filelist)
    assert callable(wg.models.HomoGNN)
    assert callable(wg.parallel.launch.init)
    assert callable(wg.testing.host_sample_uniform)
