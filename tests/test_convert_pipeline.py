"""OGB-format conversion pipeline end-to-end: a fake extracted OGB numpy
directory -> examples/convert_dataset.convert_ogb -> the reference binary
layout -> load_converted_dataset -> the FULL training example (filelist
feature load through the native reader, sampling, training, accuracy).

This is the exact path a real ogbn-arxiv run takes minus the download
(the environment has no egress; BASELINE.md records this)."""

import os
import pickle
import re
import subprocess
import sys

import numpy as np
import pytest

_ROOT = os.path.join(os.path.dirname(__file__), "..")
sys.path.insert(0, os.path.join(_ROOT, "examples"))


def _make_fake_ogb(tmp_path, n=2000, feat_dim=32, num_classes=8):
    """Write an extracted-OGB-style numpy dir from the learnable synthetic
    community graph (so the downstream training accuracy is meaningful)."""
    from wholegraph_tpu.graph.dataset import synthetic_dataset

    ds = synthetic_dataset(n=n, feat_dim=feat_dim, num_classes=num_classes)
    ogb = tmp_path / "ogb_raw"
    ogb.mkdir()
    deg = np.diff(ds.row_ptr)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    np.save(ogb / "edge_index.npy", np.stack([src, ds.col.astype(np.int64)]))
    np.save(ogb / "node_feat.npy", ds.features.astype(np.float32))
    labels = np.zeros(n, np.int64)
    for split in (ds.train, ds.valid, ds.test):
        labels[split.idx] = split.label
    np.save(ogb / "label.npy", labels)
    np.save(ogb / "train_idx.npy", ds.train.idx)
    np.save(ogb / "valid_idx.npy", ds.valid.idx)
    np.save(ogb / "test_idx.npy", ds.test.idx)
    return ogb, ds


def test_convert_ogb_layout_and_loader(tmp_path):
    from convert_dataset import convert_ogb

    from wholegraph_tpu.graph.dataset import load_converted_dataset

    ogb, ds = _make_fake_ogb(tmp_path)
    out = tmp_path / "converted"
    # add_reverse=False keeps the graph byte-comparable to the source CSR
    convert_ogb(str(ogb), str(out), "fakearxiv", add_reverse=False)
    d = out / "fakearxiv"
    assert (d / "homograph_csr_row_ptr").exists()
    assert (d / "homograph_csr_col_idx").exists()
    assert (d / "node_feat.bin").exists()
    got = load_converted_dataset(str(out), "fakearxiv", ds.feat_dim, ds.num_classes)
    assert got.node_count == ds.node_count
    assert got.edge_count == ds.edge_count
    np.testing.assert_array_equal(got.row_ptr, ds.row_ptr)
    np.testing.assert_array_equal(np.sort(got.col), np.sort(ds.col))
    np.testing.assert_array_equal(got.train.idx, ds.train.idx)
    np.testing.assert_array_equal(got.test.label, ds.test.label)
    # features load via filelist (native reader path)
    assert got.feature_files


@pytest.mark.slow
def test_converted_dataset_trains_to_accuracy(tmp_path):
    """The full example on a CONVERTED dataset (filelist feature load)
    reaches the same pinned accuracy bar as the in-memory synthetic run."""
    from convert_dataset import convert_ogb

    ogb, ds = _make_fake_ogb(tmp_path)
    out = tmp_path / "converted"
    convert_ogb(str(ogb), str(out), "fakearxiv", add_reverse=False)

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = ""
    env["XLA_FLAGS"] = (
        env.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
    )
    proc = subprocess.run(
        [
            sys.executable,
            os.path.join(_ROOT, "examples", "node_classification.py"),
            "--graph-name", "fakearxiv", "--root-dir", str(out),
            "--smoke", "--epochs", "10", "--full-graph-eval", "--seed", "0",
        ],
        capture_output=True, text=True, timeout=420, env=env,
    )
    assert proc.returncode == 0, proc.stdout + proc.stderr
    m = re.search(r"\[TEST\] loss [\d.]+ accuracy ([\d.]+)%", proc.stdout)
    assert m, proc.stdout
    acc = float(m.group(1))
    assert acc >= 80.0, f"converted-dataset accuracy: {acc}%\n{proc.stdout}"
