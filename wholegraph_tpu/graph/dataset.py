"""Node-classification datasets + batch iteration.

Analog of the reference's data layer (reference: python torch/data_loader.py
:20-103 — pickle-based node-classification splits + DistributedSampler
loaders, and examples/ogbn_papers100m_convert.py's converted binary layout).

Supported on-disk layout (the reference's converted format):
  <root>/<graph>/
    homograph_csr_row_ptr   int64[N+1]   (binary)
    homograph_csr_col_idx   int32/int64[E]
    node_feat.bin           float[N, F]  (optional; or loaded via filelist)
    train_label.pkl / valid_label.pkl / test_label.pkl:
        pickled dict {"idx": int64[n], "label": int[n]}

Plus a synthetic generator for offline development (no network access).
"""

from __future__ import annotations

import dataclasses
import os
import pickle
from typing import Iterator, Optional, Tuple

import numpy as np



@dataclasses.dataclass
class NodeClassificationSplit:
    idx: np.ndarray
    label: np.ndarray


@dataclasses.dataclass
class NodeClassificationDataset:
    """In-memory description of a node-classification task."""

    name: str
    node_count: int
    edge_count: int
    feat_dim: int
    num_classes: int
    row_ptr: np.ndarray
    col: np.ndarray
    features: Optional[np.ndarray]  # None when features load via filelist
    train: NodeClassificationSplit
    valid: NodeClassificationSplit
    test: NodeClassificationSplit
    feature_files: Optional[list] = None


def load_pickle_split(path: str) -> NodeClassificationSplit:
    with open(path, "rb") as f:
        d = pickle.load(f)
    return NodeClassificationSplit(
        idx=np.asarray(d["idx"], np.int64), label=np.asarray(d["label"]).reshape(-1)
    )


def load_converted_dataset(root_dir: str, graph_name: str, feat_dim: int,
                           num_classes: int) -> NodeClassificationDataset:
    """Load the reference's converted binary layout."""
    d = os.path.join(root_dir, graph_name)
    row_ptr = np.fromfile(os.path.join(d, "homograph_csr_row_ptr"), np.int64)
    col_path = os.path.join(d, "homograph_csr_col_idx")
    col = np.fromfile(col_path, np.int32)
    n = len(row_ptr) - 1
    if len(col) and (col.max() >= n or os.path.getsize(col_path) == 8 * (row_ptr[-1])):
        col = np.fromfile(col_path, np.int64).astype(np.int64)
    feat_path = os.path.join(d, "node_feat.bin")
    features = None
    feature_files = None
    if os.path.exists(feat_path):
        feature_files = [feat_path]
    return NodeClassificationDataset(
        name=graph_name,
        node_count=n,
        edge_count=int(row_ptr[-1]),
        feat_dim=feat_dim,
        num_classes=num_classes,
        row_ptr=row_ptr,
        col=col,
        features=features,
        train=load_pickle_split(os.path.join(d, "train_label.pkl")),
        valid=load_pickle_split(os.path.join(d, "valid_label.pkl")),
        test=load_pickle_split(os.path.join(d, "test_label.pkl")),
        feature_files=feature_files,
    )


def synthetic_dataset(
    n: int = 10_000,
    avg_deg: int = 15,
    feat_dim: int = 64,
    num_classes: int = 8,
    seed: int = 0,
    homophily: float = 0.8,
) -> NodeClassificationDataset:
    """Community-structured synthetic graph (labels recoverable from
    neighborhoods) for offline end-to-end runs."""
    rs = np.random.RandomState(seed)
    labels = rs.randint(0, num_classes, n)
    deg = np.maximum(rs.poisson(avg_deg, n), 1)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    same = rs.rand(len(src)) < homophily
    dst = np.empty(len(src), np.int64)
    # same-class targets: choose random node with the same label via per-class pools
    pools = [np.where(labels == c)[0] for c in range(num_classes)]
    for c in range(num_classes):
        m = same & (labels[src] == c)
        dst[m] = pools[c][rs.randint(0, len(pools[c]), m.sum())]
    m = ~same
    dst[m] = rs.randint(0, n, m.sum())
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    feats = (
        rs.randn(n, feat_dim).astype(np.float32)
        + np.eye(num_classes, feat_dim, dtype=np.float32)[labels] * 1.5
    )
    perm = rs.permutation(n)
    n_train, n_valid = int(n * 0.6), int(n * 0.2)
    mk = lambda idx: NodeClassificationSplit(idx=np.sort(idx), label=labels[np.sort(idx)])
    return NodeClassificationDataset(
        name="synthetic",
        node_count=n,
        edge_count=int(row_ptr[-1]),
        feat_dim=feat_dim,
        num_classes=num_classes,
        row_ptr=row_ptr,
        col=dst.astype(np.int32),
        features=feats,
        train=mk(perm[:n_train]),
        valid=mk(perm[n_train : n_train + n_valid]),
        test=mk(perm[n_train + n_valid :]),
    )


def batch_iterator(
    split: NodeClassificationSplit,
    batch_size: int,
    *,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
    process_rank: int = 0,
    process_count: int = 1,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Shuffled, process-sharded mini-batches (DistributedSampler analog,
    torch/data_loader.py:72-78).  Batches are padded-free: drop_last defaults
    True like the reference's training loader."""
    idx = split.idx
    order = np.arange(len(idx))
    if shuffle:
        np.random.RandomState(seed).shuffle(order)
    order = order[process_rank::process_count]
    nb = len(order) // batch_size if drop_last else -(-len(order) // batch_size)
    for b in range(nb):
        sel = order[b * batch_size : (b + 1) * batch_size]
        yield idx[sel], split.label[sel]
