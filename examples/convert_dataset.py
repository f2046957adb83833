"""Convert OGB-style numpy data into the framework's binary layout.

Analog of the reference's papers100M converter (reference:
python/pylibwholegraph/examples/ogbn_papers100m_convert.py): writes
homograph_csr_row_ptr / homograph_csr_col_idx / node_feat.bin plus pickled
train/valid/test splits, the layout read by
wholegraph_tpu.graph.dataset.load_converted_dataset.

Works from either:
  --from-ogb <root>: an extracted OGB node-prediction dataset directory
      (edge_index.npy [2, E], node_feat.npy [N, F], label.npy, split .npy s)
  --synthetic: generate the synthetic community dataset (offline demo).
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from wholegraph_tpu.graph.dataset import synthetic_dataset


def write_dataset(out_dir, name, row_ptr, col, feats, splits):
    d = os.path.join(out_dir, name)
    os.makedirs(d, exist_ok=True)
    row_ptr.astype(np.int64).tofile(os.path.join(d, "homograph_csr_row_ptr"))
    col.astype(np.int32).tofile(os.path.join(d, "homograph_csr_col_idx"))
    if feats is not None:
        feats.astype(np.float32).tofile(os.path.join(d, "node_feat.bin"))
    for split_name, (idx, label) in splits.items():
        with open(os.path.join(d, f"{split_name}_label.pkl"), "wb") as f:
            pickle.dump({"idx": np.asarray(idx, np.int64), "label": np.asarray(label)}, f)
    print(f"wrote {name} to {d}")


def convert_ogb(root, out_dir, name, add_reverse=True):
    edge_index = np.load(os.path.join(root, "edge_index.npy"))
    feats = np.load(os.path.join(root, "node_feat.npy"), mmap_mode="r")
    labels = np.load(os.path.join(root, "label.npy")).reshape(-1)
    n = feats.shape[0]
    src, dst = edge_index[0].astype(np.int64), edge_index[1].astype(np.int64)
    if add_reverse:
        src, dst = np.concatenate([src, dst]), np.concatenate([dst, src])
    order = np.argsort(src, kind="stable")
    src, dst = src[order], dst[order]
    counts = np.bincount(src, minlength=n)
    row_ptr = np.concatenate([[0], np.cumsum(counts)])
    splits = {}
    for s in ("train", "valid", "test"):
        idx = np.load(os.path.join(root, f"{s}_idx.npy")).astype(np.int64)
        splits[s] = (idx, labels[idx])
    write_dataset(out_dir, name, row_ptr, dst, np.asarray(feats), splits)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--from-ogb", default=None, help="extracted OGB numpy dir")
    ap.add_argument("--synthetic", action="store_true")
    ap.add_argument("--out-dir", default=".")
    ap.add_argument("--name", default="synthetic")
    ap.add_argument("--nodes", type=int, default=10_000)
    ap.add_argument("--feat-dim", type=int, default=64)
    ap.add_argument("--classes", type=int, default=8)
    args = ap.parse_args()
    if args.from_ogb:
        convert_ogb(args.from_ogb, args.out_dir, args.name)
    else:
        ds = synthetic_dataset(
            n=args.nodes, feat_dim=args.feat_dim, num_classes=args.classes
        )
        write_dataset(
            args.out_dir,
            args.name,
            ds.row_ptr,
            ds.col,
            ds.features,
            {
                "train": (ds.train.idx, ds.train.label),
                "valid": (ds.valid.idx, ds.valid.label),
                "test": (ds.test.idx, ds.test.label),
            },
        )


if __name__ == "__main__":
    main()
