"""Heterogeneous link prediction with an RGCN encoder (BASELINE config 5
shape: 'RGCN heterogeneous link prediction ... pod-wide embedding store').

Encoder: sampled multilayer RGCN over typed edges; decoder: DistMult
score <h_src, R_r, h_dst> with uniform negative sampling; loss: BCE.
The reference runs this family through its DGL examples — here it is native.

Run (CPU smoke):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/link_prediction.py --epochs 2
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

import flax.linen as nn
import wholegraph_tpu as wg
from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.models import HomoGNN


def synthetic_hetero(n=4000, num_rel=4, avg_deg=10, feat_dim=32, seed=0):
    """Typed-edge synthetic graph: relation r links community (c, c+r)."""
    rs = np.random.RandomState(seed)
    ncomm = 8
    comm = rs.randint(0, ncomm, n)
    E = n * avg_deg
    src = rs.randint(0, n, E)
    rel = rs.randint(0, num_rel, E)
    # prefer dst in community (comm[src] + rel) % ncomm
    tgt_comm = (comm[src] + rel) % ncomm
    pools = [np.where(comm == c)[0] for c in range(ncomm)]
    dst = np.empty(E, np.int64)
    for c in range(ncomm):
        m = tgt_comm == c
        dst[m] = pools[c][rs.randint(0, len(pools[c]), m.sum())]
    feats = rs.randn(n, feat_dim).astype(np.float32)
    feats += np.eye(ncomm, feat_dim, dtype=np.float32)[comm] * 1.0
    return src, rel, dst, feats, n


class DistMult(nn.Module):
    num_relations: int
    dim: int

    @nn.compact
    def __call__(self, h_src, rel, h_dst):
        R = self.param(
            "rel_emb", nn.initializers.glorot_uniform(), (self.num_relations, self.dim)
        )
        return jnp.sum(h_src * jnp.take(R, rel, axis=0) * h_dst, axis=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--batchsize", type=int, default=512)
    ap.add_argument("--hiddensize", type=int, default=32)
    ap.add_argument("--num-rel", type=int, default=4)
    ap.add_argument("--neighbors", default="5,5")
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    fanouts = tuple(int(x) for x in args.neighbors.split(","))

    mesh = wg.parallel.launch.init()
    src, rel, dst, feats, n = synthetic_hetero(num_rel=args.num_rel, seed=args.seed)
    g = GraphStructure.from_coo(
        src, dst, n, edge_type=rel, num_relations=args.num_rel, add_reverse=False
    )
    feat_tab = wg.ShardedTable.from_array(mesh, feats)

    E = len(src)
    perm = np.random.RandomState(1).permutation(E)
    train_e, test_e = perm[: int(E * 0.9)], perm[int(E * 0.9) :]

    D = args.hiddensize
    encoder = HomoGNN(
        model_type="rgcn",
        hidden_dim=D,
        num_classes=D,  # final layer emits embeddings, not classes
        num_layers=len(fanouts),
        num_relations=args.num_rel,
        dropout=0.0,
    )
    decoder = DistMult(num_relations=args.num_rel, dim=D)
    B = args.batchsize
    C = 3 * B  # center capacity: src + dst + neg (pre-dedup upper bound)

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    def make_batch(edge_ids, rs):
        s, r, d = src[edge_ids], rel[edge_ids], dst[edge_ids]
        neg = rs.randint(0, n, len(edge_ids))
        nodes, inv = np.unique(np.concatenate([s, d, neg]), return_inverse=True)
        centers = np.zeros(C, np.int64)
        centers[: len(nodes)] = nodes
        mask = np.zeros(C, bool)
        mask[: len(nodes)] = True
        return (
            put(centers, P("data")),
            put(mask, P("data")),
            put(inv[: len(s)], P("data")),          # src positions
            put(inv[len(s) : 2 * len(s)], P("data")),  # dst positions
            put(inv[2 * len(s) :], P("data")),      # neg positions
            put(r, P("data")),
        )

    # init
    rs = np.random.RandomState(args.seed)
    batch = make_batch(train_e[:B], rs)
    centers, cmask, *_ = batch
    ml0 = g.multilayer_sample(centers, fanouts, seed=0, center_mask=cmask)
    x0 = feat_tab.gather(ml0.unique_gids)
    enc_params = encoder.init(jax.random.PRNGKey(0), x0, sample=ml0)
    dec_params = decoder.init(
        jax.random.PRNGKey(1), jnp.zeros((B, D)), jnp.zeros((B,), jnp.int32), jnp.zeros((B, D))
    )
    params = {"enc": enc_params, "dec": dec_params}
    opt = optax.adam(args.lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, fdata, centers, cmask, sp, dp, np_, r, seed):
        ml = g.multilayer_sample(centers, fanouts, seed=seed, center_mask=cmask)
        rows = wg.ops.gather(
            fdata, ml.unique_gids, plan=feat_tab.plan, mesh=mesh
        ) * ml.unique_mask[:, None]

        def loss_fn(p):
            h = encoder.apply(p["enc"], rows, sample=ml)  # [C, D]
            pos = decoder.apply(p["dec"], h[sp], r, h[dp])
            neg = decoder.apply(p["dec"], h[sp], r, h[np_])
            loss = jnp.mean(
                optax.sigmoid_binary_cross_entropy(pos, jnp.ones_like(pos))
            ) + jnp.mean(
                optax.sigmoid_binary_cross_entropy(neg, jnp.zeros_like(neg))
            )
            auc_proxy = jnp.mean((pos > neg).astype(jnp.float32))
            return loss, auc_proxy

        (loss, auc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss, auc

    t_start = time.perf_counter()
    it = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        order = np.random.RandomState(epoch).permutation(len(train_e))
        losses, aucs = [], []
        for b in range(len(order) // B):
            eids = train_e[order[b * B : (b + 1) * B]]
            centers, cmask, sp, dp, np_, r = make_batch(eids, rs)
            params, opt_state, loss, auc = step(
                params, opt_state, feat_tab.data, centers, cmask, sp, dp, np_, r, it
            )
            losses.append(float(loss))
            aucs.append(float(auc))
            it += 1
        print(
            f"[EPOCH_TIME] {time.perf_counter()-t0:.3f} s epoch {epoch}: "
            f"loss {np.mean(losses):.4f} pairwise-rank acc {np.mean(aucs)*100:.2f}%"
        )
    print(f"[TRAIN_TIME] {time.perf_counter()-t_start:.3f} s")

    # test
    aucs = []
    for b in range(max(len(test_e) // B, 1)):
        eids = test_e[b * B : (b + 1) * B]
        if len(eids) < B:
            break
        centers, cmask, sp, dp, np_, r = make_batch(eids, rs)
        _, _, loss, auc = step(
            params, opt_state, feat_tab.data, centers, cmask, sp, dp, np_, r, 0
        )
        aucs.append(float(auc))
    if aucs:
        print(f"[TEST] pairwise-rank acc {np.mean(aucs)*100:.2f}%")


if __name__ == "__main__":
    main()
