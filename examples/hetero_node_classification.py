"""Heterogeneous (typed-node + typed-edge) node classification.

The MAG240M-shaped task the reference only reaches through DGL-delegated
RGCN examples (reference context: python/pylibwholegraph's gnn_model.py
framework dispatch; no typed-node store exists there).  Here the whole
stack is native: per-type sharded feature tables (HeteroFeatureStore) ->
unified-id multilayer sampling with relation-typed edges -> TypedProjection
+ R-GCN (HeteroGNN) -> optional per-type sparse table updates.

Run (CPU 8-virtual-device smoke):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/hetero_node_classification.py --smoke --epochs 2
"""

from __future__ import annotations

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

import wholegraph_tpu as wg
from wholegraph_tpu.config import make_parser, parse_fanouts
from wholegraph_tpu.embedding import create_optimizer
from wholegraph_tpu.graph import HeteroFeatureStore, synthetic_hetero_dataset
from wholegraph_tpu.models import HeteroGNN, accuracy, cross_entropy_loss


def main():
    ap = make_parser("hetero node classification (wholegraph_tpu)")
    ap.add_argument("--papers", type=int, default=4000)
    ap.add_argument("--authors", type=int, default=1500)
    ap.add_argument("--insts", type=int, default=200)
    ap.add_argument("--smoke", action="store_true",
                    help="tiny fast preset for first-touch runs and CI")
    args = ap.parse_args()
    if args.smoke:
        args.papers, args.authors, args.insts = 1500, 600, 100
        args.classnum = 8
        args.hiddensize = 32
        args.batchsize = 256
        args.valid_batchsize = 512
        args.neighbors = ",".join(["5"] * args.layernum)
    fanouts = parse_fanouts(args.neighbors)
    assert len(fanouts) == args.layernum, "--neighbors must match --layernum"

    mesh = wg.parallel.launch.init()
    world = mesh.size
    print(f"mesh: {world} devices on {jax.default_backend()}")

    ds = synthetic_hetero_dataset(
        n_paper=args.papers, n_author=args.authors, n_inst=args.insts,
        num_classes=args.classnum, seed=args.seed,
    )
    space, g = ds["space"], ds["graph"]
    print(
        f"hetero dataset: {dict(zip(space.names, space.counts))} nodes, "
        f"{g.edge_count} edges, {g.num_relations} relations "
        f"({', '.join(ds['relations'])})"
    )

    store = HeteroFeatureStore.create(
        mesh, space,
        optimizer=create_optimizer(args.embed_optimizer)
        if args.train_embedding else None,
    )
    states = store.from_arrays(ds["features"])

    model = HeteroGNN(
        model_type="rgcn",
        hidden_dim=args.hiddensize,
        num_classes=args.classnum,
        num_layers=args.layernum,
        num_relations=g.num_relations,
        dropout=args.dropout,
    )

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    labels_all = ds["labels"]

    def batches(split, bs, seed, shuffle=True):
        idx = np.asarray(split)
        if shuffle:
            idx = idx[np.random.RandomState(seed).permutation(len(idx))]
        bs = min(bs, max(len(idx) // world, 1) * world)
        n_full = len(idx) // bs
        for i in range(max(n_full, 1)):
            part = idx[i * bs:(i + 1) * bs]
            n_valid = len(part)
            if len(part) < bs:
                part = np.pad(part, (0, bs - len(part)), mode="edge")
            yield (
                put(part.astype(np.int32), P("data")),
                put(labels_all[part].astype(np.int32), P("data")),
                n_valid,
            )

    # init params from one sampled batch (paper local ids ARE global ids:
    # papers sit at offset 0 of the unified space)
    centers0, labels0, _ = next(batches(ds["train"], args.batchsize, args.seed))
    ml0 = g.multilayer_sample(centers0, fanouts, seed=0)
    rows0, masks0 = store.gather_typed(states, ml0.unique_gids)
    params = model.init(jax.random.PRNGKey(args.seed), rows0, masks0, sample=ml0)

    dense_opt = optax.adam(args.lr)
    opt_state = dense_opt.init(params)
    train_emb = bool(args.train_embedding)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_step(params, states, opt_state, centers, labels, seed, dropout_key):
        ml = g.multilayer_sample(centers, fanouts, seed=seed)
        rows, masks = store.gather_typed(states, ml.unique_gids)

        def loss_fn(p, r):
            logits = model.apply(
                p, r, masks, sample=ml, train=True, rngs={"dropout": dropout_key}
            )
            return cross_entropy_loss(logits, labels), logits

        (loss, logits), (dp, dr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, rows)
        updates, opt_state = dense_opt.update(dp, opt_state, params)
        params = optax.apply_updates(params, updates)
        if train_emb:
            states = store.apply_gradients(
                states, ml.unique_gids, dr, args.lr * 0.1, mask=ml.unique_mask
            )
        return params, states, opt_state, loss, accuracy(logits, labels)

    @jax.jit
    def eval_step(params, states, centers, labels):
        ml = g.multilayer_sample(centers, fanouts, seed=0)
        rows, masks = store.gather_typed(states, ml.unique_gids)
        logits = model.apply(params, rows, masks, sample=ml, train=False)
        # Per-sample outputs so padded slots can be excluded by the caller.
        correct = (jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32)
        return cross_entropy_loss(logits, labels), correct

    def run_eval(split, bs):
        # Sample-weighted: edge-mode padding duplicates real samples at the
        # tail of the last batch — drop those slots from the reduction.
        loss_sum = correct_sum = n_sum = 0.0
        for centers, labels, n_valid in batches(split, bs, 0, shuffle=False):
            loss, correct = eval_step(params, states, centers, labels)
            correct = np.asarray(correct)[:n_valid]
            loss_sum += float(loss) * n_valid  # batch-mean loss, ~exact
            correct_sum += float(correct.sum())
            n_sum += n_valid
        return loss_sum / n_sum, correct_sum / n_sum

    train_start = time.perf_counter()
    step = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        ep_losses = []
        for centers, labels, _ in batches(
            ds["train"], args.batchsize, args.seed + epoch
        ):
            params, states, opt_state, loss, acc = train_step(
                params, states, opt_state, centers, labels,
                step, jax.random.PRNGKey(step),
            )
            ep_losses.append(float(loss))
            step += 1
        epoch_time = time.perf_counter() - t0
        vloss, vacc = run_eval(ds["valid"], args.valid_batchsize)
        print(
            f"[EPOCH_TIME] {epoch_time:.3f} s epoch {epoch}: "
            f"train loss {np.mean(ep_losses):.4f} valid loss {vloss:.4f} "
            f"valid acc {vacc*100:.2f}%"
        )
    print(f"[TRAIN_TIME] {time.perf_counter() - train_start:.3f} s")
    tloss, tacc = run_eval(ds["test"], args.valid_batchsize)
    print(f"[TEST] loss {tloss:.4f} accuracy {tacc*100:.2f}%")


if __name__ == "__main__":
    main()
