"""End-to-end node-classification training.

TPU-native analog of the reference's flagship example (reference:
python/pylibwholegraph/examples/node_classfication.py:72-242): sampled
mini-batch GNN training over a (optionally sharded, optionally trainable)
feature store, with per-epoch train/valid timing prints ([EPOCH_TIME] /
[TRAIN_TIME]) and final test accuracy.

Run (CPU 8-virtual-device smoke):
  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python examples/node_classification.py --graph-name synthetic --epochs 2
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
from wholegraph_tpu.embedding import Embedding, create_optimizer
from wholegraph_tpu.graph import GraphStructure
from wholegraph_tpu.graph.dataset import (
    batch_iterator,
    load_converted_dataset,
    synthetic_dataset,
)
from wholegraph_tpu.models import HomoGNN, accuracy, cross_entropy_loss


def main():
    ap = make_parser("node classification (wholegraph_tpu)")
    ap.add_argument("--full-graph-eval", action="store_true",
                    help="evaluate with exact full-graph message passing")
    ap.add_argument("--sharded-eval", action="store_true",
                    help="full-graph eval with row-sharded features/"
                         "activations/logits (pod-scale: nothing is ever "
                         "replicated; sage/gcn)")
    ap.add_argument("--halo-eval", action="store_true",
                    help="pod-scale full-graph eval over the edge-"
                         "partitioned halo layout (graph/partitioned.py): "
                         "one exact gather of each device's unique remote "
                         "sources per layer instead of per-edge exchange; "
                         "sage/gcn/gat/rgcn")
    ap.add_argument("--scan-epoch", action="store_true",
                    help="run each whole epoch inside one jit via lax.scan "
                         "(amortises per-step dispatch; TPU-native idiom)")
    ap.add_argument("--save-dir", default="",
                    help="checkpoint directory; saves the embedding state "
                         "asynchronously every --ckpt-every epochs "
                         "(background IO overlapped with training)")
    ap.add_argument("--ckpt-every", type=int, default=1)
    ap.add_argument("--synthetic-nodes", type=int, default=10_000,
                    help="node count for --graph-name synthetic")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny fast preset (small graph/model/batches) for "
                         "first-touch runs and CI: ~30s on the CPU mesh "
                         "instead of minutes")
    args = ap.parse_args()
    if args.smoke:
        args.synthetic_nodes = min(args.synthetic_nodes, 2000)
        args.feat_dim = 32
        args.classnum = 8
        args.hiddensize = 32
        args.batchsize = 256
        args.valid_batchsize = 512
        args.neighbors = ",".join(["5"] * args.layernum)
    fanouts = parse_fanouts(args.neighbors)
    assert len(fanouts) == args.layernum, "--neighbors must match --layernum"

    use_hier = args.embedding_memory_type == "hierarchy"
    mesh = wg.parallel.launch.init(use_hierarchy=use_hier)
    world = mesh.size
    # on a hierarchy (node x device) mesh the batch/table axis is the tuple;
    # flat exact a2a runs over it and gather(method='hierarchy') two-stages
    AXIS = ("node", "device") if use_hier else "data"
    P_BATCH = P(AXIS)
    P_ROWS = P(AXIS, None)
    print(f"mesh: {world} devices on {jax.default_backend()}"
          + (" (hierarchy)" if use_hier else ""))

    if args.graph_name == "synthetic":
        ds = synthetic_dataset(
            n=args.synthetic_nodes,
            feat_dim=args.feat_dim,
            num_classes=args.classnum,
        )
    else:
        ds = load_converted_dataset(
            args.root_dir, args.graph_name, args.feat_dim, args.classnum
        )
    print(f"dataset {ds.name}: {ds.node_count} nodes, {ds.edge_count} edges")

    edge_type = getattr(ds, "edge_type", None)
    num_rel = 0
    if args.model == "rgcn":
        if edge_type is None:
            # homogeneous dataset: derive deterministic pseudo-relations so
            # the R-GCN path (per-relation weights + per-relation mean) runs
            # end-to-end — relation-specific weights over an arbitrary edge
            # partition generalize GCN, so the task stays learnable
            num_rel = 2
            src = np.repeat(np.arange(ds.node_count), np.diff(ds.row_ptr))
            edge_type = ((src + ds.col) % num_rel).astype(np.int32)
        else:
            num_rel = int(np.max(edge_type)) + 1
    g = GraphStructure(
        row_ptr=jnp.asarray(ds.row_ptr, jnp.int32),
        col=jnp.asarray(ds.col, jnp.int32),
        node_count=ds.node_count,
        edge_count=ds.edge_count,
        max_degree=int(np.diff(ds.row_ptr).max()),
        edge_type=None if edge_type is None else jnp.asarray(edge_type, jnp.int32),
        num_relations=num_rel,
    )

    # feature store: sharded table; trainable => embedding with sparse optimizer.
    # The hot-row cache machinery works on flat ShardedTable views, so a
    # cached run keeps the table flat (native layout would pay a per-step
    # relayout inside fetch_rows instead of speeding the sparse apply).
    emb = Embedding.create(
        mesh,
        ds.node_count,
        ds.feat_dim,
        optimizer=create_optimizer(args.embed_optimizer),
        axis=AXIS,
        native_layout=False if args.cache_type != "none" else None,
    )
    if ds.features is not None:
        estate = emb.from_array(ds.features)
    elif ds.feature_files:
        tab = wg.io.load_filelist(
            ds.feature_files, mesh, ds.feat_dim, np.float32,
            round_robin_size=args.round_robin_size,
        )
        estate = emb.from_array(tab.to_array())
    else:
        estate = emb.init(jax.random.PRNGKey(args.seed))

    # cache tier (reference cache-type/cache-ratio options): replicate the
    # hottest rows.  Composes with --train-embedding: sparse updates
    # invalidate touched hot lines (served as misses until the per-epoch
    # refresh re-captures them) — the reference's trainable-cache
    # writeback/drop semantics (embedding.h:220-244).
    cache = None
    if args.cache_type != "none":
        from wholegraph_tpu.embedding.cache import build_hot_cache, hot_ids_by_degree
        from wholegraph_tpu.memory import ShardedTable

        feat_table = emb.as_sharded_table(estate)
        cache = build_hot_cache(
            feat_table, hot_ids_by_degree(ds.row_ptr, args.cache_ratio)
        )
        print(f"hot cache: {cache.size} rows replicated ({args.cache_type})")

    model = HomoGNN(
        model_type=args.model,
        hidden_dim=args.hiddensize,
        num_classes=ds.num_classes,
        num_layers=args.layernum,
        num_heads=args.heads,
        dropout=args.dropout,
        aggregator=args.aggregator,
        framework=args.framework,
        num_relations=num_rel,
    )

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    # init params from one sampled batch
    it = batch_iterator(ds.train, args.batchsize, seed=args.seed)
    centers0, labels0 = next(it)
    ml0 = g.multilayer_sample(put(centers0, P_BATCH), fanouts, seed=0)
    x0 = emb.gather(estate, ml0.unique_gids, capacity_factor=args.capacity_factor)
    params = model.init(jax.random.PRNGKey(args.seed), x0, sample=ml0)

    # skew probe (overflow observability, exact exchange pays extra ROUNDS
    # instead of dropping; reference alltoallv is dynamic): report how many
    # ids of a probe batch exceed the per-round bucket capacity
    if world > 1:
        from wholegraph_tpu.ops.gather import gather_overflow

        ov = int(gather_overflow(
            ml0.unique_gids, plan=emb.plan, mesh=mesh, axis=AXIS,
            capacity_factor=args.capacity_factor,
        )[0])
        if ov:
            print(f"[SKEW] probe batch: {ov} ids over the per-round bucket "
                  f"capacity (capacity_factor={args.capacity_factor}) - the "
                  f"exact exchange will pay extra rounds; consider raising "
                  f"--capacity-factor")
    dense_opt = optax.adam(args.lr)
    opt_state = dense_opt.init(params)

    train_emb = bool(args.train_embedding)
    weighted_sampling = args.sample_method == "weighted"
    if weighted_sampling and g.edge_weight is None:
        raise SystemExit("--sample-method weighted needs a graph with edge weights")

    def fetch_rows(estate, ml, cache):
        if cache is not None:
            from wholegraph_tpu.embedding.cache import gather_with_cache
            from wholegraph_tpu.memory import ShardedTable

            tab = emb.as_sharded_table(estate)
            return gather_with_cache(
                tab, cache, ml.unique_gids, capacity_factor=args.capacity_factor
            )
        return emb.gather(
            estate, ml.unique_gids, capacity_factor=args.capacity_factor
        )

    def _train_body(params, estate, opt_state, cache, centers, labels, seed, dropout_key):
        ml = g.multilayer_sample(
            centers, fanouts, seed=seed, weighted=weighted_sampling
        )
        ids = ml.unique_gids
        rows = fetch_rows(estate, ml, cache) * ml.unique_mask[:, None]

        def loss_fn(p, r):
            logits = model.apply(
                p, r, sample=ml, train=True, rngs={"dropout": dropout_key}
            )
            return cross_entropy_loss(logits, labels), logits

        (loss, logits), (dp, dr) = jax.value_and_grad(
            loss_fn, argnums=(0, 1), has_aux=True
        )(params, rows)
        updates, opt_state = dense_opt.update(dp, opt_state, params)
        params = optax.apply_updates(params, updates)
        if train_emb:
            estate = emb.apply_gradients(
                estate, ids, dr, args.lr * 0.1, mask=ml.unique_mask,
                capacity_factor=args.capacity_factor,
            )
            if cache is not None:
                # trainable + cache: stale touched lines until the per-epoch
                # refresh (reference writeback/drop, embedding.h:220-244)
                from wholegraph_tpu.embedding.cache import invalidate_touched

                cache = invalidate_touched(cache, jnp.where(ml.unique_mask, ids, -1))
        return params, estate, opt_state, cache, loss, accuracy(logits, labels)

    train_step = functools.partial(jax.jit, donate_argnums=(1,))(_train_body)

    @functools.partial(jax.jit, donate_argnums=(1,))
    def train_epoch_scan(params, estate, opt_state, cache, centers_s, labels_s, seeds, keys):
        """Whole epoch in one compiled scan: S steps with zero host round
        trips (the lax.scan idiom; sampling is traced per step)."""

        def body(carry, batch):
            params, estate, opt_state, cache = carry
            centers, labels, seed, key = batch
            params, estate, opt_state, cache, loss, _ = _train_body(
                params, estate, opt_state, cache, centers, labels, seed, key
            )
            return (params, estate, opt_state, cache), loss

        (params, estate, opt_state, cache), losses = jax.lax.scan(
            body, (params, estate, opt_state, cache), (centers_s, labels_s, seeds, keys)
        )
        return params, estate, opt_state, cache, losses

    full_graph = (
        bool(args.full_graph_eval) or bool(args.sharded_eval)
        or bool(args.halo_eval)
    )
    if args.sharded_eval or args.halo_eval:
        if args.halo_eval:
            from wholegraph_tpu.graph.partitioned import (
                eval_full_graph_partitioned, halo_stats, partition_graph,
            )

            # partition with the feature table's row plan so output shards
            # align with table shards (spmm_halo checks this)
            pg = partition_graph(g, mesh, plan=emb.plan, axis=emb.axis)
            st = halo_stats(pg)
            print(f"[HALO] rows/layer {st['halo_rows']} vs per-edge "
                  f"{st['per_edge_rows']} ({st['savings_x']:.1f}x less wire)")
        else:
            from wholegraph_tpu.models.sharded_eval import eval_full_graph_sharded

        @jax.jit
        def _eval_metrics(logits, labels):
            return cross_entropy_loss(logits, labels), accuracy(logits, labels)

        def eval_step(params, estate, centers, labels):
            # features/activations/logits stay sharded tables end-to-end
            x_tab = emb.as_sharded_table(estate)
            if args.halo_eval:
                logits_tab = eval_full_graph_partitioned(model, params, pg, x_tab)
            else:
                logits_tab = eval_full_graph_sharded(model, params, g, x_tab)
            logits = logits_tab.gather(centers)  # only the batch replicates
            return _eval_metrics(logits, labels)
    elif args.full_graph_eval:
        # windowed=True attaches a fused-SpMM tile plan when the CSR is
        # locality-ordered (r4: 322.8 Medges/s vs the segment path; silently
        # falls back to plain COO on infeasible plans, exactness unaffected)
        fg = g.to_full_graph(windowed=True)
        n_pad = -ds.node_count % world
        all_ids = put(
            np.concatenate(
                [np.arange(ds.node_count), np.zeros(n_pad)]
            ).astype(np.int32),
            P_BATCH,
        )

        @jax.jit
        def eval_logits_all(params, estate, all_ids):
            rows = emb.gather(estate, all_ids)[: ds.node_count]
            return model.apply(params, rows, graph=fg, train=False)

        @jax.jit
        def eval_from_logits(logits_all, centers, labels):
            logits = jnp.take(logits_all, centers, axis=0)
            return cross_entropy_loss(logits, labels), accuracy(logits, labels)

        def eval_step(params, estate, centers, labels):
            return eval_from_logits(
                eval_logits_all(params, estate, all_ids), centers, labels
            )
    else:

        @jax.jit
        def eval_step(params, estate, cache, centers, labels):
            ml = g.multilayer_sample(
                centers, fanouts, seed=0, weighted=weighted_sampling
            )
            rows = fetch_rows(estate, ml, cache) * ml.unique_mask[:, None]
            logits = model.apply(params, rows, sample=ml, train=False)
            return cross_entropy_loss(logits, labels), accuracy(logits, labels)

    def run_eval(split, batchsize, seed):
        # clamp so small splits still yield at least one full batch
        batchsize = min(batchsize, max(len(split.idx) // world, 1) * world)
        accs, losses = [], []
        for centers, labels in batch_iterator(
            split, batchsize, shuffle=False, seed=seed
        ):
            if full_graph:
                loss, acc = eval_step(
                    params, estate, put(centers, P_BATCH), put(labels, P_BATCH)
                )
            else:
                loss, acc = eval_step(
                    params, estate, cache,
                    put(centers, P_BATCH), put(labels, P_BATCH),
                )
            accs.append(float(acc))
            losses.append(float(loss))
        return float(np.mean(losses)), float(np.mean(accs))

    ckpt = None
    if args.save_dir:
        from wholegraph_tpu.io import AsyncCheckpointer

        ckpt = AsyncCheckpointer()

    train_start = time.perf_counter()
    global_step = 0
    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        if args.scan_epoch:
            batches = list(
                batch_iterator(ds.train, args.batchsize, seed=args.seed + epoch)
            )
            S = len(batches)
            centers_s = put(np.stack([b[0] for b in batches]), P(None, AXIS))
            labels_s = put(np.stack([b[1] for b in batches]), P(None, AXIS))
            seeds = jnp.arange(global_step, global_step + S, dtype=jnp.int32)
            keys = jax.vmap(jax.random.PRNGKey)(seeds)
            params, estate, opt_state, cache, losses = train_epoch_scan(
                params, estate, opt_state, cache, centers_s, labels_s, seeds, keys
            )
            ep_losses = list(np.asarray(losses))
            global_step += S
        else:
            ep_losses = []
            for centers, labels in batch_iterator(
                ds.train, args.batchsize, seed=args.seed + epoch
            ):
                params, estate, opt_state, cache, loss, acc = train_step(
                    params, estate, opt_state, cache,
                    put(centers, P_BATCH), put(labels, P_BATCH),
                    global_step, jax.random.PRNGKey(global_step),
                )
                ep_losses.append(float(loss))
                global_step += 1
        if cache is not None and train_emb:
            # per-epoch re-capture of invalidated hot lines (writeback analog)
            from wholegraph_tpu.embedding.cache import refresh_hot_cache
            from wholegraph_tpu.memory import ShardedTable as _ST

            cache = refresh_hot_cache(
                emb.as_sharded_table(estate), cache
            )
        if ckpt is not None and (epoch + 1) % args.ckpt_every == 0:
            ckpt.save_embedding(emb, estate, args.save_dir, "node_emb")
        epoch_time = time.perf_counter() - t0
        vloss, vacc = run_eval(ds.valid, args.valid_batchsize, epoch)
        print(
            f"[EPOCH_TIME] {epoch_time:.3f} s epoch {epoch}: "
            f"train loss {np.mean(ep_losses):.4f} valid loss {vloss:.4f} "
            f"valid acc {vacc*100:.2f}%"
        )
    train_time = time.perf_counter() - train_start
    if ckpt is not None:
        ckpt.close()  # drain pending checkpoint writes
        print(f"checkpoints in {args.save_dir}")
    print(f"[TRAIN_TIME] {train_time:.3f} s")
    tloss, tacc = run_eval(ds.test, args.valid_batchsize, 0)
    print(f"[TEST] loss {tloss:.4f} accuracy {tacc*100:.2f}%")


if __name__ == "__main__":
    main()
