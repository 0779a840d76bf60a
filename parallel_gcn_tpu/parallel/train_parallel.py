"""Multi-chip training step via shard_map over a device mesh.

TPU-native replacement for what the reference does not have (it is single-GPU;
SURVEY.md §2.4): the graph's rows are partitioned across the ``nodes`` mesh
axis, each device aggregates its own rows' edges after an ``all_gather`` of
source features over ICI, weight gradients are ``psum``-reduced, and the Adam
step runs replicated. The reference's intra-device stream/event overlap
(src/gcn.cu:5-11) maps to XLA's async collectives + latency-hiding scheduler.

Works on a virtual CPU mesh (tests, dryrun) and on real TPU slices unchanged.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from parallel_gcn_tpu.config import Config
from parallel_gcn_tpu.data.parser import TRAIN, VAL, Dataset
from parallel_gcn_tpu.ops.dropout import dropout
from parallel_gcn_tpu.ops.loss import l2_penalty
from parallel_gcn_tpu.ops.sparse_matmul import feature_transform
from parallel_gcn_tpu.optim import adam_step
from parallel_gcn_tpu.parallel.partition import HybridShardedGraph, ShardedGraph

AXIS = "nodes"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def shard_dataset(ds: Dataset, sgraph: ShardedGraph):
    """Pad host arrays to the sharded node count; returns numpy arrays shaped
    for row-sharding over the mesh."""
    n_pad = sgraph.n_nodes_pad
    x = np.zeros((n_pad, ds.input_dim), dtype=np.float32)
    x[: ds.n_nodes] = ds.features
    labels = np.full(n_pad, -1, dtype=np.int32)
    labels[: ds.n_nodes] = ds.labels
    split = np.zeros(n_pad, dtype=np.int32)
    split[: ds.n_nodes] = ds.split
    return x, labels, split


def graphsum_dist(x_local, row_local, col_global, val, n_local, axis=AXIS):
    """Distributed Â·x, all_gather halo: gather ALL remote source features over
    ICI at once, aggregate the local rows' edges. Simple and fast while the
    full gathered feature matrix fits HBM; XLA overlaps the collective with the
    preceding matmul.
    """
    x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
    gathered = val[:, None].astype(x_local.dtype) * x_full[col_global]
    return jax.ops.segment_sum(
        gathered, row_local, num_segments=n_local, indices_are_sorted=True
    )


def _agg_hybrid_impl(x_local, tiles, trow, tcol, rrow, rcol, rval,
                     n_local, n_pad, axis):
    from parallel_gcn_tpu.ops.pallas_bcsr import BCSR, bcsr_matmul_rect

    x_full = jax.lax.all_gather(x_local, axis, axis=0, tiled=True)
    pack = BCSR(
        tiles=tiles, tile_rows=trow, tile_cols=tcol,
        n_nodes=n_pad, n_tiles_real=tiles.shape[0], n_rows=n_local,
    )
    out = bcsr_matmul_rect(pack, x_full).astype(x_local.dtype)
    gathered = rval[:, None].astype(x_local.dtype) * x_full[rcol]
    return out + jax.ops.segment_sum(
        gathered, rrow, num_segments=n_local, indices_are_sorted=True
    )


@partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9))
def graphsum_dist_hybrid(x_local, tiles, trow, tcol, rrow, rcol, rval,
                         n_local, n_pad, axis=AXIS):
    """Distributed Â·x with per-device MXU tile slabs + COO residual
    (partition.HybridShardedGraph), all_gather halo.

    Self-adjoint at the collective level: the GLOBAL matrix is symmetric, so
    d/dx restricted to device d's rows is the SAME operation applied to the
    gathered cotangent (dx_d = slab_d · all_gather(g)) — no transposed tile
    pack, mirroring the single-chip symmetric-Â shortcut
    (src/module.cu:188-208) across the mesh.
    """
    return _agg_hybrid_impl(
        x_local, tiles, trow, tcol, rrow, rcol, rval, n_local, n_pad, axis
    )


def _agg_hybrid_fwd(x_local, tiles, trow, tcol, rrow, rcol, rval,
                    n_local, n_pad, axis):
    out = _agg_hybrid_impl(
        x_local, tiles, trow, tcol, rrow, rcol, rval, n_local, n_pad, axis
    )
    return out, (tiles, trow, tcol, rrow, rcol, rval)


def _agg_hybrid_bwd(n_local, n_pad, axis, res, g):
    tiles, trow, tcol, rrow, rcol, rval = res
    dx = _agg_hybrid_impl(
        g, tiles, trow, tcol, rrow, rcol, rval, n_local, n_pad, axis
    )
    return dx, None, None, None, None, None, None


graphsum_dist_hybrid.defvjp(_agg_hybrid_fwd, _agg_hybrid_bwd)


def _agg_hybrid_scaled_impl(x_local, d_local, tiles, trow, tcol, rrow, rcol,
                            rval, n_local, n_pad, axis):
    # int8 pattern slabs: scale BEFORE the gather (ag(d_loc ⊙ x) == d ⊙ ag(x),
    # one collective), aggregate the 0/1 tiles + unit-valued residual, scale
    # the local output rows — exactly d ⊙ B (d ⊙ x) = Â·x per local slab.
    xs = (d_local[:, None] * x_local.astype(jnp.float32)).astype(x_local.dtype)
    out = _agg_hybrid_impl(
        xs, tiles, trow, tcol, rrow, rcol, rval, n_local, n_pad, axis
    )
    return (d_local[:, None] * out).astype(out.dtype)


@partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10))
def graphsum_dist_hybrid_scaled(x_local, d_local, tiles, trow, tcol, rrow,
                                rcol, rval, n_local, n_pad, axis=AXIS):
    """graphsum_dist_hybrid for int8 PATTERN slabs (partition_graph_hybrid
    with tile_dtype=int8): tiles hold the exact 0/1 structure, residual values
    are 1, and d (= deg^{-1/2}, row-sharded) carries the normalization.
    Self-adjoint like the value version: diag(d)·B·diag(d) is symmetric."""
    return _agg_hybrid_scaled_impl(
        x_local, d_local, tiles, trow, tcol, rrow, rcol, rval,
        n_local, n_pad, axis,
    )


def _agg_hybrid_scaled_fwd(x_local, d_local, tiles, trow, tcol, rrow, rcol,
                           rval, n_local, n_pad, axis):
    out = _agg_hybrid_scaled_impl(
        x_local, d_local, tiles, trow, tcol, rrow, rcol, rval,
        n_local, n_pad, axis,
    )
    return out, (d_local, tiles, trow, tcol, rrow, rcol, rval)


def _agg_hybrid_scaled_bwd(n_local, n_pad, axis, res, g):
    d_local, tiles, trow, tcol, rrow, rcol, rval = res
    dx = _agg_hybrid_scaled_impl(
        g, d_local, tiles, trow, tcol, rrow, rcol, rval, n_local, n_pad, axis
    )
    return dx, None, None, None, None, None, None, None


graphsum_dist_hybrid_scaled.defvjp(_agg_hybrid_scaled_fwd, _agg_hybrid_scaled_bwd)


def graphsum_ring(x_local, row_slabs, col_slabs, val_slabs, n_local, n_dev, axis=AXIS):
    """Distributed Â·x, ``ppermute`` ring halo (SURVEY.md §7.7): node blocks
    rotate around the ICI ring while each device aggregates the slab of edges
    whose sources are in the block it currently holds. Peak memory is one
    remote block (n_local × F) instead of the full gathered matrix
    (n_nodes × F), and XLA overlaps each rotation with the current slab's
    gather/segment_sum — the multi-chip analog of the reference's
    stream-overlap design (src/gcn.cu:5-11).

    Slabs come from ``partition_graph_ring``: slab ``s`` holds the edges whose
    source block arrives after ``s`` rotations. The scan runs n_dev steps; the
    final rotation returns blocks home (its result is unused).
    """
    perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]

    def body(carry, slab):
        acc, blk = carry
        r, c, v = slab
        acc = acc + jax.ops.segment_sum(
            v[:, None].astype(blk.dtype) * blk[c],
            r,
            num_segments=n_local,
            indices_are_sorted=True,
        )
        blk = jax.lax.ppermute(blk, axis, perm)
        return (acc, blk), None

    acc0 = jnp.zeros((n_local, x_local.shape[-1]), x_local.dtype)
    (acc, _), _ = jax.lax.scan(
        body, (acc0, x_local), (row_slabs, col_slabs, val_slabs)
    )
    return acc


def _masked_ce_local(logits_local, labels_local, mask_local, num_samples,
                     axis=AXIS):
    """Masked softmax-CE + accuracy over the mesh: the shared row-wise core
    (ops.loss.masked_softmax_xent_sums — one source of truth for the
    max-subtraction/LSE/one-hot-select expression and the tie-counts-as-
    correct trick) reduced with psum across the node shards."""
    from parallel_gcn_tpu.ops.loss import masked_softmax_xent_sums

    loss_sum, correct = masked_softmax_xent_sums(
        logits_local, labels_local, mask_local
    )
    loss = jax.lax.psum(loss_sum, axis) / jnp.float32(num_samples)
    acc = jax.lax.psum(correct, axis) / jnp.float32(num_samples)
    return loss, acc


def _make_forward(cfg: Config, sgraph):
    """Shared sharded forward used by the train step and eval fns.

    ``graph_args`` is the per-device tuple of graph arrays: (rowl, colg, val)
    for COO partitions (flat or ring) or (tiles, trow, tcol, rrow, rcol, rval)
    for the hybrid tile partition.
    """
    dropouts = tuple(cfg.gcn.dropouts)
    n_layers = cfg.gcn.n_layers
    n_local = sgraph.n_local
    n_dev = sgraph.n_dev
    hybrid = isinstance(sgraph, HybridShardedGraph)
    ring = (not hybrid) and sgraph.ring
    n_pad = sgraph.n_nodes_pad
    precision = cfg.tpu.matmul_precision
    residual = cfg.gcn.residual
    dtype = jnp.dtype(cfg.tpu.compute_dtype)

    def _aggregate(h, graph_args):
        if hybrid:
            if len(graph_args) == 7:  # (..., rval, d): int8 pattern slabs
                return graphsum_dist_hybrid_scaled(
                    h, graph_args[-1], *graph_args[:-1], n_local, n_pad
                )
            return graphsum_dist_hybrid(h, *graph_args, n_local, n_pad)
        if ring:
            return graphsum_ring(h, *graph_args, n_local, n_dev)
        return graphsum_dist(h, *graph_args, n_local)

    def forward(weights, x_local, graph_args, training, key):
        h = x_local.astype(dtype)
        if training:
            # per-device independent dropout masks over the local rows
            key = jax.random.fold_in(key, jax.lax.axis_index(AXIS))
            keys = jax.random.split(key, n_layers)
        else:
            keys = [None] * n_layers
        prev = None
        for layer in range(n_layers):
            h = dropout(h, dropouts[layer], keys[layer], training=training)
            h = feature_transform(
                h, weights[layer], precision=precision, out_dtype=dtype
            )
            h = _aggregate(h, graph_args).astype(dtype)
            if (
                residual
                and 0 < layer < n_layers - 1
                and prev is not None
                and prev.shape == h.shape
            ):
                h = h + prev
            if layer < n_layers - 1:
                h = jax.nn.relu(h)
                prev = h
        return h.astype(jnp.float32)

    return forward


def _graph_specs(sgraph):
    """(in_specs tuple, array tuple) for the partition's graph arrays."""
    if isinstance(sgraph, HybridShardedGraph):
        arrays = (sgraph.tiles, sgraph.trow, sgraph.tcol,
                  sgraph.res_row, sgraph.res_col, sgraph.res_val)
        specs = (P(AXIS, None, None, None), P(AXIS, None), P(AXIS, None),
                 P(AXIS, None), P(AXIS, None), P(AXIS, None))
        if sgraph.sym_scale is not None:
            arrays = arrays + (sgraph.sym_scale,)
            specs = specs + (P(AXIS, None),)
    elif sgraph.ring:
        arrays = (sgraph.row_local, sgraph.col, sgraph.val)
        specs = (P(AXIS, None, None),) * 3
    else:
        arrays = (sgraph.row_local, sgraph.col, sgraph.val)
        specs = (P(AXIS, None),) * 3
    return specs, arrays


def make_parallel_epoch_step(
    cfg: Config,
    mesh: Mesh,
    sgraph: ShardedGraph,
    split_counts: dict,
):
    """Build the jitted multi-chip epoch step.

    Signature: (weights, opt_state, key, x, labels, split) ->
               (weights', opt_state', key', metrics[4])
    where x/labels/split are row-sharded over the mesh and weights/opt are
    replicated.
    """
    adam = cfg.adam
    wd = adam.weight_decay
    n_train = split_counts[TRAIN]
    n_val = split_counts[VAL]
    forward = _make_forward(cfg, sgraph)
    graph_specs, _ = _graph_specs(sgraph)

    def step(weights, opt_state, key, x_local, labels_local, split_local,
             *graph_args):
        # graph arrays arrive with a leading size-1 device axis; drop it
        graph_args = tuple(a[0] for a in graph_args)
        key, dkey = jax.random.split(key)
        train_mask = split_local == TRAIN

        def loss_fn(w):
            logits = forward(w, x_local, graph_args, True, dkey)
            loss, acc = _masked_ce_local(logits, labels_local, train_mask, n_train)
            return loss, acc

        (ce, train_acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(weights)
        grads = jax.lax.psum(grads, AXIS)
        train_loss = ce + jnp.float32(wd) * l2_penalty(weights[0]) / 2.0

        weights, opt_state = adam_step(
            weights, grads, opt_state,
            learning_rate=adam.learning_rate, weight_decay=wd,
            beta1=adam.beta1, beta2=adam.beta2, eps=adam.eps,
        )

        val_logits = forward(weights, x_local, graph_args, False, None)
        val_ce, val_acc = _masked_ce_local(
            val_logits, labels_local, split_local == VAL, n_val
        )
        val_loss = val_ce + jnp.float32(wd) * l2_penalty(weights[0]) / 2.0
        metrics = jnp.stack([train_loss, train_acc, val_loss, val_acc])
        return weights, opt_state, key, metrics

    sharded_step = jax.shard_map(
        step,
        mesh=mesh,
        in_specs=(
            P(), P(), P(),  # weights, opt, key: replicated
            P(AXIS, None), P(AXIS), P(AXIS),  # x, labels, split: row-sharded
            *graph_specs,
        ),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded_step, donate_argnums=(0, 1))


def make_parallel_eval_fn(
    cfg: Config,
    mesh: Mesh,
    sgraph: ShardedGraph,
    split_counts: dict,
    split: int,
):
    """Jitted multi-chip eval on one split: (weights, *inputs) -> (loss, acc).

    Counterpart of GCN::eval (src/gcn.cu:293-303) over the node-partitioned
    graph; loss includes the wd*||W0||^2/2 term like finalize
    (src/gcn.cu:440-455)."""
    wd = cfg.adam.weight_decay
    n = split_counts[split]
    forward = _make_forward(cfg, sgraph)
    graph_specs, _ = _graph_specs(sgraph)

    def eval_step(weights, x_local, labels_local, split_local, *graph_args):
        graph_args = tuple(a[0] for a in graph_args)
        logits = forward(weights, x_local, graph_args, False, None)
        ce, acc = _masked_ce_local(logits, labels_local, split_local == split, n)
        loss = ce + jnp.float32(wd) * l2_penalty(weights[0]) / 2.0
        return loss, acc

    sharded = jax.shard_map(
        eval_step,
        mesh=mesh,
        in_specs=(
            P(),
            P(AXIS, None), P(AXIS), P(AXIS),
            *graph_specs,
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)


def fit_parallel(
    cfg: Config,
    ds,
    *,
    n_devices: int | None = None,
    halo: str | None = None,
    key=None,
    verbose: bool | None = None,
):
    """Complete multi-chip training run — the mesh counterpart of train.fit:
    node-partition the graph, train with per-epoch val metrics and the
    reference's early-stopping rule (mean of last k val losses,
    src/gcn.cu:377-395), then evaluate the test split.

    ``halo``: "all_gather" (full remote feature gather) or "ring"
    (ppermute block rotation). Defaults from cfg.tpu.halo.
    """
    import time as _time

    from parallel_gcn_tpu.models.gcn import init_params
    from parallel_gcn_tpu.optim import init_adam
    from parallel_gcn_tpu.parallel.partition import (
        partition_graph,
        partition_graph_hybrid,
        partition_graph_ring,
    )
    from parallel_gcn_tpu.train import FitResult

    halo = halo or cfg.tpu.halo
    n_devices = n_devices or cfg.tpu.n_devices or len(jax.devices())
    avail = len(jax.devices())
    if n_devices > avail:
        raise RuntimeError(
            f"fit_parallel needs {n_devices} devices, have {avail}; for a "
            "virtual CPU mesh set XLA_FLAGS=--xla_force_host_platform_"
            f"device_count={n_devices} before importing jax"
        )
    verbose = cfg.train.verbose if verbose is None else verbose

    if cfg.tpu.backend in ("hybrid", "bcsr"):
        if halo == "ring":
            raise ValueError(
                "backend=hybrid/bcsr uses per-device tile slabs against the "
                "all_gather halo; the ppermute ring is only available with "
                "the COO backends (set backend=segment for halo=ring)"
            )
        # tile-accelerated per-device aggregation (all_gather halo)
        tile_dtype = cfg.tpu.tile_dtype
        if tile_dtype == "auto":
            tile_dtype = (
                "float32" if cfg.tpu.matmul_precision == "highest" else "bfloat16"
            )
        sgraph = partition_graph_hybrid(
            ds.graph, n_devices, node_pad=cfg.tpu.node_pad,
            tile_r=cfg.tpu.tile_size, tile_c=cfg.tpu.tile_cols,
            tile_dtype=np.dtype(tile_dtype),
            tile_budget_bytes=cfg.tpu.tile_budget_mb * 1024 * 1024,
            min_tile_nnz=cfg.tpu.min_tile_nnz or None,
        )
    else:
        part = partition_graph_ring if halo == "ring" else partition_graph
        sgraph = part(ds.graph, n_devices, node_pad=cfg.tpu.node_pad)
    mesh = make_mesh(n_devices)
    x, labels, split = shard_dataset(ds, sgraph)
    inputs = device_put_sharded_inputs(mesh, sgraph, x, labels, split)
    counts = {s: int((ds.split == s).sum()) for s in (TRAIN, VAL, 3)}

    step = make_parallel_epoch_step(cfg, mesh, sgraph, counts)
    test_fn = make_parallel_eval_fn(cfg, mesh, sgraph, counts, split=3)

    if key is None:
        key = jax.random.PRNGKey(cfg.tpu.seed)
    key, init_key = jax.random.split(key)
    weights = init_params(
        init_key, ds.input_dim, cfg.gcn.hidden_dims, ds.output_dim
    )
    opt_state = init_adam(weights)

    k = cfg.gcn.early_stopping
    rows = []
    t0 = _time.perf_counter()
    for epoch in range(1, cfg.gcn.epochs + 1):
        te = _time.perf_counter()
        weights, opt_state, key, metrics = step(weights, opt_state, key, *inputs)
        tl, ta, vl, va = (float(v) for v in metrics)
        rows.append((tl, ta, vl, va))
        if verbose:
            print(
                f"epoch={epoch} train_loss={tl:.5f} train_acc={ta:.5f} "
                f"val_loss={vl:.5f} val_acc={va:.5f} "
                f"time={_time.perf_counter() - te:.5f}"
            )
        if k > 0 and epoch >= k:
            window = [r[2] for r in rows[-k:]]
            if vl > float(np.mean(window)):
                if verbose:
                    print("Early stopping...")
                break
    total = _time.perf_counter() - t0

    test_loss, test_acc = (float(v) for v in test_fn(weights, *inputs))
    if verbose:
        print(f"test_loss={test_loss:.5f} test_acc={test_acc:.5f}")

    history = np.asarray(rows, dtype=np.float32)
    return FitResult(
        weights=weights,
        history=history,
        epochs_run=len(rows),
        test_loss=test_loss,
        test_acc=test_acc,
        avg_epoch_time_s=total / max(len(rows), 1),
        total_time_s=total,
    )


def device_put_sharded_inputs(mesh: Mesh, sgraph, x, labels, split):
    """Place the row-sharded arrays on the mesh. Returns
    (x, labels, split, *graph_arrays) matching the step/eval signatures."""
    row_sh = NamedSharding(mesh, P(AXIS))
    mat_sh = NamedSharding(mesh, P(AXIS, None))
    graph_specs, graph_arrays = _graph_specs(sgraph)
    placed_graph = tuple(
        jax.device_put(a, NamedSharding(mesh, s))
        for a, s in zip(graph_arrays, graph_specs)
    )
    return (
        jax.device_put(x, mat_sh),
        jax.device_put(labels, row_sh),
        jax.device_put(split, row_sh),
        *placed_graph,
    )
