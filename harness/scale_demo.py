"""Sharded-memory scale demonstration — synth-products on an 8-device mesh.

The single-chip products run (PERFORMANCE.md "scale demonstration") is bounded
by one chip's 16 GB HBM: the tile budget caps out and 29M residual edges ride
the slow segment path. This harness demonstrates the multi-chip answer
(VERDICT round-1 item 1's final criterion): node-partition synth-products
(2.45M nodes / 126M directed edges) over a mesh with the ADAPTIVE push/pull
halo (partition_graph(adaptive=True) — per device pair, pull raw feature
rows or push partial sums, whichever ships fewer; the pure-pull boundary
layout is reported alongside for comparison) and show, from the actual
device-buffer shapes, that per-device feature memory is O(N/D + |halo|) — a
working set no all_gather layout can deliver — then execute one full
training step (train fwd + bwd + Adam + val eval) on the mesh to prove the
sharded program runs at this scale.

On this machine the mesh is 8 virtual CPU devices (one real TPU chip is
available); the executed step validates FUNCTIONALITY and memory layout, not
speed — the same program shards over a real v5e slice unchanged.

Usage:
    python harness/scale_demo.py [dataset] [--devices 8] [--skip-step]
Writes output/scale_demo_<dataset>.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# the virtual-device count must be in XLA_FLAGS before jax initializes
_N = 8
for _i, _a in enumerate(sys.argv):
    if _a == "--devices" and _i + 1 < len(sys.argv):
        _N = int(sys.argv[_i + 1])
    elif _a.startswith("--devices="):
        _N = int(_a.split("=", 1)[1])
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = f"{_flags} --xla_force_host_platform_device_count={_N}".strip()
if "collective" not in _flags:
    # N virtual devices oversubscribe this host's cores; at 126M-edge scale
    # the per-device compute between collectives exceeds XLA:CPU's default
    # 40 s rendezvous kill-switch — raise it (real multi-chip TPU runs don't
    # hit this path at all)
    _flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=600"
               " --xla_cpu_collective_call_terminate_timeout_seconds=7200"
               " --xla_cpu_collective_timeout_seconds=7200")
os.environ["XLA_FLAGS"] = _flags

import jax

# the axon TPU plugin ignores JAX_PLATFORMS=cpu from the env; force it here,
# before any backend is touched
jax.config.update("jax_platforms", "cpu")

import numpy as np

from parallel_gcn_tpu.config import default_params_path, load_config
from parallel_gcn_tpu.data.parser import prepare_host_dataset
from parallel_gcn_tpu.train import init_model_params
from parallel_gcn_tpu.optim import init_adam
from parallel_gcn_tpu.parallel.partition import partition_graph
from parallel_gcn_tpu.parallel.train_parallel import (
    device_put_sharded_inputs,
    make_mesh,
    make_parallel_epoch_step,
    shard_dataset,
)

GB = 1024**3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", nargs="?", default="synth-products")
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--skip-step", action="store_true",
                    help="memory accounting only (skip the executed step)")
    ap.add_argument("--step-hidden", type=int, default=0,
                    help="hidden width for the EXECUTED step only (0 = the "
                    "config width). The host emulating the mesh holds every "
                    "virtual device's transient [e_local, H] scatter "
                    "operands at once — narrower H keeps the functional "
                    "validation inside host RAM; the memory table above "
                    "always reports the config width.")
    ap.add_argument("--backend", default="",
                    help="segment | hybrid (default: the dataset config's — "
                    "hybrid for synth-products). hybrid composes the MXU "
                    "tile slabs with the adaptive push/pull halo "
                    "(partition_graph_hybrid(adaptive=True)); on the CPU "
                    "mesh the tile kernel runs in interpret mode.")
    ap.add_argument("--mesh-tile", type=int, default=128,
                    help="tile_r = tile_c for the MESH partition (hybrid "
                    "backend). The single-chip tuned shapes (512x1024 on "
                    "products) amortize grid overhead on one chip, but the "
                    "pull halo ships whole tile_c-row blocks — at products' "
                    "~2%% tile fill, 512-col blocks give a 0.90x 'compact' "
                    "buffer (measured). Fine 128-col tiles keep the halo "
                    "row-granular while still MXU-accelerating the bulk "
                    "edges. 0 = keep the dataset config's shape.")
    ap.add_argument("--mesh-min-nnz", type=int, default=32,
                    help="min_tile_nnz for the mesh partition when "
                    "--mesh-tile is set (break-even scales with tile area; "
                    "32 is the measured 128x128 int8 floor)")
    ap.add_argument("--step-backend", default="segment",
                    help="aggregation backend for the EXECUTED step (the "
                    "memory accounting always uses --backend). Default "
                    "segment: interpret-mode Pallas at 100M-edge scale is "
                    "not tractable on a CPU host — the tile-accelerated "
                    "sharded step is validated at test scale instead "
                    "(dryrun_multichip, tests/test_parallel.py hybrid x "
                    "adaptive parity). On a real multi-chip slice pass "
                    "--step-backend hybrid to execute the tile step at "
                    "full scale.")
    args = ap.parse_args()
    n_dev = args.devices

    cfg = load_config(default_params_path(args.dataset))
    cfg.train.verbose = False
    # the executed step uses the memory-scaling configuration: the dataset's
    # tuned aggregation backend (tile slabs for products) against the
    # ADAPTIVE push/pull halo. The memory table below is layout math — it
    # holds for every backend because the halo buffer is what all of them
    # index.
    backend = args.backend or cfg.tpu.backend
    if backend not in ("segment", "hybrid"):
        backend = "segment"
    cfg.tpu.backend = backend
    cfg.tpu.halo = "adaptive"
    cfg.tpu.n_devices = n_dev
    cfg.tpu.compute_dtype = "float32"  # CPU step; bf16 accounting shown below

    t0 = time.time()
    # prepare_host_dataset applies the config's node reorder (community for
    # products) — halo compactness NEEDS a locality-preserving order, exactly
    # like the CLI mesh path runs it
    ds = prepare_host_dataset(cfg, args.dataset)
    print(f"[{args.dataset}] {ds.n_nodes:,} nodes / {ds.graph.nnz:,} edges "
          f"(+self-loops), {ds.input_dim} features, loaded {time.time()-t0:.0f}s",
          flush=True)

    t0 = time.time()
    if backend == "hybrid":
        from parallel_gcn_tpu.parallel.partition import partition_graph_hybrid

        tile_dtype = cfg.tpu.tile_dtype
        if tile_dtype == "auto":
            tile_dtype = ("float32" if cfg.tpu.matmul_precision == "highest"
                          else "bfloat16")
        tile_r = args.mesh_tile or cfg.tpu.tile_size
        tile_c = args.mesh_tile or cfg.tpu.tile_cols
        min_nnz = (args.mesh_min_nnz if args.mesh_tile
                   else cfg.tpu.min_tile_nnz) or None
        kw = dict(
            node_pad=cfg.tpu.node_pad, tile_r=tile_r, tile_c=tile_c,
            tile_dtype=np.dtype(tile_dtype),
            tile_budget_bytes=cfg.tpu.tile_budget_mb * 1024 * 1024,
            min_tile_nnz=min_nnz,
            # LPT slab balancing permutes node blocks WITHOUT regard to
            # locality — measured at products scale it inflates every
            # pair's boundary set to ~83% of the remote blocks (buffer
            # 0.95x of all_gather, push never wins). Memory scaling needs
            # the community order intact; slab imbalance is the lesser
            # cost here (the demo is about the halo layout).
            balance=False,
        )
        cfg.tpu.tile_size, cfg.tpu.tile_cols = tile_r, tile_c
        cfg.tpu.min_tile_nnz = min_nnz or 0
        sgb = partition_graph_hybrid(ds.graph, n_dev, boundary=True, **kw)
        sg = partition_graph_hybrid(ds.graph, n_dev, adaptive=True, **kw)
    else:
        sgb = partition_graph(ds.graph, n_dev, node_pad=cfg.tpu.node_pad,
                              boundary=True)
        sg = partition_graph(ds.graph, n_dev, node_pad=cfg.tpu.node_pad,
                             adaptive=True)
    print(f"partitioned D={n_dev} boundary+adaptive ({backend}) "
          f"in {time.time()-t0:.0f}s", flush=True)

    # ---- per-device memory accounting, from the real partition arrays ----
    # adaptive halo: pulled raw rows + pushed partial-sum rows both occupy
    # feature-width buffers — count both against the budget
    halo_rows = n_dev * (sg.halo_size + sg.push_slab)
    buf_rows = sg.n_local + halo_rows
    full_rows = sg.n_nodes_pad        # what all_gather edges index
    bnd_rows = sgb.n_local + n_dev * sgb.halo_size  # pure-pull boundary
    widths = {
        "input features (F)": ds.input_dim,
        f"hidden activations (H={cfg.gcn.hidden_dims[0]})": cfg.gcn.hidden_dims[0],
    }
    bytes_el = 2  # bf16 activations on TPU (the tuned products config)
    if backend == "hybrid":
        slab = (sg.tiles.nbytes + sg.res_row.nbytes + sg.res_col.nbytes
                + sg.res_val.nbytes) // n_dev
        if sg.push_slab:
            slab += (sg.ptiles.nbytes + sg.prow.nbytes + sg.pcol.nbytes
                     + sg.pval.nbytes) // n_dev
    else:
        slab = (sg.row_local.nbytes + sg.col.nbytes + sg.val.nbytes) // n_dev
        if sg.push_slab:
            slab += (sg.push_row.nbytes + sg.push_col.nbytes
                     + sg.push_val.nbytes) // n_dev
    send = sg.send_idx.nbytes // n_dev

    lines = [
        f"# {args.dataset}: {ds.n_nodes:,} nodes / {ds.graph.nnz:,} edges, "
        f"D={n_dev} node shards, backend={backend}, "
        "adaptive (push/pull) halo",
        f"rows/device: local={sg.n_local:,}  "
        f"pulled={n_dev * sg.halo_size:,} ({n_dev}x{sg.halo_size:,})  "
        f"pushed-partials={n_dev * sg.push_slab:,} ({n_dev}x{sg.push_slab:,})"
        f"  buffer={buf_rows:,}",
        f"vs pure-pull boundary={bnd_rows:,} "
        f"(adaptive {bnd_rows/buf_rows:.1f}x smaller)  "
        f"vs all_gather={full_rows:,} "
        f"(buffer/full = {buf_rows/full_rows:.2f})",
        f"edge slab/device: {slab/GB:.2f} GB "
        f"({'int8 tiles + COO residual' if backend == 'hybrid' else 'COO row+col+val'})  "
        f"send-index: {send/GB:.3f} GB",
        "",
        "# per-device aggregation feature buffer (bf16), adaptive vs all_gather",
    ]
    for name, w in widths.items():
        b = buf_rows * w * bytes_el
        f = full_rows * w * bytes_el
        lines.append(f"{name:36s} {b/GB:6.2f} GB   vs {f/GB:6.2f} GB "
                     f"all_gather   ({f/b:.1f}x smaller)")
    if args.dataset == "synth-products":
        hidden_full = full_rows * cfg.gcn.hidden_dims[0] * bytes_el
        hidden_buf = buf_rows * cfg.gcn.hidden_dims[0] * bytes_el
        lines.append("")
        lines.append(
            "scaling: the all_gather layout replicates the "
            f"{hidden_full/GB:.2f} GB hidden matrix on EVERY device regardless"
            f" of D; the boundary layout's {hidden_buf/GB:.2f} GB/device"
            " shrinks with D (halo grows only with the cut), so a graph ~8x"
            " products (~1B edges, ~20M nodes: features alone 3.9 GB + a 10 GB"
            " gathered hidden matrix replicated per device) fits at D=8 under"
            " one v5e's 16 GB HBM only with the boundary layout."
        )
    for ln in lines:
        print(ln, flush=True)

    # the memory criterion itself (checked AFTER the accounting prints, so a
    # failure leaves the evidence visible): the demo fails loudly if the
    # halo layout stops scaling on the headline dataset (e.g. a full gather
    # sneaking back into the path, or the community reorder regressing).
    # Small dense SBMs (synth-medium) legitimately have halo ≈ everything.
    if args.dataset == "synth-products":
        assert buf_rows < 0.5 * full_rows, (
            f"adaptive halo buffer {buf_rows:,} rows is not compact vs "
            f"{full_rows:,}"
        )
    elif buf_rows >= 0.5 * full_rows:
        print(f"note: halo not compact on {args.dataset} "
              f"(ratio {buf_rows/full_rows:.2f}) — expected for small dense "
              "graphs; the scaling claim is about products-scale locality")

    if not args.skip_step:
        if args.step_hidden:
            cfg.gcn.hidden_dims = (args.step_hidden,) * (cfg.gcn.n_layers - 1)
        step_backend = args.step_backend if backend == "hybrid" else backend
        sg_step = sg
        if step_backend != backend:
            # execute on the COO adaptive partition (same halo discipline);
            # the tile-accelerated step itself is validated at test scale —
            # see --step-backend help
            print(f"executed step uses backend={step_backend} "
                  "(interpret-mode tiles are CPU-intractable at this scale; "
                  "--step-backend hybrid on real multi-chip hardware)",
                  flush=True)
            sg_step = partition_graph(ds.graph, n_dev,
                                      node_pad=cfg.tpu.node_pad,
                                      adaptive=True)
        cfg.tpu.backend = step_backend
        if step_backend == "hybrid" and jax.default_backend() == "cpu":
            from parallel_gcn_tpu.ops import pallas_bcsr

            pallas_bcsr._INTERPRET[0] = True  # Mosaic is TPU-only
        mesh = make_mesh(n_dev)
        x, labels, split = shard_dataset(ds, sg_step)
        inputs = device_put_sharded_inputs(mesh, sg_step, x, labels, split)
        counts = {s: int((ds.split == s).sum()) for s in (1, 2, 3)}
        step = make_parallel_epoch_step(cfg, mesh, sg_step, counts)
        w = init_model_params(cfg, jax.random.PRNGKey(cfg.tpu.seed),
                              ds.input_dim, ds.output_dim)
        key = jax.random.PRNGKey(cfg.tpu.seed)
        t0 = time.time()
        w, opt, key, m = step(w, init_adam(w), key, *inputs)
        m = np.asarray(m)
        ok = bool(np.isfinite(m).all())
        line = (f"executed 1 full sharded training step "
                f"(backend={step_backend}, "
                f"H={cfg.gcn.hidden_dims[0]}) on the "
                f"{n_dev}-device {jax.default_backend()} mesh in "
                f"{time.time()-t0:.0f}s: train_loss={m[0]:.4f} "
                f"train_acc={m[1]:.4f} val_loss={m[2]:.4f} val_acc={m[3]:.4f} "
                f"finite={ok}")
        print(line, flush=True)
        lines += ["", line]
        assert ok, "non-finite metrics from the sharded step"

    os.makedirs("output", exist_ok=True)
    out = f"output/scale_demo_{args.dataset}.txt"
    with open(out, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
