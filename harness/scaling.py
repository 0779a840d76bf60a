"""Multi-device scaling harness — measures node-parallel training throughput
across mesh sizes.

The reference is single-GPU (SURVEY.md §2.4); this measures the beyond-
reference scale-out path (parallel/train_parallel.py): epoch time of the
node-partitioned training step for n_devices ∈ {1, 2, 4, ...} with both halo
strategies, and the derived scaling efficiency. On a virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8 on a CPU-only machine)
the numbers validate FUNCTIONALITY and collective counts, not speed; run on a
real TPU slice for meaningful efficiency.

Usage:
    python harness/scaling.py [dataset] [--epochs N] [--devices 1,2,4,8]
Writes output/scaling_tpu.txt.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# XLA parses XLA_FLAGS once, at first backend init — the virtual-device count
# must be in the env BEFORE jax is imported for the CPU-mesh fallback to work
_dev_arg = ""
for _i, _a in enumerate(sys.argv):
    if _a == "--devices" and _i + 1 < len(sys.argv):
        _dev_arg = sys.argv[_i + 1]
    elif _a.startswith("--devices="):
        _dev_arg = _a.split("=", 1)[1]
if _dev_arg:
    _need = max(int(s) for s in _dev_arg.split(",") if s)
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            f"{_flags} --xla_force_host_platform_device_count={_need}".strip()
        )

import jax
import numpy as np

from parallel_gcn_tpu.config import default_params_path, load_config
from parallel_gcn_tpu.data.parser import load_dataset
from parallel_gcn_tpu.train import init_model_params
from parallel_gcn_tpu.optim import init_adam
from parallel_gcn_tpu.parallel.partition import partition_graph, partition_graph_ring
from parallel_gcn_tpu.parallel.train_parallel import (
    device_put_sharded_inputs,
    make_mesh,
    make_parallel_epoch_step,
    shard_dataset,
)


def bench_mesh(ds, cfg, n_dev: int, halo: str, epochs: int) -> float:
    import dataclasses as _dc

    if halo == "hybrid":
        # tile-accelerated slabs (all_gather halo) — resolve tile dtype and
        # budget exactly like fit_parallel so the measured configuration is
        # the one the trainer runs
        import numpy as _np

        from parallel_gcn_tpu.parallel.partition import partition_graph_hybrid

        cfg = _dc.replace(cfg, tpu=_dc.replace(cfg.tpu, backend="hybrid"))
        tile_dtype = cfg.tpu.tile_dtype
        if tile_dtype == "auto":
            tile_dtype = (
                "float32" if cfg.tpu.matmul_precision == "highest" else "bfloat16"
            )
        sgraph = partition_graph_hybrid(
            ds.graph, n_dev, node_pad=cfg.tpu.node_pad,
            tile_r=cfg.tpu.tile_size, tile_c=cfg.tpu.tile_cols,
            tile_dtype=_np.dtype(tile_dtype),
            tile_budget_bytes=cfg.tpu.tile_budget_mb * 1024 * 1024,
            min_tile_nnz=cfg.tpu.min_tile_nnz or None,
        )
    else:
        part = partition_graph_ring if halo == "ring" else partition_graph
        sgraph = part(ds.graph, n_dev, node_pad=cfg.tpu.node_pad)
    mesh = make_mesh(n_dev)
    x, labels, split = shard_dataset(ds, sgraph)
    inputs = device_put_sharded_inputs(mesh, sgraph, x, labels, split)
    counts = {s: int((ds.split == s).sum()) for s in (1, 2, 3)}
    step = make_parallel_epoch_step(cfg, mesh, sgraph, counts)

    key = jax.random.PRNGKey(cfg.tpu.seed)
    w = init_model_params(cfg, jax.random.PRNGKey(0), ds.input_dim, ds.output_dim)
    opt = init_adam(w)
    w, opt, key, m = step(w, opt, key, *inputs)  # compile
    np.asarray(m)
    t0 = time.perf_counter()
    for _ in range(epochs):
        w, opt, key, m = step(w, opt, key, *inputs)
    np.asarray(m)
    return (time.perf_counter() - t0) / epochs * 1e3


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset", nargs="?", default="synth-medium")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--devices", default="")
    args = ap.parse_args()

    sizes = [int(s) for s in args.devices.split(",") if s]
    avail = len(jax.devices())
    if sizes and max(sizes) > avail:
        # fall back to a virtual CPU mesh big enough for the requested sizes
        # (the axon TPU plugin ignores JAX_PLATFORMS=cpu set in the env)
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={max(sizes)}"
            ).strip()
        import jax.extend.backend as _jexb

        _jexb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        avail = len(jax.devices())
    sizes = sizes or [d for d in (1, 2, 4, 8, 16) if d <= avail]
    platform = jax.default_backend()
    print(f"platform={platform} devices={avail} sizes={sizes}", file=sys.stderr)
    if platform == "cpu":
        print("NOTE: CPU mesh — functional validation only, not speed",
              file=sys.stderr)

    cfg = load_config(default_params_path(args.dataset))
    cfg.train.verbose = False
    cfg.tpu.matmul_precision = "default"
    ds = load_dataset(args.dataset, binarize_features=cfg.data.binarize_features)

    os.makedirs("output", exist_ok=True)
    lines = [f"# {args.dataset} on {platform}, {args.epochs} epochs/point"]
    halos = ["all_gather", "ring"]
    if jax.default_backend() == "cpu":
        # interpret-mode Pallas emulates every grid step in Python — fine for
        # the tiny dryrun/test graphs, hours at benchmark scale. Hybrid slabs
        # are covered functionally by tests/test_parallel.py; measure them on
        # a real slice.
        print("NOTE: skipping hybrid slabs on the CPU mesh (interpret-mode "
              "Pallas is not benchmarkable)", file=sys.stderr)
    else:
        halos.append("hybrid")
    for halo in halos:
        base = None
        for n in sizes:
            ms = bench_mesh(ds, cfg, n, halo, args.epochs)
            base = base or ms * sizes[0]
            eff = base / (ms * n) * 100
            line = f"{halo:10s} n={n:2d} epoch {ms:8.3f} ms  efficiency {eff:5.1f}%"
            print(line)
            lines.append(line)

    with open("output/scaling_tpu.txt", "w") as f:
        f.write("\n".join(lines) + "\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
