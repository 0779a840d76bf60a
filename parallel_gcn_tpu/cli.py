"""CLI entry point.

Usage (mirrors the reference binary `./exec/gcn-par <dataset> [file=params.txt]`,
src/main.cpp:24-32, plus free-form key=value overrides):

    python -m parallel_gcn_tpu <dataset> [file=<params.txt>] [key=value ...]

e.g.  python -m parallel_gcn_tpu cora
      python -m parallel_gcn_tpu cora file=my_params.txt epochs=100 mode=eager
"""

from __future__ import annotations

import sys

import jax

from parallel_gcn_tpu.config import (
    Config,
    default_params_path,
    load_config,
    parse_override,
)
from parallel_gcn_tpu.data.parser import prepare_device_dataset
from parallel_gcn_tpu.train import fit


def print_device_info() -> None:
    """TPU analog of print_gpu_info (include/utils.cuh:81-111)."""
    devices = jax.devices()
    print(f"jax {jax.__version__} — {len(devices)} device(s):")
    for d in devices:
        print(f"  [{d.id}] {d.device_kind} ({d.platform})")
    print()


def main(argv: list[str] | None = None) -> int:
    argv = sys.argv[1:] if argv is None else argv
    if not argv:
        print(__doc__)
        return 2

    dataset = argv[0]
    overrides = {}
    params_file = None
    resume_from = None
    for arg in argv[1:]:
        if "=" not in arg:
            # a silently-ignored typo'd override would train with the wrong
            # config without a word — hard error instead
            print(f"error: malformed argument {arg!r} (expected key=value)")
            return 2
        key, val = arg.split("=", 1)
        if key == "file":
            params_file = val
        elif key == "resume_from":
            resume_from = val
        else:
            overrides[key] = parse_override(val)

    try:
        cfg = load_config(params_file or default_params_path(dataset), overrides)
    except (KeyError, ValueError) as e:
        print(f"error: {e}")
        return 2

    # the mesh path handles both node partitioning (n_devices) and tensor
    # parallelism (tp) — a tp-only config must not fall through to the
    # single-chip fit(), which has no tp concept
    use_mesh = cfg.tpu.n_devices > 1 or cfg.tpu.tp > 1
    need = max(cfg.tpu.n_devices, 1) * cfg.tpu.tp
    if use_mesh and need > 1:
        # XLA reads XLA_FLAGS exactly once, at the process's FIRST backend
        # init — set the virtual-device count preemptively, before the device
        # banner below initializes anything, so the CPU-mesh fallback is
        # possible if the real chips turn out to be too few. Harmless when
        # they suffice: the flag only sizes the (then unused) cpu platform.
        import os

        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                f"{flags} --xla_force_host_platform_device_count={need}"
            ).strip()

    # persistent compilation cache (same as bench.py): the fused whole-run
    # program costs ~20-90 s through a remote-compile tunnel; without this
    # every CLI invocation pays it again and the printed total/avg epoch
    # times are compile-dominated
    import os as _os

    jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.dirname(_os.path.dirname(
            _os.path.abspath(__file__))), ".jax_cache"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    print_device_info()

    if use_mesh and need > len(jax.devices()):
        # functional fallback: a virtual CPU mesh big enough for the
        # requested layout (remote TPU plugins ignore a JAX_PLATFORMS=cpu
        # env var, so the switch must happen programmatically)
        import jax.extend.backend as _jexb

        _jexb.clear_backends()
        jax.config.update("jax_platforms", "cpu")
        if cfg.tpu.backend in ("hybrid", "bcsr"):
            # tile kernels have no CPU lowering — interpret mode
            from parallel_gcn_tpu.ops import pallas_bcsr

            pallas_bcsr._INTERPRET[0] = True
        print(
            f"note: {need} devices requested but fewer real chips are "
            f"attached — running on a {need}-device virtual CPU mesh "
            "(functional validation, not speed)"
        )

    print(f"PARSING {dataset} ...")
    if use_mesh:
        from parallel_gcn_tpu.data.parser import prepare_host_dataset

        ds, dds = prepare_host_dataset(cfg, dataset), None
    else:
        ds, dds = prepare_device_dataset(cfg, dataset)
    print(
        f"nodes={ds.n_nodes} edges(nnz incl self-loops)={ds.graph.nnz} "
        f"features={ds.input_dim} classes={ds.output_dim} "
        f"train/val/test={ds.train_dim}/{ds.val_dim}/{ds.test_dim}"
    )

    print("TRAINING AND EVALUATION OF GCN:")
    if use_mesh:
        from parallel_gcn_tpu.parallel.train_parallel import fit_parallel

        print(
            f"multi-chip: {cfg.tpu.n_devices or 'auto'} node-shards "
            f"x tp={cfg.tpu.tp}, halo={cfg.tpu.halo}"
        )
        result = fit_parallel(cfg, ds, resume_from=resume_from)
    else:
        result = fit(cfg, dds, resume_from=resume_from)
    print(
        f"epochs_run={result.epochs_run} "
        f"avg_epoch_time={result.avg_epoch_time_s * 1e3:.3f} ms"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
