"""Headline benchmark — prints ONE JSON line.

Metric: geometric-mean speedup of per-epoch training time (train fwd+bwd +
Adam + full val eval, fused scan mode, tuned configs) over the reference's
Tesla T4 numbers (report p.12 Table 3 / BASELINE.md), across the four dataset
scales: cora, citeseer, synth-pubmed (real pubmed graph+split, synthetic
features — the .svmlight blob is not shipped), and synth-reddit
(community-structured graph matched to reddit's published statistics). The
per-epoch quantity is exactly what the reference's performance harness
measures (test/performance_gpu.cpp, TMR_TRAIN wraps train_epoch()+eval(2),
src/gcn.cu:363-374).

vs_baseline > 1 means faster than the reference GPU. Per-dataset numbers are
logged to stderr and included in the "detail" field.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

BASELINE_MS = {
    "cora": 0.277,
    "citeseer": 0.325,
    "pubmed": 1.418,
    "reddit": 231.518,
    "synth-pubmed": 1.418,   # real pubmed graph; features synthetic
    "synth-reddit": 231.518,  # statistics-matched graph
}
# Many epochs per run call: the whole run is one fused device program, so a
# longer run amortizes the single host dispatch (~30 ms through the axon
# tunnel) and reports honest per-epoch device time. The reference likewise
# averages per-epoch time across full runs (test/performance_gpu.cpp).
# Reddit-scale epochs are ~100 ms each — fewer epochs/reps suffice.
EPOCHS = {"synth-reddit": 100}
EPOCHS_DEFAULT = 1000
REPS = {"synth-reddit": 5}
# sub-ms epochs: tunnel jitter dominates single reps (observed spread
# 0.106-0.115 ms on cora across runs), and each rep costs < 1 s — take the
# min over more of them
REPS_DEFAULT = 9
DATASETS = ["cora", "citeseer", "synth-pubmed", "synth-reddit"]


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def bench_dataset(name: str) -> dict:
    import jax

    # persistent compilation cache: the fused whole-run program takes ~2 min to
    # compile through the remote-compile tunnel; cache it across processes
    import os

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from parallel_gcn_tpu.config import default_params_path, load_config
    from parallel_gcn_tpu.data.parser import prepare_device_dataset
    from parallel_gcn_tpu.train import init_model_params
    from parallel_gcn_tpu.optim import init_adam
    from parallel_gcn_tpu.train import (
        _make_scan_run,
        build_model,
        make_eval_fn,
        preaggregate_input,
    )

    epochs = EPOCHS.get(name, EPOCHS_DEFAULT)
    cfg = load_config(default_params_path(name))
    cfg.gcn.epochs = epochs
    cfg.gcn.early_stopping = 0
    cfg.train.verbose = False
    cfg.tpu.matmul_precision = "default"  # fast MXU path (accuracy unaffected)

    ds, dds = prepare_device_dataset(cfg, name)
    model = build_model(cfg, dds)
    if cfg.tpu.input_preagg:
        model, dds = preaggregate_input(model, dds)
    run = _make_scan_run(model, cfg, dds)
    log(f"[{name}] backend={model.backend} epochs={epochs} device={jax.devices()[0]}")

    key = jax.random.PRNGKey(cfg.tpu.seed)

    def once():
        w = init_model_params(
            cfg, jax.random.PRNGKey(cfg.tpu.seed), dds.input_dim,
            dds.output_dim,
        )
        opt = init_adam(w)
        return run(w, opt, key)

    out = once()
    np.asarray(out[2])  # compile + warm up (block_until_ready can return
    # early through the axon tunnel; host materialization is the real barrier)

    times = []
    final = None
    for _ in range(REPS.get(name, REPS_DEFAULT)):
        t0 = time.perf_counter()
        out = once()
        np.asarray(out[2])
        times.append((time.perf_counter() - t0) / epochs)
        final = out

    # test accuracy from the final run's weights
    from parallel_gcn_tpu.data.parser import TEST

    test_fn = make_eval_fn(model, cfg, dds, TEST)
    test_loss, test_acc = (float(v) for v in test_fn(final[0]))

    epoch_ms = min(times) * 1e3
    metrics = np.asarray(final[2])
    log(
        f"[{name}] epoch={epoch_ms:.4f} ms (reps: "
        f"{[f'{t * 1e3:.4f}' for t in times]}), "
        f"final val_acc={metrics[-1, 3]:.4f}, test_acc={test_acc:.4f}"
    )
    return {
        "epoch_ms": epoch_ms,
        "test_acc": test_acc,
        "vs_baseline": BASELINE_MS[name] / epoch_ms,
    }


def tunnel_probe_ms() -> float:
    """Round-trip a trivial matmul to stamp the measurement window into the
    result: the axon tunnel degrades episodically (a healthy window returns
    in ~0.2 s; degraded windows have measured 200+ s), and sub-ms epoch
    numbers taken in a bad window read as regressions. The probe makes the
    recorded artifact carry its own context."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((256, 256))
    np.asarray(jnp.dot(x, x))  # compile + first transfer
    t0 = time.perf_counter()
    np.asarray(jnp.dot(x, x))
    return (time.perf_counter() - t0) * 1e3


def main() -> int:
    datasets = sys.argv[1:] or list(DATASETS)
    detail = {}
    failed = []
    try:
        probe_ms = round(tunnel_probe_ms(), 1)
        log(f"[probe] trivial-matmul round-trip {probe_ms} ms")
    except Exception as e:  # pragma: no cover - never sink the bench
        log(f"[probe] failed: {type(e).__name__}: {e}")
        probe_ms = None
    for name in datasets:
        try:
            r = bench_dataset(name)
        except Exception as e:  # never let one dataset sink the headline
            log(f"[{name}] FAILED: {type(e).__name__}: {e}")
            failed.append(name)
            continue
        detail[name] = {
            "epoch_ms": round(r["epoch_ms"], 4),
            "vs_t4": round(r["vs_baseline"], 3),
            "test_acc": round(r["test_acc"], 4),
        }

    if not detail:
        print(json.dumps({"metric": "epoch_speedup_geomean_vs_t4",
                          "value": None, "unit": "x", "vs_baseline": None,
                          "datasets_ok": [], "datasets_failed": failed}))
        return 1
    speedups = [d["vs_t4"] for d in detail.values()]
    geomean = float(np.exp(np.mean(np.log(speedups))))
    # partial coverage is machine-distinguishable: the topline geomean only
    # spans datasets_ok, and datasets_failed is non-empty when any configured
    # dataset sank
    print(json.dumps({
        "metric": "epoch_speedup_geomean_vs_t4",
        "value": round(geomean, 3),
        "unit": "x",
        "vs_baseline": round(geomean, 3),
        "datasets_ok": sorted(detail),
        "datasets_failed": failed,
        "tunnel_probe_ms": probe_ms,
        "detail": detail,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
