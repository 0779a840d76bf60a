"""Profiling harness — capture a device trace of one training epoch and print
the per-op cost table (the analog of the reference's `nsys profile` workflow,
SURVEY.md §5.1).

Usage:
    python harness/profile.py <dataset> [--top N] [--keep-trace DIR]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from parallel_gcn_tpu.config import default_params_path, load_config
from parallel_gcn_tpu.data.parser import prepare_device_dataset
from parallel_gcn_tpu.models.gcn import init_params
from parallel_gcn_tpu.optim import init_adam
from parallel_gcn_tpu.train import build_model, make_epoch_step, preaggregate_input
from parallel_gcn_tpu.utils.profiling import print_trace_summary, profile_fn


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--keep-trace", default=None)
    args = ap.parse_args()

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)

    cfg = load_config(default_params_path(args.dataset))
    cfg.train.verbose = False
    cfg.tpu.matmul_precision = "default"
    ds, dds = prepare_device_dataset(cfg, args.dataset)
    model = build_model(cfg, dds)
    if cfg.tpu.input_preagg:
        model, dds = preaggregate_input(model, dds)
    step = make_epoch_step(model, cfg, dds)

    key = jax.random.PRNGKey(cfg.tpu.seed)
    w = init_params(
        jax.random.PRNGKey(0), dds.input_dim, cfg.gcn.hidden_dims, dds.output_dim
    )
    opt = init_adam(w)
    w, opt, key, m = step(w, opt, key)  # compile + warm
    np.asarray(m)

    (w, opt, key, m), trace_dir = profile_fn(
        lambda: step(w, opt, key), trace_dir=args.keep_trace
    )
    np.asarray(m)
    print(f"# one-epoch device-op profile: {args.dataset} "
          f"(backend={model.backend}, trace: {trace_dir})")
    print_trace_summary(trace_dir, top=args.top)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
