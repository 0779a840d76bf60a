"""Device-side profiling helpers.

The reference profiles with host timers + nsys (SURVEY.md §5.1); the TPU
analog is jax.profiler traces. ``profile_fn`` captures a trace of one call and
``summarize_trace`` aggregates per-op device time from the trace JSON — which
is how the input-dropout fusion was identified as the dominant per-epoch cost
(and replaced with the Pallas hardware-PRNG kernel).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import tempfile

import jax
import numpy as np


def profile_fn(fn, *args, trace_dir: str | None = None):
    """Run ``fn(*args)`` under a profiler trace; returns (result, trace_dir)."""
    trace_dir = trace_dir or tempfile.mkdtemp(prefix="pgcn_trace_")
    with jax.profiler.trace(trace_dir):
        out = fn(*args)
        np.asarray(jax.tree.leaves(out)[0])  # force completion
    return out, trace_dir


def summarize_trace(trace_dir: str, top: int = 20) -> list[tuple[str, float, int]]:
    """Aggregate device-op durations from a trace directory.

    Returns [(op_name, total_ms, count)] sorted by total time, device ops only.
    """
    paths = glob.glob(
        os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True
    )
    if not paths:
        return []
    with gzip.open(sorted(paths)[-1]) as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n or "device" in n.lower()}
    durs: collections.Counter = collections.Counter()
    counts: collections.Counter = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in tpu_pids:
            durs[e.get("name", "")] += e.get("dur", 0)
            counts[e.get("name", "")] += 1
    return [(n, d / 1e3, counts[n]) for n, d in durs.most_common(top)]


def print_trace_summary(trace_dir: str, top: int = 20) -> None:
    rows = summarize_trace(trace_dir, top)
    for name, ms, count in rows:
        print(f"{ms:10.3f} ms  x{count:<6} {name[:80]}")
