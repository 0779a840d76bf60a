"""Plotting harness — port of the reference's R plot scripts
(script/plot_performance_comparison.R, script/plot_cuda_parameters_tuning.R,
script/plot_accuracy_tuning.R) to matplotlib SVG output.

Reads the machine-readable result files the other harnesses write under
output/ and renders the same three figure families the reference ships:

  performance  — mean epoch time per dataset, ours vs the published GPU/CPU
                 baselines (plot_performance_comparison.R's grouped bars)
  layout       — epoch time across the layout sweep (the TPU analog of the
                 CUDA launch-geometry tuning plot)
  accuracy     — 20-seed val-accuracy mean±sd across hyperparameter configs
                 (plot_accuracy_tuning.R)
  scaling      — multi-device scaling efficiency (beyond-reference)

Usage:
    python harness/plots.py [performance|layout|accuracy|scaling|all]
Writes SVGs to output/plots/. Skips any figure whose input file is missing.
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(REPO, "output")
PLOTS = os.path.join(OUT, "plots")
sys.path.insert(0, REPO)

# Validated categorical palette (first three slots are all-pairs CVD-safe);
# color follows the entity across every figure: ours=blue, ref-GPU=orange,
# ref-CPU=aqua. Text never wears a series color.
C_OURS = "#2a78d6"
C_GPU = "#eb6834"
C_CPU = "#1baf7a"
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
GRID = "#e5e4e0"

def _baselines():
    """Published GPU/CPU ms (report p.12 Table 3) — single source of truth in
    harness/performance.py; synth-* stand-ins alias their real dataset."""
    from harness.performance import BASELINE_CPU_MS, BASELINE_GPU_MS

    return BASELINE_GPU_MS, BASELINE_CPU_MS


def _style(ax, title):
    ax.set_facecolor(SURFACE)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=10)
    ax.tick_params(colors=INK2, labelsize=8.5)
    for s in ("top", "right"):
        ax.spines[s].set_visible(False)
    for s in ("left", "bottom"):
        ax.spines[s].set_color(GRID)
    ax.yaxis.grid(True, color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)


def _save(fig, name):
    os.makedirs(PLOTS, exist_ok=True)
    path = os.path.join(PLOTS, name)
    fig.patch.set_facecolor(SURFACE)
    fig.savefig(path, format="svg", bbox_inches="tight")
    print(f"wrote {path}")


def _baseline_for(dataset):
    gpu, cpu = _baselines()
    key = dataset if dataset in gpu else dataset.replace("synth-", "")
    if key not in gpu:
        return None
    return gpu[key], cpu[key]


def plot_performance():
    import matplotlib.pyplot as plt
    import numpy as np

    src = os.path.join(OUT, "performance_tpu.txt")
    if not os.path.exists(src):
        print(f"skip performance: {src} missing")
        return
    rows = [json.loads(l) for l in open(src) if l.strip() and not l.startswith("#")]
    rows = [r for r in rows if _baseline_for(r["dataset"])]
    if not rows:
        print("skip performance: no benchmarked datasets")
        return

    x = np.arange(len(rows))
    ours = [r.get("epoch_ms_median", r.get("epoch_ms_mean")) for r in rows]
    gpu = [_baseline_for(r["dataset"])[0] for r in rows]
    cpu = [_baseline_for(r["dataset"])[1] for r in rows]

    fig, ax = plt.subplots(figsize=(7, 4))
    w = 0.26
    # 2px-equivalent gap between adjacent bars via width < offset
    ax.bar(x - w, ours, w * 0.92, color=C_OURS, label="TPU v5e (ours)")
    ax.bar(x, gpu, w * 0.92, color=C_GPU, label="Tesla T4 (reference)")
    ax.bar(x + w, cpu, w * 0.92, color=C_CPU, label="CPU (reference)")
    ax.set_yscale("log")
    ax.set_xticks(x, [r["dataset"] for r in rows])
    ax.set_ylabel("mean epoch time (ms, log)", color=INK2, fontsize=9)
    # selective direct labels: speedup over the GPU baseline on our bars only
    # (ratio of the PLOTTED means, so the label matches the bars)
    for xi, r, g in zip(x, rows, gpu):
        ax.annotate(
            f'{g / r.get("epoch_ms_median", r.get("epoch_ms_mean")):.1f}×',
            (xi - w, r.get("epoch_ms_median", r.get("epoch_ms_mean"))),
            textcoords="offset points",
            xytext=(0, 3),
            ha="center",
            fontsize=8,
            color=INK,
        )
    ax.legend(frameon=False, fontsize=8.5, labelcolor=INK)
    _style(ax, "Training epoch time — this framework vs reference baselines")
    _save(fig, "performance_comparison.svg")
    plt.close(fig)


def plot_layout():
    import matplotlib.pyplot as plt
    import numpy as np

    if not os.path.isdir(OUT):
        print("skip layout: no output/ directory")
        return
    sources = sorted(
        f for f in os.listdir(OUT) if f.startswith("tuning_layout") and f.endswith(".txt")
    )
    if not sources:
        print("skip layout: no tuning_layout*.txt")
        return
    rows = []
    for f in sources:
        for line in open(os.path.join(OUT, f)):
            parts = line.split()
            if len(parts) == 3:
                rows.append((float(parts[0]), parts[1], parts[2]))
    if not rows:
        print("skip layout: empty sweep files")
        return
    for dataset in sorted({r[1] for r in rows}):
        sub = sorted([r for r in rows if r[1] == dataset], reverse=True)
        y = np.arange(len(sub))
        fig, ax = plt.subplots(figsize=(7, 0.42 * len(sub) + 1.2))
        ax.barh(y, [r[0] for r in sub], 0.62, color=C_OURS)
        best = min(r[0] for r in sub)
        ax.barh(
            [i for i, r in enumerate(sub) if r[0] == best],
            [best],
            0.62,
            color=C_GPU,
        )
        ax.set_yticks(y, [r[2] for r in sub], fontsize=8)
        ax.set_xlabel("epoch time (ms)", color=INK2, fontsize=9)
        for yi, r in zip(y, sub):
            ax.annotate(
                f"{r[0]:.1f}",
                (r[0], yi),
                textcoords="offset points",
                xytext=(4, -3),
                fontsize=8,
                color=INK2,
            )
        ax.xaxis.grid(True, color=GRID, linewidth=0.6)
        ax.yaxis.grid(False)
        _style(ax, f"Layout sweep — {dataset} (best in orange)")
        ax.yaxis.grid(False)
        _save(fig, f"tuning_layout_{dataset}.svg")
        plt.close(fig)


def plot_accuracy():
    import matplotlib.pyplot as plt
    import numpy as np

    if not os.path.isdir(OUT):
        print("skip accuracy: no output/ directory")
        return
    sources = sorted(
        f for f in os.listdir(OUT)
        if (f.startswith("tuning_") and f.endswith(".txt")
            and not f.startswith("tuning_layout"))
    )
    if "tuning_tpu.txt" in sources and "tuning_cora.txt" in sources:
        # legacy single-file name aliased cora; a fresh per-dataset file wins
        sources.remove("tuning_tpu.txt")
    if not sources:
        print("skip accuracy: no tuning_<dataset>.txt")
        return
    for fname in sources:
        dataset = fname[len("tuning_"):-len(".txt")]
        if dataset == "tpu":
            dataset = "cora"  # legacy single-file name
        rows = []
        for line in open(os.path.join(OUT, fname)):
            parts = line.split()
            if len(parts) >= 4:
                rows.append((float(parts[0]), float(parts[1]), " ".join(parts[3:])))
        if not rows:
            continue
        rows = sorted(rows, reverse=True)[:15][::-1]
        y = np.arange(len(rows))
        fig, ax = plt.subplots(figsize=(7, 0.42 * len(rows) + 1.2))
        ax.errorbar(
            [r[0] for r in rows],
            y,
            xerr=[r[1] for r in rows],
            fmt="o",
            markersize=6,
            color=C_OURS,
            ecolor=INK2,
            elinewidth=1.2,
            capsize=3,
        )
        ax.set_yticks(y, [r[2] for r in rows], fontsize=8)
        ax.set_xlabel(
            "validation accuracy, mean ± sd over seeds (%)", color=INK2, fontsize=9
        )
        ax.xaxis.grid(True, color=GRID, linewidth=0.6)
        _style(
            ax,
            f"Hyperparameter sweep — {dataset} top configurations (seed statistics)",
        )
        ax.yaxis.grid(False)
        _save(fig, f"tuning_accuracy_{dataset}.svg")
        plt.close(fig)


def plot_scaling():
    import matplotlib.pyplot as plt

    src = os.path.join(OUT, "scaling_tpu.txt")
    if not os.path.exists(src):
        print(f"skip scaling: {src} missing")
        return
    series = {}
    for line in open(src):
        parts = line.split()
        if line.startswith("#") or "efficiency" not in parts:
            continue
        eff = float(parts[parts.index("efficiency") + 1].rstrip("%"))
        # "n= 4" splits into two tokens; "n=16" is one — handle both
        n = None
        for i, tok in enumerate(parts):
            if tok == "n=":
                n = int(parts[i + 1])
            elif tok.startswith("n=") and tok[2:].isdigit():
                n = int(tok[2:])
        if n is None:
            continue
        series.setdefault(parts[0], []).append((n, eff))
    if not series:
        print("skip scaling: empty file")
        return
    fig, ax = plt.subplots(figsize=(7, 4))
    colors = [C_OURS, C_GPU, C_CPU]
    for (name, pts), color in zip(sorted(series.items()), colors):
        pts.sort()
        ax.plot(
            [p[0] for p in pts],
            [p[1] for p in pts],
            marker="o",
            markersize=5,
            linewidth=2,
            color=color,
            label=name,
        )
    ax.set_xscale("log", base=2)
    ax.set_xlabel("devices", color=INK2, fontsize=9)
    ax.set_ylabel("scaling efficiency (%)", color=INK2, fontsize=9)
    ax.legend(frameon=False, fontsize=8.5, labelcolor=INK)
    _style(ax, "Multi-device scaling efficiency by halo-exchange mode")
    _save(fig, "scaling.svg")
    plt.close(fig)


ALL = {
    "performance": plot_performance,
    "layout": plot_layout,
    "accuracy": plot_accuracy,
    "scaling": plot_scaling,
}


def main(argv):
    which = argv[1:] or ["all"]
    names = list(ALL) if which == ["all"] else which
    for name in names:
        if name not in ALL:
            print(f"unknown figure '{name}' (choose from {', '.join(ALL)} or all)")
            return 1
        ALL[name]()
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv))
