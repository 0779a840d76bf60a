"""Residual-structure census — is a dedicated residual kernel worth building?

The hybrid backend packs dense-enough tiles for the MXU and leaves a COO
residual on the segment path, which runs at the measured v5e descriptor rate
(~15-20 ns per gather/scatter index regardless of row width — PERFORMANCE.md
"Measured hardware constants"). Any kernel that would beat that rate needs
STRUCTURE: residual edges clustering into mini-blocks (so a grouped
Pallas kernel amortizes loads), or concentrating in high-degree rows (so a
CSC push batches per row). This tool measures both properties for a
dataset's packed layout, bounding the attainable win BEFORE building the
kernel — the reference project's optimization-record discipline
(/root/reference/report p.9 Table 1: every lever gets a number, win or
lose).

Usage:
    python harness/residual_stats.py <dataset>
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")  # census is host-side only

    from parallel_gcn_tpu.config import default_params_path, load_config
    from parallel_gcn_tpu.data.parser import prepare_device_dataset

    dataset = sys.argv[1] if len(sys.argv) > 1 else "synth-reddit"
    cfg = load_config(default_params_path(dataset))
    ds, dds = prepare_device_dataset(cfg, dataset)
    g = dds.graph
    if g.bcsr is None:
        print(f"{dataset}: config backend={cfg.tpu.backend} builds no tiles — "
              "nothing is on the residual path")
        return 0

    row = np.asarray(g.row)
    col = np.asarray(g.col)
    live = np.asarray(g.val) != 0
    row, col = row[live], col[live]
    n_pad = g.n_nodes
    print(f"{dataset}: residual nnz = {len(row):,} "
          f"(tiles hold the rest of the edges)")

    # mini-block clustering at the 8x128 sublane-lane granularity — the
    # finest tile a grouped kernel could exploit
    key = (row.astype(np.int64) // 8) * (n_pad // 128 + 1) + col // 128
    _, counts = np.unique(key, return_counts=True)
    print(f"8x128 blocks touched: {len(counts):,} (1024 slots each)")
    for t in (2, 4, 8, 16):
        m = counts >= t
        edges = int(counts[m].sum())
        print(f"  blocks with >= {t:2d} nnz: {m.sum():8,} covering "
              f"{edges:10,} edges ({edges / len(row) * 100:5.1f}% of residual)")

    rdeg = np.bincount(row, minlength=n_pad)
    nz = rdeg[rdeg > 0]
    print(f"residual rows: {len(nz):,} | degree mean {nz.mean():.1f} "
          f"p50 {np.percentile(nz, 50):.0f} p90 {np.percentile(nz, 90):.0f} "
          f"p99 {np.percentile(nz, 99):.0f} max {nz.max()}")
    cdeg = np.bincount(col, minlength=n_pad)
    nzc = cdeg[cdeg > 0]
    print(f"residual cols: {len(nzc):,} | fan-in mean {nzc.mean():.1f} "
          f"p99 {np.percentile(nzc, 99):.0f} max {nzc.max()}")

    # the verdict the numbers imply
    absorbable = int(counts[counts >= 2].sum())
    ns_per_index = 17e-9
    current_s = 2 * len(row) * ns_per_index
    bound_s = 2 * (len(row) - absorbable) * ns_per_index
    print(f"segment-path cost at the {ns_per_index * 1e9:.0f} ns/index "
          f"descriptor rate: ~{current_s * 1e3:.2f} ms/aggregation; "
          f"absorbing every >=2-nnz block bounds it at "
          f"~{bound_s * 1e3:.2f} ms — max win {100 * (1 - bound_s / current_s):.1f}%")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
