"""Pack-geometry census — predict each candidate layout's aggregation-pass
cost from the measured v5e constants BEFORE paying a real-chip compile.

The layout sweep (tuning_layout.py) costs a cold XLA compile per combo
(~20-40 s through the tunnel); most combos lose on arithmetic alone. This
tool builds each candidate pack host-side (CPU) and scores it with the
house cost model (PERFORMANCE.md "Measured hardware constants"):

    pass_cost = max(tile_bytes / 819 GB/s, n_tiles * 0.36 us)   # tile part
              + residual_live_edges * 14 ns                      # COO part

so the real-chip sweep only needs the plausible frontier. The same
discipline as residual_stats.py: bound the win with numbers before buying
it (reference analog: the launch-geometry pre-selection in
/root/reference/test/tuning_cuda.cpp:26-54 sweeps a pruned grid too).

Usage:
    python harness/pack_census.py <dataset> [--tiles 128,256,512]
        [--mults 1,2,4] [--reorders rcm,community] [--min-nnz auto,...]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

HBM_BPS = 819e9      # measured stream rate
GRID_STEP_S = 0.36e-6  # measured Pallas per-grid-step overhead
EDGE_NS = 14e-9      # measured segment-path per-edge cost (gather+scatter)


def census(dataset: str, reorder: str, tile: int, cols: int,
           min_nnz, tile_dtype: str) -> dict | None:
    from parallel_gcn_tpu.config import default_params_path, load_config
    from parallel_gcn_tpu.data.parser import prepare_device_dataset

    cfg = load_config(default_params_path(dataset))
    cfg.tpu.backend = "hybrid"
    cfg.tpu.reorder = reorder
    cfg.tpu.tile_size = tile
    cfg.tpu.tile_cols = cols
    cfg.tpu.tile_dtype = tile_dtype
    if min_nnz is not None:
        cfg.tpu.min_tile_nnz = min_nnz
    try:
        ds, dds = prepare_device_dataset(cfg, dataset)
    except Exception as e:
        print(f"  {reorder}/t{tile}x{cols}/nnz{min_nnz}: build failed "
              f"({type(e).__name__}: {e})", file=sys.stderr)
        return None
    g = dds.graph
    if g.bcsr is None:
        return None
    pack = g.bcsr
    tiles = np.asarray(pack.tiles)
    n_tiles = int(pack.n_tiles_real)
    tile_bytes = n_tiles * tiles.shape[1] * tiles.shape[2] * tiles.dtype.itemsize
    resid = int((np.asarray(g.val) != 0).sum()) if g.is_hybrid else 0
    covered = int(np.count_nonzero(tiles[:n_tiles]))
    tile_cost = max(tile_bytes / HBM_BPS, n_tiles * GRID_STEP_S)
    resid_cost = resid * EDGE_NS
    return dict(
        reorder=reorder, tile=tile, cols=cols, min_nnz=min_nnz,
        dtype=str(tiles.dtype), n_tiles=n_tiles, tile_bytes=tile_bytes,
        covered=covered, resid=resid,
        fill=covered / max(n_tiles * tiles.shape[1] * tiles.shape[2], 1),
        pred_us=(tile_cost + resid_cost) * 1e6,
        bound="grid" if n_tiles * GRID_STEP_S > tile_bytes / HBM_BPS
        else "bytes",
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("dataset")
    ap.add_argument("--tiles", default="128,256,512")
    ap.add_argument("--mults", default="1,2,4")
    ap.add_argument("--reorders", default="rcm,community")
    ap.add_argument("--min-nnz", default="auto",
                    help="comma list; 'auto' = dataset config default")
    ap.add_argument("--tile-dtype", default="int8")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")  # census is host-side only

    rows = []
    nnz_list = [None if v == "auto" else int(v)
                for v in args.min_nnz.split(",")]
    for reorder in args.reorders.split(","):
        for tile in (int(t) for t in args.tiles.split(",")):
            for mult in (int(m) for m in args.mults.split(",")):
                for nnz in nnz_list:
                    r = census(args.dataset, reorder, tile, tile * mult,
                               nnz, args.tile_dtype)
                    if r is None:
                        continue
                    rows.append(r)
                    print(
                        f"{args.dataset} {reorder:9s} t{tile}x{tile * mult:<5d}"
                        f" nnz={str(nnz):>4s} {r['dtype']:5s} tiles={r['n_tiles']:5d}"
                        f" bytes={r['tile_bytes'] / 1e6:8.2f}MB"
                        f" fill={r['fill']:6.2%} resid={r['resid']:7d}"
                        f" pred={r['pred_us']:7.1f}us/pass [{r['bound']}]",
                        flush=True,
                    )
    rows.sort(key=lambda r: r["pred_us"])
    print("\npredicted frontier (confirm the top few on the real chip):")
    for r in rows[:6]:
        print(f"  {r['reorder']}/t{r['tile']}x{r['cols']}/nnz{r['min_nnz']}"
              f" -> {r['pred_us']:.1f} us/pass")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
