"""Evidence-freshness gate — fail when committed output/ artifacts drift
from the harness code that claims to produce them.

Three consecutive round snapshots shipped stale or truncated evidence
(VERDICT r4 weak item 1: performance_tpu.txt predating the median-discipline
harness). This check encodes the invariants mechanically so `make evidence`
can refuse a snapshot whose artifacts lag the code:

  1. every `output/...` path cited in PERFORMANCE.md / PARITY.md exists;
  2. performance_tpu.txt rows parse as the CURRENT schema (epoch_ms_median
     present — the r4 staleness marker), come from a real chip, and cover
     the four headline datasets;
  3. layout-sweep artifacts cited as tile evidence contain tile rows, not
     a truncated dense-only prefix (r4 weak item 2).

Exit 0 = evidence reproduces from current code; nonzero lists the drift.
"""

from __future__ import annotations

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
HEADLINE = ("cora", "citeseer", "synth-pubmed", "synth-reddit")


def fail(msgs: list[str], msg: str) -> None:
    msgs.append(msg)
    print(f"DRIFT: {msg}")


def check_cited_paths(msgs: list[str]) -> None:
    cited: set[str] = set()
    for doc in ("PERFORMANCE.md", "PARITY.md"):
        path = os.path.join(REPO, doc)
        if not os.path.exists(path):
            continue
        text = open(path).read()
        # an output/ path counts as cited evidence wherever it appears
        for m in re.finditer(r"output/[\w.\-/]+\.(?:txt|svg|json)", text):
            cited.add(m.group(0))
    for rel in sorted(cited):
        if not os.path.exists(os.path.join(REPO, rel)):
            fail(msgs, f"{rel} cited in docs but not present")


def check_performance(msgs: list[str]) -> None:
    path = os.path.join(REPO, "output", "performance_tpu.txt")
    if not os.path.exists(path):
        fail(msgs, "output/performance_tpu.txt missing")
        return
    seen = set()
    for i, line in enumerate(open(path), 1):
        line = line.strip()
        if not line:
            continue
        try:
            row = json.loads(line)
        except json.JSONDecodeError:
            fail(msgs, f"performance_tpu.txt:{i} is not JSON")
            continue
        if "epoch_ms_median" not in row:
            fail(msgs, f"performance_tpu.txt:{i} ({row.get('dataset')}) "
                 "predates the median-discipline harness "
                 "(no epoch_ms_median field) — regenerate with "
                 "harness/performance.py on the chip")
        if row.get("device") not in ("tpu", "axon"):
            fail(msgs, f"performance_tpu.txt:{i} measured on "
                 f"'{row.get('device')}', not a real chip")
        seen.add(row.get("dataset"))
    for ds in HEADLINE:
        if ds not in seen:
            fail(msgs, f"performance_tpu.txt has no row for {ds}")


def check_layout_sweeps(msgs: list[str]) -> None:
    for name in ("citeseer", "synth-pubmed", "synth-reddit"):
        path = os.path.join(REPO, "output", f"tuning_layout_{name}.txt")
        if not os.path.exists(path):
            fail(msgs, f"output/tuning_layout_{name}.txt missing")
            continue
        rows = [ln for ln in open(path) if ln.strip()]
        tiled = [ln for ln in rows if "/t" in ln]
        if len(rows) < 4 or not tiled:
            fail(msgs, f"tuning_layout_{name}.txt looks truncated "
                 f"({len(rows)} rows, {len(tiled)} tile rows) — the sweep "
                 "did not finish")


def main() -> int:
    msgs: list[str] = []
    check_cited_paths(msgs)
    check_performance(msgs)
    check_layout_sweeps(msgs)
    if msgs:
        print(f"\n{len(msgs)} evidence-drift problem(s) — regenerate the "
              "artifacts above with the current harness before committing "
              "the snapshot")
        return 1
    print("evidence check: all committed artifacts match the current "
          "harness formats")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
