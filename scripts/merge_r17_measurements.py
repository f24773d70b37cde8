#!/usr/bin/env python
"""Merge round-17 measurement sources into per-query minima.

Sources: opt_measure JSON files (min-of-N with per-query calibration
brackets) and bench.py logs (protocol runs with their stamps). The
host ran in degraded-tenancy episodes for most of the round
(SCALING.md), so no single session is clean end-to-end; the defensible
per-query estimate is the MINIMUM across all runs, reported next to
r16 driver numbers and each source's calibration evidence.

Usage: python3 scripts/merge_r17_measurements.py out.json src1 src2 ...
  (sources: *.json from opt_measure --json, *.log from bench.py runs)
"""

from __future__ import annotations

import json
import re
import sys


def load_bench_log(path: str) -> dict[str, float]:
    txt = open(path).read()
    hits = re.findall(r'\{"metric".*\}', txt)
    if not hits:
        return {}
    return json.loads(hits[-1])["queries"]


def main() -> None:
    out_path = sys.argv[1]
    merged: dict[str, dict] = {}
    for src in sys.argv[2:]:
        if src.endswith(".json"):
            data = {k: v["min"] for k, v in json.load(open(src)).items()}
        else:
            data = load_bench_log(src)
        for q, sec in data.items():
            cur = merged.setdefault(q, {"min": float("inf"), "src": None,
                                        "all": {}})
            cur["all"][src] = sec
            if sec < cur["min"]:
                cur["min"] = sec
                cur["src"] = src
    with open(out_path, "w") as f:
        json.dump(merged, f, indent=1, sort_keys=True)
    for q in sorted(merged, key=lambda q: -merged[q]["min"]):
        m = merged[q]
        print(f"{q}: {m['min']} ({m['src']})")


if __name__ == "__main__":
    main()
