#!/usr/bin/env python
"""Inject driver-recorded BENCH_r{N}.json numbers into BASELINE.md's
round-over-round table (r7 verdict item 3, carried to r9: the round
columns kept going stale when filled by hand).

Usage:  python scripts/update_baseline.py            # rewrite in place
        python scripts/update_baseline.py --check    # exit 1 if stale

The table is parsed from BASELINE.md (header `| query | r1 | ...`),
every `BENCH_r*.json` at the repo root is read, and the table is
regenerated with one column per recorded round. Hand-written Δ-note
cells are PRESERVED per row; new headline queries (bench.py additions)
gain rows with empty cells for rounds that predate them. Run it at the
start of each round, after the driver records the previous round's
BENCH file.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BASELINE = os.path.join(ROOT, "BASELINE.md")


def load_benches() -> dict[int, dict]:
    out: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(ROOT, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        with open(path) as f:
            data = json.load(f)
        # the driver wraps bench.py's JSON line under "parsed"
        out[int(m.group(1))] = data.get("parsed", data) or {}
    return out


def fmt(v: float | None) -> str:
    return "" if v is None else f"{v:.3f}"


def rebuild(text: str, benches: dict[int, dict]) -> str:
    rounds = sorted(benches)
    lines = text.split("\n")
    start = next(
        i for i, ln in enumerate(lines)
        if re.match(r"\| query \| r1 \|", ln)
    )
    end = start
    while end < len(lines) and lines[end].startswith("|"):
        end += 1

    # parse existing rows: name -> note (values are regenerated from
    # the BENCH files, which are the source of truth)
    notes: dict[str, str] = {}
    order: list[str] = []
    for ln in lines[start + 2:end]:
        cells = [c.strip() for c in ln.strip().strip("|").split("|")]
        name = cells[0].strip("*")
        notes[name] = cells[-1]
        if name != "total":
            order.append(name)

    # union of queries across all rounds, original order first
    all_queries = list(order)
    for r in rounds:
        for q in benches[r].get("queries", {}):
            if q not in all_queries:
                all_queries.append(q)

    header = "| query | " + " | ".join(f"r{r}" for r in rounds) + " | Δ note |"
    sep = "|---" * (len(rounds) + 2) + "|"
    rows = [header, sep]
    for q in all_queries:
        vals = [benches[r].get("queries", {}).get(q) for r in rounds]
        rows.append(
            f"| {q} | " + " | ".join(fmt(v) for v in vals)
            + f" | {notes.get(q, '')} |"
        )
    totals = [benches[r].get("value") for r in rounds]
    rows.append(
        "| **total** | "
        + " | ".join(f"**{fmt(v)}**" if v is not None else "" for v in totals)
        + f" | {notes.get('total', '')} |"
    )
    return "\n".join(lines[:start] + rows + lines[end:])


def main() -> None:
    with open(BASELINE) as f:
        text = f.read()
    new = rebuild(text, load_benches())
    if "--check" in sys.argv:
        sys.exit(0 if new == text else 1)
    if new != text:
        with open(BASELINE, "w") as f:
            f.write(new)
        print("BASELINE.md round table updated")
    else:
        print("BASELINE.md round table already current")


if __name__ == "__main__":
    main()
