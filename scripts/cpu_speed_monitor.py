#!/usr/bin/env python
"""Continuous in-guest effective-CPU-speed monitor (round 17, pentagon
slow-mode instrumentation — companion to exp_pentagon_probe.py).

Every INTERVAL seconds: time a fixed single-thread numpy workload
(~0.25 s at full speed) and record the /proc/stat deltas (user/idle/
steal) across the sample. The box is a Firecracker guest; host-side
tenancy shows up as the fixed workload slowing with guest load1 still
low. One JSONL line per sample. Stop with pkill -f cpu_speed_monitor.

Usage: python3 scripts/cpu_speed_monitor.py [out.jsonl] [interval_s]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

OUT = sys.argv[1] if len(sys.argv) > 1 else "/tmp/cpu_monitor.jsonl"
INTERVAL = float(sys.argv[2]) if len(sys.argv) > 2 else 30.0


def proc_stat() -> list[int]:
    with open("/proc/stat") as f:
        return [int(x) for x in f.readline().split()[1:]]


def cal() -> float:
    rng = np.random.default_rng(7)
    t = time.time()
    for _ in range(3):
        x = rng.integers(0, 1_000_000, 2_000_000)
        np.sort(x)
        np.unique(x)
    return time.time() - t


def main() -> None:
    while True:
        s0 = proc_stat()
        c = cal()
        s1 = proc_stat()
        d = [b - a for a, b in zip(s0, s1)]
        tot = max(sum(d), 1)
        rec = {
            "t": round(time.time(), 1),
            "cal": round(c, 3),
            "load1": round(os.getloadavg()[0], 2),
            "user_pct": round(100 * d[0] / tot, 1),
            "idle_pct": round(100 * d[3] / tot, 1),
            "steal_pct": round(100 * d[7] / tot, 1),
        }
        with open(OUT, "a") as f:
            f.write(json.dumps(rec) + "\n")
        time.sleep(INTERVAL)


if __name__ == "__main__":
    main()
