#!/usr/bin/env python
"""Quiet-host canary for the round-17 measurement discipline.

The sandbox shares a hypervisor: outside-VM neighbors show up as CPU
steal time and uniformly inflate every bench number (the round-16
pinned-load slide had the same signature). Sample /proc/stat over a
few seconds and report the steal/iowait share so sweeps are only
trusted when the host is actually quiet.

Usage: python scripts/host_quiet.py [seconds]   (default 10)
Exit code 0 if steal < 1.0% and iowait < 2.0%, else 1.
"""

from __future__ import annotations

import sys
import time


def cpu_row() -> list[int]:
    with open("/proc/stat") as f:
        for line in f:
            if line.startswith("cpu "):
                return [int(x) for x in line.split()[1:]]
    raise RuntimeError("no cpu line in /proc/stat")


def main() -> None:
    secs = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    a = cpu_row()
    time.sleep(secs)
    b = cpu_row()
    d = [y - x for x, y in zip(a, b)]
    tot = sum(d) or 1
    names = ["user", "nice", "sys", "idle", "iowait", "irq", "softirq", "steal"]
    pct = {n: round(100.0 * v / tot, 2) for n, v in zip(names, d)}
    with open("/proc/loadavg") as f:
        load1 = float(f.read().split()[0])
    quiet = pct.get("steal", 0.0) < 1.0 and pct.get("iowait", 0.0) < 2.0
    print(f"QUIET {quiet} load1 {load1} {pct}")
    sys.exit(0 if quiet else 1)


if __name__ == "__main__":
    main()
