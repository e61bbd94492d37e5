#!/usr/bin/env python3
"""Probe-gated bench capture: run bench.py only in a certified-quiet window.

BENCH_r04.json shipped with parallel_capacity 0.284/0.225 — below the 0.5
contamination threshold this repo documents (COVERAGE.md round-3) — so its
numbers were not evidence. This wrapper enforces the protocol mechanically:

1. probe host capacity (forked-process sha256, same probe bench.py embeds);
   if < MIN_CAP, sleep and re-probe (the box is sharing cores with someone);
2. run bench.py;
3. accept the capture only if BOTH its embedded before/after probes are
   >= MIN_CAP (a window that degrades mid-run is rejected too);
4. retry up to MAX_TRIES, keeping the best-capacity capture as a fallback
   report (clearly marked non-evidence if it never met the bar).

Usage: python BENCH/quiet_bench.py [out.json]
Env: MIN_CAP (default 0.5), MAX_TRIES (default 6), PROBE_WAIT_S (default 120).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MIN_CAP = float(os.environ.get("MIN_CAP", "0.5"))
MAX_TRIES = int(os.environ.get("MAX_TRIES", "6"))
PROBE_WAIT_S = float(os.environ.get("PROBE_WAIT_S", "120"))
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def probe() -> float:
    import bench

    cap = bench._host_capacity_probe(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    return cap["parallel_capacity"] or 0.0


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bench_quiet.json"
    best: dict | None = None
    best_cap = -1.0
    for attempt in range(1, MAX_TRIES + 1):
        cap = probe()
        print(f"[quiet_bench] attempt {attempt}: pre-probe capacity {cap}", flush=True)
        if cap < MIN_CAP:
            time.sleep(PROBE_WAIT_S)
            continue
        r = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, cwd=REPO,
        )
        line = [l for l in r.stdout.splitlines() if l.startswith("{")]
        if not line:
            print(f"[quiet_bench] bench failed: {r.stderr[-500:]}", flush=True)
            continue
        data = json.loads(line[-1])
        pb = data["host_probe"]["before"]["parallel_capacity"] or 0.0
        pa = data["host_probe"]["after"]["parallel_capacity"] or 0.0
        data["quiet_window_certified"] = bool(pb >= MIN_CAP and pa >= MIN_CAP)
        data["quiet_min_cap"] = MIN_CAP
        data["quiet_attempt"] = attempt
        worst = min(pb, pa)
        print(f"[quiet_bench] capture probes {pb}/{pa} certified={data['quiet_window_certified']}", flush=True)
        if worst > best_cap:
            best_cap, best = worst, data
        if data["quiet_window_certified"]:
            break
        time.sleep(PROBE_WAIT_S)
    if best is None:
        sys.exit("[quiet_bench] no capture obtained")
    with open(out_path, "w") as f:
        json.dump(best, f)
        f.write("\n")
    print(f"[quiet_bench] wrote {out_path} (worst probe {best_cap}, "
          f"certified={best['quiet_window_certified']})", flush=True)


if __name__ == "__main__":
    main()
