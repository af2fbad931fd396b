"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The sandbox has no multi-executor cluster; per BASELINE.md the N→4N
executor criterion is evidenced by running the identical job at two
parallelism levels on the same input and reporting throughput at both
plus efficiency = tp_high / (4 × tp_low).

Fairness: each measurement runs in its own process pinned with
``taskset`` to exactly its CPU budget (cores 0-7 vs 0-31). Without
pinning, a local[8] JVM on a 32-core box offloads GC/Arrow/shuffle
threads onto the 24 idle cores — an unfairly fast "N-executor"
baseline that a real 8-core executor would not get.

Run: python scripts/bench_scaling.py [n_convs]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_pinned(cpus: int, n_convs: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{cpus - 1}",
        sys.executable, os.path.join(REPO, "scripts", "_scale_worker.py"),
        str(cpus), str(n_convs),
    ]
    out = subprocess.run(
        cmd, capture_output=True, text=True, check=True, cwd=REPO
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = run_pinned(8, n_convs)
    high = run_pinned(32, n_convs)
    efficiency = round(
        high["triples_per_sec"] / (4 * low["triples_per_sec"]), 3
    )
    result = {"local8": low, "local32": high, "scaling_efficiency": efficiency}
    print(json.dumps(result))

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(
            f"""# BENCH — two-parallelism scaling evidence

Same job (synthesized transcripts → stable-order window → mention
detection + JSON-LD expand + toRDF → global dedup → count), same input
({low['turns']} turns from {n_convs} conversations, seed 42), measured
after one warmup pass, at two parallelism levels (sandbox stand-in for
N vs 4N executors per BASELINE.md). Each run is CPU-pinned with
taskset to exactly its core budget so the low-parallelism baseline
cannot borrow idle cores for JVM/Arrow/GC work.

| parallelism | pinned cores | turns | triples | wall (s) | triples/sec | turns/sec |
|---|---|---|---|---|---|---|
| local[8]  | {low['affinity']} | {low['turns']} | {low['triples']} | {low['wall_sec']} | {low['triples_per_sec']} | {low['turns_per_sec']} |
| local[32] | {high['affinity']} | {high['turns']} | {high['triples']} | {high['wall_sec']} | {high['triples_per_sec']} | {high['turns_per_sec']} |

**Scaling efficiency (tp_32 / (4 × tp_8)) = {efficiency}**
(BASELINE.json target ≥ 0.8).

Reproduce: `python scripts/bench_scaling.py {n_convs}`
"""
        )


if __name__ == "__main__":
    main()
