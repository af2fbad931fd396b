"""Single scaling measurement (invoked by bench_scaling.py under
taskset so the CPU budget is real). Prints one JSON line.

Usage: taskset -c 0-7 python scripts/_scale_worker.py <cpus> <n_convs>
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    cpus = int(sys.argv[1])
    n_convs = int(sys.argv[2])

    from json_ld_spark.operators.jsonld_ops import emit_triples, valid_triples
    from json_ld_spark.plans.session import build_session
    from json_ld_spark.sources.transcripts import synthesize_transcripts

    spark = build_session(
        app_name=f"scaling-local{cpus}", cpus=cpus, shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = synthesize_transcripts(spark, n_convs=n_convs).cache()
    n_turns = transcripts.count()

    def steal_total():
        try:
            with open("/proc/stat") as f:
                vals = list(map(int, f.readline().split()[1:]))
            return vals[7], sum(vals)
        except (OSError, IndexError, ValueError):
            return 0, 1

    valid_triples(emit_triples(transcripts)).count()  # warmup
    # best-of-5 with per-rep steal%: the sandbox VM sees host-level
    # steal; min wall is the steal-free estimate and the recorded
    # steal column is the in-band proof of which reps were stolen
    wall = float("inf")
    n_triples = 0
    rep_steal: list = []
    min_steal = None
    for _ in range(5):
        s0, j0 = steal_total()
        t0 = time.time()
        n_triples = valid_triples(emit_triples(transcripts)).count()
        dt = time.time() - t0
        s1, j1 = steal_total()
        st = round(100.0 * (s1 - s0) / max(1, j1 - j0), 2)
        rep_steal.append(st)
        if dt < wall:
            wall, min_steal = dt, st
    spark.stop()

    print(
        json.dumps(
            {
                "cpus": cpus,
                "affinity": len(os.sched_getaffinity(0)),
                "turns": n_turns,
                "triples": n_triples,
                "wall_sec": round(wall, 3),
                "triples_per_sec": round(n_triples / wall, 1),
                "turns_per_sec": round(n_turns / wall, 1),
                "rep_steal_pct": rep_steal,
                "min_rep_steal_pct": min_steal,
            }
        )
    )


if __name__ == "__main__":
    main()
