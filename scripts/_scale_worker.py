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

    valid_triples(emit_triples(transcripts)).count()  # warmup
    # best-of-3: the sandbox VM sees host-level steal (load average >3
    # with no runnable process); min wall is the steal-free estimate
    wall = float("inf")
    n_triples = 0
    for _ in range(3):
        t0 = time.time()
        n_triples = valid_triples(emit_triples(transcripts)).count()
        wall = min(wall, time.time() - t0)
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
            }
        )
    )


if __name__ == "__main__":
    main()
