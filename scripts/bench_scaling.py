"""Two-parallelism scaling evidence (BASELINE.json north_rule).

The sandbox has no multi-executor cluster; per BASELINE.md the N→4N
executor criterion is evidenced by running the identical job at
local[8] and local[32] on the same input and reporting throughput at
both plus efficiency = tp_32 / (4 × tp_8).

Run: python scripts/bench_scaling.py [n_convs]
Writes BENCH/BASELINE.md and prints one JSON line.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_at(cpus: int, n_convs: int) -> dict:
    """Measure steady-state triple-emission throughput at local[cpus]
    (one warmup pass amortizes Python-worker and JIT startup, then one
    timed pass on the identical input)."""
    from json_ld_spark.operators.jsonld_ops import emit_triples, valid_triples
    from json_ld_spark.plans.session import build_session
    from json_ld_spark.sources.transcripts import synthesize_transcripts

    spark = build_session(
        app_name=f"scaling-local{cpus}", cpus=cpus, shuffle_partitions=cpus
    )
    spark.sparkContext.setLogLevel("ERROR")
    transcripts = synthesize_transcripts(spark, n_convs=n_convs).cache()
    n_turns = transcripts.count()  # materialize input before timing

    valid_triples(emit_triples(transcripts)).count()  # warmup
    t0 = time.time()
    n_triples = valid_triples(emit_triples(transcripts)).count()
    wall = time.time() - t0

    spark.stop()
    return {
        "cpus": cpus,
        "turns": n_turns,
        "triples": n_triples,
        "wall_sec": round(wall, 3),
        "triples_per_sec": round(n_triples / wall, 1),
        "turns_per_sec": round(n_turns / wall, 1),
    }


def main() -> None:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 4000
    low = run_at(8, n_convs)
    high = run_at(32, n_convs)
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
after one warmup pass, at two local parallelism levels (sandbox
stand-in for N vs 4N executors per BASELINE.md).

| parallelism | turns | triples | wall (s) | triples/sec | turns/sec |
|---|---|---|---|---|---|
| local[8]  | {low['turns']} | {low['triples']} | {low['wall_sec']} | {low['triples_per_sec']} | {low['turns_per_sec']} |
| local[32] | {high['turns']} | {high['triples']} | {high['wall_sec']} | {high['triples_per_sec']} | {high['turns_per_sec']} |

**Scaling efficiency (tp_32 / (4 × tp_8)) = {efficiency}**
(BASELINE.json target ≥ 0.8).

Reproduce: `python scripts/bench_scaling.py {n_convs}`
"""
        )


if __name__ == "__main__":
    main()
