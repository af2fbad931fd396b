"""Deterministic scale-up of a driver sf directory (default sf0.1 →
sf1-equivalent) for beyond-sf0.1 correctness + bench evidence.

The driver ships sf{0.001,0.01,0.1}; the 100-TB mandate wants
evidence that every query stays correct and ~linear beyond that. This
replicates each fact table K times with disjoint key ranges — the
same shape a real corpus grows by (new documents, new orders, new
events), not a bigger copy of one row. Everything is arithmetic-only
and seedless, so the scaled tables are reproducible bit-for-bit and
every DuckDB oracle replays against them unchanged.

Per-table policy (dims region/nation stay as-is — they are fixed
vocabularies):
  - documents: doc_id += k·OFF; replica text gets a deterministic
    " rk<k>" suffix so replicas are NEAR-dups, not exact dups — a
    10× corpus of byte-identical copies would quadratically inflate
    candidate pairs in a way no real corpus does (and would measure
    the dedup ops on a degenerate input).
  - embeddings: vec_id += k·OFF, label += k·OFF (labels are blocking
    keys — keeping them per-replica bounds neardup blocks the way
    real shards do); each replicated vector is perturbed
    deterministically (dim-dependent, 4-dp rounded) to break
    distance ties so top-k orderings stay total.
  - orders/lineitem/customer/supplier/part: fact keys += k·OFF with
    foreign keys shifted consistently; nationkeys untouched.
  - events: event_id/user_id += k·OFF (ts kept — the stream replay
    derives its own thresholds from max(ts)).

Usage: python scripts/make_scaled_sf.py [K] [SRC] [DST]
       defaults: 10 /root/testdata/sf0.1 /tmp/sfscaled/sf1
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

OFF = 100_000_005  # divisible by 5 and 3: keeps the derived
# turn_idx/role arithmetic aligned within each replica


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/sfscaled/sf1"
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    con.execute(f"CREATE MACRO offs(x, r) AS x + r * {OFF}")

    def scale(table: str, select: str) -> None:
        out = f"{dst}/{table}.parquet"
        con.execute(
            f"""
            COPY (
              SELECT s.* FROM (
                SELECT {select}
                FROM read_parquet('{src}/{table}.parquet') t
                CROSS JOIN (SELECT unnest(generate_series(0, {k - 1})) AS r)
              ) s
            ) TO '{out}' (FORMAT PARQUET)
            """
        )
        n = con.execute(f"SELECT count(*) FROM read_parquet('{out}')").fetchone()[0]
        print(f"{table}: {n} rows")

    scale(
        "documents",
        "offs(t.doc_id, r) AS doc_id, "
        "CASE WHEN r = 0 THEN t.text ELSE t.text || ' rk' || r END AS text, "
        "t.lang, t.source, "
        "CASE WHEN r = 0 THEN t.n_chars "
        "     ELSE t.n_chars + 4 + CAST(length(CAST(r AS VARCHAR)) AS BIGINT) "
        "END AS n_chars",
    )
    scale(
        "embeddings",
        "offs(t.vec_id, r) AS vec_id, "
        "CASE WHEN r = 0 THEN t.embedding ELSE "
        "list_transform(list_zip(t.embedding, "
        "  generate_series(1, len(t.embedding))), "
        "  z -> round(z[1] + r * 0.0003 * ((z[2] % 5) - 2), 4)) "
        "END AS embedding, "
        "offs(t.label, r) AS label",
    )
    scale(
        "events",
        "offs(t.event_id, r) AS event_id, t.ts, "
        "offs(t.user_id, r) AS user_id, t.event_type, t.value, t.props",
    )
    scale(
        "orders",
        "offs(t.o_orderkey, r) AS o_orderkey, "
        "offs(t.o_custkey, r) AS o_custkey, t.o_orderstatus, "
        "t.o_totalprice, t.o_orderdate, t.o_orderpriority",
    )
    scale(
        "customer",
        "offs(t.c_custkey, r) AS c_custkey, t.c_name, t.c_nationkey, "
        "t.c_acctbal, t.c_mktsegment",
    )
    scale(
        "supplier",
        "offs(t.s_suppkey, r) AS s_suppkey, t.s_name, t.s_nationkey, "
        "t.s_acctbal",
    )
    scale(
        "part",
        "offs(t.p_partkey, r) AS p_partkey, t.p_name, t.p_brand, "
        "t.p_type, t.p_size, t.p_retailprice",
    )
    scale(
        "lineitem",
        "offs(t.l_orderkey, r) AS l_orderkey, "
        "offs(t.l_partkey, r) AS l_partkey, "
        "offs(t.l_suppkey, r) AS l_suppkey, t.l_linenumber, t.l_quantity, "
        "t.l_extendedprice, t.l_discount, t.l_tax, t.l_returnflag, "
        "t.l_linestatus, t.l_shipdate",
    )
    for dim in ("region", "nation"):
        shutil.copy(f"{src}/{dim}.parquet", f"{dst}/{dim}.parquet")
        print(f"{dim}: copied")
    print(f"scaled x{k} -> {dst}")


if __name__ == "__main__":
    main()
