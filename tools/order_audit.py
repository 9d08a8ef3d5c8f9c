#!/usr/bin/env python3
"""Accumulation-order audit: prove every compared output is
parallelism-invariant.

A float chain that survives the DuckDB oracle at ONE partitioning can
still drift at another (Spark's partial aggregation folds in partition
order): that lottery is exactly how round 7's `f_te` went driver-red
after two green rounds. This audit makes the property measurable:

    SPARK_GRAFT_CPUS=3  sbt "runMain graft.Verify <sf_dir> /tmp/oa_a"
    SPARK_GRAFT_CPUS=16 sbt "runMain graft.Verify <sf_dir> /tmp/oa_b"
    python tools/order_audit.py /tmp/oa_a /tmp/oa_b

Every query's parquet dump is exact-diffed (EXCEPT ALL both ways, all
columns) between the two runs. Expected output: only `ml_*` queries
differ — spark.ml training is inherently partition-order-sensitive
(tree split-candidate binning, L-BFGS partial gradients) and that whole
surface is rows-only by design. Any NON-ml query in the diff is a
regression against the bit-exact float policy (SURVEY.md §2): fix the
chain (scaled-integer sums / graft_ln / 6-dp round), don't widen the
allowlist.

Round-8 baseline: 163 queries compared, all 142 SQL-oracle queries +
the non-ml rows-only queries bit-identical at cpus=3 vs cpus=16; the
10 ml_* fits differ (documented inherent).
"""
import os
import sys

import duckdb


def main():
    a_dir, b_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    qs = sorted(d for d in os.listdir(a_dir) if os.path.isdir(f"{a_dir}/{d}"))
    diff, errs = [], 0
    for q in qs:
        if not os.path.isdir(f"{b_dir}/{q}"):
            print(f"FAIL {q}: missing in {b_dir}")
            errs += 1
            continue
        try:
            cols = con.sql(f"SELECT * FROM '{a_dir}/{q}/*.parquet' LIMIT 0").columns
            order = ", ".join(f'"{c}"' for c in sorted(cols))
            n = con.sql(f"""
              SELECT count(*) FROM (
                (SELECT {order} FROM '{a_dir}/{q}/*.parquet'
                 EXCEPT ALL SELECT {order} FROM '{b_dir}/{q}/*.parquet')
                UNION ALL
                (SELECT {order} FROM '{b_dir}/{q}/*.parquet'
                 EXCEPT ALL SELECT {order} FROM '{a_dir}/{q}/*.parquet')
              )""").fetchone()[0]
            if n:
                diff.append((q, n))
        except Exception as e:  # noqa: BLE001 - report and count any read failure
            print(f"FAIL {q}: {str(e)[:120]}")
            errs += 1
    print(f"compared: {len(qs)} queries")
    bad = [(q, n) for q, n in diff if not q.startswith("ml_")]
    ml = [(q, n) for q, n in diff if q.startswith("ml_")]
    if ml:
        print(f"ml_* (inherent, rows-only by design): {ml}")
    if bad:
        print(f"ORDER-SENSITIVE NON-ML (policy violation): {bad}")
    if not diff:
        print("all outputs parallelism-invariant")
    print("AUDIT " + ("FAIL" if (bad or errs) else "PASS"))
    sys.exit(1 if (bad or errs) else 0)


if __name__ == "__main__":
    main()
