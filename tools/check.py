#!/usr/bin/env python3
"""Local replay of the driver's correctness gate.

Usage:
    python tools/check.py /tmp/verify_out [sf_dir] [--tolerant]

Expects `sbt "runMain graft.Verify <sf_dir> <out_dir>"` to have populated
<out_dir> with one parquet dir per query + oracle_sql.json. Runs each
oracle SQL in DuckDB (tables = views over the sf_dir parquet files) and
compares: columns sorted by name, rows sorted, values compared EXACTLY —
floats included — mirroring the driver's hash compare. (Round 7 shipped a
driver-red f_te behind a local green precisely because this gate used to
accept 1e-9 relative float error; exact is the default now.) Pass
`--tolerant` to restore the 1e-9 relative tolerance when triaging WHERE a
float chain drifts, never to declare a query green.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TOLERANT = False


def norm_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, spark_rows, spark_cols, oracle_rows, oracle_cols):
    if [c.lower() for c in spark_cols] != [c.lower() for c in oracle_cols]:
        return f"SCHEMA MISMATCH: spark={spark_cols} oracle={oracle_cols}"
    if len(spark_rows) != len(oracle_rows):
        return f"ROWCOUNT MISMATCH: spark={len(spark_rows)} oracle={len(oracle_rows)}"
    mismatches = 0
    first = None
    for i, (a, b) in enumerate(zip(spark_rows, oracle_rows)):
        for j, (x, y) in enumerate(zip(a, b)):
            x, y = norm_cell(x), norm_cell(y)
            if x is None and y is None:
                continue
            if isinstance(x, float) and isinstance(y, float):
                if x == y:
                    continue
                if TOLERANT and abs(x - y) <= 1e-9 * max(1.0, abs(x), abs(y)):
                    continue
                mismatches += 1
            elif str(x) != str(y):
                mismatches += 1
            if mismatches and first is None:
                first = f"row {i} col {spark_cols[j]}: spark={x!r} oracle={y!r}"
    if mismatches:
        return f"{mismatches} VALUE MISMATCHES; first: {first}"
    return None


_TYPE_FAMILY = {
    "TINYINT": "int", "SMALLINT": "int", "INTEGER": "int", "BIGINT": "int",
    "FLOAT": "float", "DOUBLE": "float",
}


def _types_compatible(spark_t, oracle_t):
    """Same type, or both in the int/float family at <= 64 bits.

    HUGEINT / DECIMAL on the oracle side are NOT compatible with Spark's
    int64/double — that width difference is exactly what the driver's
    hash compare catches and str-compare misses.
    """
    if spark_t == oracle_t:
        return True
    return _TYPE_FAMILY.get(spark_t) is not None and \
        _TYPE_FAMILY.get(spark_t) == _TYPE_FAMILY.get(oracle_t)


def main():
    global TOLERANT
    args = [a for a in sys.argv[1:] if a != "--tolerant"]
    TOLERANT = "--tolerant" in sys.argv[1:]
    if TOLERANT:
        print("WARNING: --tolerant (1e-9 rel float) — the driver compares "
              "exactly; this mode is for triage, not for declaring green")
    out_dir = Path(args[0])
    sf_dir = Path(args[1] if len(args) > 1 else "/root/testdata/sf0.01")

    con = duckdb.connect()
    for p in sf_dir.glob("*.parquet"):
        con.execute(f"CREATE VIEW {p.stem} AS SELECT * FROM '{p}'")

    oracles = json.loads((out_dir / "oracle_sql.json").read_text())
    failures = 0
    for name, sql in sorted(oracles.items()):
        qdir = out_dir / name
        if not qdir.exists():
            print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            spark_rel = con.sql(f"SELECT * FROM '{qdir}/*.parquet'")
            spark_cols = sorted(spark_rel.columns)
            order = ", ".join(f'"{c}"' for c in spark_cols)
            spark_rows = con.sql(
                f"SELECT {order} FROM '{qdir}/*.parquet' ORDER BY {order}"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: cannot read spark output: {e}")
            failures += 1
            continue
        try:
            orel = con.sql(sql)
            ocols = sorted(orel.columns)
            oorder = ", ".join(f'"{c}"' for c in ocols)
            oracle_rows = con.sql(
                f"SELECT {oorder} FROM ({sql}) ORDER BY {oorder}"
            ).fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        # Type parity: the driver hashes typed values, so DuckDB HUGEINT
        # (sum of INTEGER) vs Spark BIGINT fails even when str() matches.
        stypes = dict(zip(spark_rel.columns, (str(t) for t in spark_rel.types)))
        otypes = dict(zip(orel.columns, (str(t) for t in orel.types)))
        type_errs = [
            f"{c}: spark={stypes[c]} oracle={otypes[c]}"
            for c in spark_cols
            if c in otypes and not _types_compatible(stypes[c], otypes[c])
        ]
        if type_errs:
            print(f"FAIL {name}: TYPE MISMATCH: {'; '.join(type_errs)}")
            failures += 1
            continue
        err = compare(name, spark_rows, spark_cols, oracle_rows, ocols)
        if err:
            print(f"FAIL {name}: {err}")
            failures += 1
        else:
            print(f"PASS {name} ({len(spark_rows)} rows)")

    # A query whose dump failed leaves NO dir — a dirs-only scan would
    # silently skip it (ml_kmeans once passed this gate while crashing in
    # Verify). The manifest closes that hole.
    manifest_path = out_dir / "queries.json"
    if manifest_path.exists():
        expected = set(json.loads(manifest_path.read_text()))
        present = {d.name for d in out_dir.iterdir() if d.is_dir()}
        for name in sorted(expected - present):
            print(f"FAIL {name}: listed in manifest but produced no output")
            failures += 1
    else:
        # A missing manifest is the silent-skip failure mode this gate
        # exists to close (stale out_dir from an older Verify) — fail.
        print(f"FAIL: no queries.json manifest in {out_dir} — "
              "rerun graft.Verify; refusing to trust a dirs-only scan")
        failures += 1

    extra = [d.name for d in out_dir.iterdir()
             if d.is_dir() and d.name not in oracles]
    for name in extra:
        try:
            n = con.sql(f"SELECT count(*) FROM '{out_dir / name}/*.parquet'").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows {'OK' if n > 0 else 'EMPTY!'}")
            if n == 0:
                failures += 1
        except Exception as e:
            print(f"FAIL {name} (rows-only): {e}")
            failures += 1

    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
