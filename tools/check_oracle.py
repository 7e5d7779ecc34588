"""Local replica of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry at sf0.01 and compares
it against ``oracle_sql()`` via DuckDB: row count, column names, and an
order-insensitive value comparison (sorted rows, float-tolerant).

Usage: python tools/check_oracle.py [name ...]
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
# thread the gated corpus into oracle generators that train on data
# (_ann_ivf_oracle): the oracle must see the SAME corpus the views
# register, or its centroid literals silently diverge (ADVICE r04)
os.environ.setdefault("SPARK_GRAFT_ORACLE_SF_DIR", SF_DIR)
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # exact repr — the driver's gate hashes exact values, so the
        # local replica must be bit-strict too (6g hid ULP-level bugs)
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _duck_arrow_types(rel):
    """Column → arrow type for the DuckDB result (driver hashes include
    types: DuckDB SUM(int)=HUGEINT vs Spark BIGINT was a round-1 fail)."""
    t = rel.fetch_arrow_table()
    return {f.name: str(f.type) for f in t.schema}, t


def _spark_arrow_types(sdf):
    import pyarrow as pa

    batches = sdf._collect_as_arrow() if hasattr(sdf, "_collect_as_arrow") else None
    if batches:
        schema = pa.Table.from_batches(batches).schema
        return {f.name: str(f.type) for f in schema}
    return {}


def _norm_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_norm_cell(r[i]) for i in idx) for r in rows]
    out.sort()
    return [cols[i] for i in idx], out


def main(names: list[str] | None = None) -> int:
    import duckdb

    import __spark_entry__ as entrymod
    from turboxsl_spark.session import get_spark

    spark = get_spark("oracle-check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    all_names = list(qs)
    names = names or all_names
    failures = 0
    for name in names:
        # the driver's correctness gate records only the FIRST 50
        # queries() entries (discovered r04) — surface the cutoff so
        # nobody mistakes a local-replica OK for a driver attestation
        if len(all_names) > 50 and name == all_names[50] and names is all_names:
            print("---- driver gate cutoff: entries below are NOT in "
                  "CORRECTNESS_r*.json this round (rotate next round) ----")
        fn = qs[name]
        sdf = fn(spark, SF_DIR)
        scols = sdf.columns
        srows = [tuple(r) for r in sdf.collect()]
        if name not in oracles:
            print(f"{name}: rows-only ({len(srows)} rows) — no oracle")
            continue
        rel = con.sql(oracles[name])
        dcols = rel.columns
        drows = rel.fetchall()
        sc, sn = _norm_rows(scols, srows)
        dc, dn = _norm_rows(dcols, drows)
        ok = True
        if sc != dc:
            print(f"{name}: COLUMN MISMATCH spark={sc} duck={dc}")
            ok = False
        # dtype parity (HUGEINT vs BIGINT etc. fails the driver's hash)
        dtypes, _ = _duck_arrow_types(con.sql(oracles[name]))
        stypes = _spark_arrow_types(sdf)
        for col in set(dtypes) & set(stypes):
            a, b = stypes[col], dtypes[col]
            if a != b and not (
                a.startswith("timestamp") and b.startswith("timestamp")
            ):
                print(f"{name}: DTYPE MISMATCH {col}: spark={a} duck={b}")
                ok = False
        if len(sn) != len(dn):
            print(f"{name}: ROWCOUNT MISMATCH spark={len(sn)} duck={len(dn)}")
            ok = False
        if ok and sn != dn:
            diff = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
            print(f"{name}: VALUE MISMATCH, first diffs: {diff}")
            ok = False
        if ok:
            print(f"{name}: OK ({len(sn)} rows)")
        else:
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:] or None))
