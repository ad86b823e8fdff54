"""Local stand-in for the driver's correctness gate.

Runs every corpus query on Spark AND its DuckDB oracle at a given
sf dir, compares row count, sorted column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by
their canonical string form). Strict string equality on canonical
forms — if this passes, any reasonable driver comparison passes.

Additionally enforces a **pandas-dtype-drift gate**: a driver that
fetches the DuckDB result through pandas (``rel.df()``) silently
converts HUGEINT/DECIMAL columns to float64, so an oracle column like
``sum(bigint) OVER (...)`` renders as ``3.0`` while Spark renders
``3`` — rows and column names match but the value hash flips (this is
exactly how ``training_mix_pack`` went driver-red in round 3 while
passing fetchall-based local checks). We therefore map every oracle
output column's DuckDB type and the Spark schema type into render
classes and fail any query whose classes disagree, *before* the value
comparison can mask it.

Usage:  python tools/verify_local.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys
import time
import traceback

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def canon(v) -> str:
    """Dtype-faithful canonical form (matches the driver's strictness):
    floats do NOT collapse to ints (333.0 != 333 — a dtype mismatch the
    driver fails on), and list/tuple values are rejected loudly (the
    driver's pandas hasher dies on them: 'unhashable type: list')."""
    if v is None:
        return "∅"
    if isinstance(v, float):
        if v != v:  # NaN
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    if isinstance(v, (list, tuple)):
        raise TypeError(
            "list-typed output column — scalarize (array_join/explode); "
            "the driver's canonicalizer cannot hash lists"
        )
    return str(v)


def _duck_render_class(t: str) -> str:
    """How a pandas-based driver will RENDER values of this DuckDB
    type. HUGEINT and DECIMAL become float64 in ``rel.df()`` — the
    silent int→``3.0`` drift this gate exists to catch."""
    t = str(t).upper()
    if t.startswith("DECIMAL") or t in ("HUGEINT", "UHUGEINT", "FLOAT", "DOUBLE"):
        return "float"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER", "UBIGINT"):
        return "int"
    if t == "BOOLEAN":
        return "bool"
    if t == "VARCHAR":
        return "str"
    if t.startswith("TIMESTAMP"):
        return "ts"
    if t == "DATE":
        return "date"
    return f"other:{t}"


def _spark_render_class(dt) -> str:
    n = dt.simpleString()
    if n in ("tinyint", "smallint", "int", "bigint"):
        return "int"
    if n in ("float", "double") or n.startswith("decimal"):
        return "float"
    if n == "boolean":
        return "bool"
    if n == "string":
        return "str"
    if n.startswith("timestamp"):
        return "ts"
    if n == "date":
        return "date"
    return f"other:{n}"


def dtype_drift(sdf_schema, duck_cols: list[str], duck_types: list) -> list[str]:
    """Columns whose Spark vs pandas-fetched-DuckDB render classes
    disagree (empty list == no drift)."""
    spark_cls = {f.name: _spark_render_class(f.dataType) for f in sdf_schema.fields}
    bad = []
    for c, t in zip(duck_cols, duck_types):
        dc = _duck_render_class(t)
        sc = spark_cls.get(c)
        if sc is not None and sc != dc:
            bad.append(f"{c}: spark={sc} duck={t}->{dc}")
    return bad


def table_hash(rows: list[tuple], colnames: list[str]) -> str:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    lines = sorted("|".join(canon(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from auto_trade_data_pipeline_spark.corpus import load_all
    from auto_trade_data_pipeline_spark.session import get_spark

    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Mimic an untuned external driver: plain session, none of
        # session.py's configs. Queries must survive this (load_table
        # pins the tz/nanos conventions at read time).
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("verify_vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("verify_local")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    registry = load_all()
    names = [n for n in sorted(registry) if not only or n in only]
    failures, no_oracle = [], []
    for name in names:
        q = registry[name]
        t0 = time.time()
        try:
            sdf = q.fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            print(f"FAIL  {name}: spark side raised")
            traceback.print_exc()
            failures.append(name)
            continue
        if q.oracle is None:
            no_oracle.append(name)
            print(f"rows-only  {name}: {len(srows)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            rel = con.sql(q.oracle)
            ocols = rel.columns
            otypes = rel.types
            orows = rel.fetchall()
        except Exception:
            print(f"FAIL  {name}: oracle raised")
            traceback.print_exc()
            failures.append(name)
            continue
        drift = dtype_drift(sdf.schema, ocols, otypes)
        if drift:
            print(f"FAIL  {name}: pandas-dtype drift (driver would hash-mismatch)")
            for d in drift:
                print(f"    {d}")
            failures.append(name)
            continue
        ok_cols = sorted(scols) == sorted(ocols)
        ok_count = len(srows) == len(orows)
        sh = table_hash(srows, scols)
        oh = table_hash(orows, ocols)
        ok_hash = sh == oh
        status = "ok   " if (ok_cols and ok_count and ok_hash) else "FAIL "
        print(
            f"{status} {name}: rows {len(srows)}/{len(orows)} cols={'=' if ok_cols else scols} "
            f"hash {'=' if ok_hash else f'{sh}!={oh}'} ({time.time()-t0:.1f}s)"
        )
        if status.startswith("FAIL"):
            failures.append(name)
            if not ok_cols:
                print(f"    spark cols: {sorted(scols)}\n    duck  cols: {sorted(ocols)}")
            if ok_cols and not ok_hash:
                _diff(srows, scols, orows, ocols)
    print(f"\n{len(names) - len(failures)}/{len(names)} passed; {len(no_oracle)} rows-only")
    # Rows-only passes count as sweep evidence too (their check IS
    # "the Spark side ran"); the staleness bound ranges over all
    # queries since round 8.
    _record_sweep([n for n in names if n not in failures], sf_dir)
    return 1 if failures else 0


def _record_sweep(passed: list[str], sf_dir: str) -> None:
    """Append passing queries to SWEEP_MANIFEST.json — the recorded
    evidence trail tests/test_rotation.py's staleness bound reads.
    ``round`` = the round currently being built (driver rounds that
    already ran + 1)."""
    import glob as _glob
    import json as _json

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    building = len(_glob.glob(os.path.join(repo, "CORRECTNESS_r*.json"))) + 1
    path = os.path.join(repo, "SWEEP_MANIFEST.json")
    manifest = _json.load(open(path)) if os.path.exists(path) else {}
    for name in passed:
        prev = manifest.get(name, {})
        manifest[name] = {
            "round": max(building, int(prev.get("round", 0))),
            "sf_dir": sf_dir,
        }
    with open(path, "w") as f:
        _json.dump(manifest, f, indent=1, sort_keys=True)


def _diff(srows, scols, orows, ocols, limit: int = 5) -> None:
    so = sorted(range(len(scols)), key=lambda i: scols[i])
    oo = sorted(range(len(ocols)), key=lambda i: ocols[i])
    sset = {"|".join(canon(r[i]) for i in so) for r in srows}
    oset = {"|".join(canon(r[i]) for i in oo) for r in orows}
    print(f"    cols: {sorted(scols)}")
    for ln in list(sorted(sset - oset))[:limit]:
        print(f"    spark-only: {ln}")
    for ln in list(sorted(oset - sset))[:limit]:
        print(f"    duck-only : {ln}")


if __name__ == "__main__":
    sys.exit(main())
