#!/usr/bin/env python3
"""Local t2 rehearsal (SURVEY.md §5.2-3): compare Verify output against
DuckDB running the paired oracle SQL on the same parquet tables.

Usage: python3 tools/oracle_check.py <verify_out_dir> <sf_dir> [--json out.json]

Mimics the driver: for each key in oracle_sql.json, load the Spark
result parquet, run the SQL in DuckDB, sort columns by name, normalize
types, sort rows, compare values exactly. Exit 1 on any mismatch.

--json writes a per-key artifact in the driver's CORRECTNESS_r{N}.json
shape (rows_match / schema_match / hash_match / spark_rows /
oracle_rows / err) so a non-driver sweep — e.g. the committed
CORRECTNESS_sf1.json produced by tools/check_correctness.sh — is
third-party diffable against driver output (VERDICT r8 #3).

NOT part of the engine — dev harness only (driver-side python env).
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import pyarrow.parquet as pq

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def dtype_class(s: pd.Series) -> str:
    """Coarse dtype class used for the STRICT pre-normalization check.

    The driver hashes raw values (int 1822 vs float 1822.0 differ), so
    the local harness must reject int-vs-float column mismatches BEFORE
    normalize() coerces them away — that masking is exactly how
    q_agg_cond_bool shipped red in round 1.
    """
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    if pd.api.types.is_datetime64_any_dtype(s):
        return "ts"
    if s.dtype == object:
        import datetime
        import decimal
        for v in s:
            if v is None:
                continue
            if isinstance(v, bool):
                return "bool"
            if isinstance(v, int):
                return "int"
            # Decimal classifies by DECLARED type, never by value: an
            # integral-valued Decimal masquerading as "int" is exactly the
            # data-dependent masking that hid a driver hash mismatch
            # (ADVICE r2) — a decimal column must be explicitly cast in
            # the oracle SQL, not silently reclassified here.
            if isinstance(v, decimal.Decimal):
                return "decimal"
            if isinstance(v, float):
                return "float"
            if isinstance(v, (datetime.date, datetime.datetime)):
                return "ts"
            return "str"
        return "str"
    return str(s.dtype)


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64").round(9)
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif pd.api.types.is_datetime64_any_dtype(s):
            # strip tz, truncate to us
            try:
                s = s.dt.tz_localize(None)
            except (TypeError, AttributeError):
                pass
            df[c] = s.astype("datetime64[us]")
        elif s.dtype == object:
            # duckdb hugeint arrives as object(int) or Decimal
            try:
                df[c] = s.astype("int64")
            except (ValueError, TypeError):
                df[c] = s.astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def connect(sf_dir):
    """Fresh DuckDB connection with the fixture views. Factored (r19)
    so the per-key loop can RESET after an exec error: a query that
    hits DuckDB's memory ceiling poisons the connection (subsequent
    queries fail on kilobyte allocations), which turned one heavy key
    into four FAILs in the sf10 sweep. temp_directory enables
    spill-to-disk for sort/window payloads before the ceiling."""
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    try:
        con.execute("SET temp_directory='/tmp/duckdb_spill'")
    except Exception:
        pass  # older duckdb: keep defaults
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if not os.path.exists(p):
            continue
        # GenData fixtures are Spark-written parquet DIRECTORIES;
        # driver fixtures are single files. Glob handles both.
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        if t == "events":
            # events.ts ships in THREE physical layouts (graft.Tables
            # scaladoc). Only ONE needs a view rewrite here:
            #  - native TIMESTAMP(NANOS) (early driver fixtures): DuckDB
            #    reads it directly and truncates to µs, agreeing with
            #    Tables.load — no rewrite.
            #  - raw int64 nanos (GenData fixtures; Spark cannot WRITE
            #    ns parquet): arrives as BIGINT — apply the SAME ns→µs
            #    truncation Tables.load performs (the rewrite below).
            #  - TIMESTAMP(MICROS) isAdjustedToUTC=false (driver r8+):
            #    DuckDB reads it natively as naive TIMESTAMP, which under
            #    the UTC session equals Spark's NTZ→TIMESTAMP cast — no
            #    rewrite needed (ADVICE r8: this case is deliberate, not
            #    an omission).
            ts_type = str(con.execute(
                f"SELECT typeof(ts) FROM read_parquet('{src}') LIMIT 1").fetchone()[0])
            if ts_type == "BIGINT":
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * REPLACE "
                    f"(make_timestamp(ts // 1000) AS ts) FROM read_parquet('{src}')")
                continue
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
    return con


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracle = json.load(f)
    con = connect(sf_dir)

    n_ok, fails = 0, []
    report = {}  # driver-shape per-key record (--json)

    def record(name, rows_match=False, schema_match=False, hash_match=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows_match, "schema_match": schema_match,
                        "hash_match": hash_match, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}

    for name in sorted(oracle):
        files = glob.glob(os.path.join(out_dir, name, "*.parquet"))
        if not files:
            fails.append((name, "no spark result parquet"))
            record(name, err="no spark result parquet")
            continue
        try:
            spark_df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                                 ignore_index=True)
            duck_df = con.execute(oracle[name]).fetchdf()
        except Exception as e:
            fails.append((name, f"exec error: {e}"))
            record(name, err=f"exec error: {e}"[:200])
            # reset the connection: an OOM'd query poisons DuckDB's
            # memory accounting and every later key would fail on
            # kilobyte allocations (r19 — seen in the sf10 sweep)
            try:
                con.close()
            except Exception:
                pass
            con = connect(sf_dir)
            continue
        nr_s, nr_d = len(spark_df), len(duck_df)
        rows_eq = nr_s == nr_d
        if sorted(spark_df.columns) != sorted(duck_df.columns):
            fails.append((name, f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}"))
            record(name, rows_match=rows_eq, spark_rows=nr_s, oracle_rows=nr_d)
            continue
        # Strict dtype-class check BEFORE normalization (driver hash semantics).
        dt_bad = [(c, dtype_class(spark_df[c]), dtype_class(duck_df[c]))
                  for c in sorted(spark_df.columns)
                  if dtype_class(spark_df[c]) != dtype_class(duck_df[c])]
        if dt_bad:
            fails.append((name, "dtype mismatch (driver hash would differ): " +
                          ", ".join(f"{c}: spark={a} duck={b}" for c, a, b in dt_bad)))
            record(name, rows_match=rows_eq, spark_rows=nr_s, oracle_rows=nr_d)
            continue
        if not rows_eq:
            fails.append((name, f"row count: spark={nr_s} duck={nr_d}"))
            record(name, schema_match=True, spark_rows=nr_s, oracle_rows=nr_d)
            continue
        a, b = normalize(spark_df), normalize(duck_df)
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
            n_ok += 1
            print(f"  OK    {name} ({len(a)} rows)")
            record(name, rows_match=True, schema_match=True, hash_match=True,
                   spark_rows=nr_s, oracle_rows=nr_d)
        except AssertionError as e:
            fails.append((name, f"values differ: {str(e).splitlines()[-1] if str(e) else e}"))
            record(name, rows_match=True, schema_match=True,
                   spark_rows=nr_s, oracle_rows=nr_d)

    print(f"\n{n_ok}/{len(oracle)} MATCH")
    for name, why in fails:
        print(f"  FAIL  {name}: {why}")
    if "--json" in sys.argv:
        path = sys.argv[sys.argv.index("--json") + 1]
        with open(path, "w") as f:
            json.dump(report, f, indent=2)
        print(f"wrote {path}")
    sys.exit(1 if fails else 0)


if __name__ == "__main__":
    main()
