#!/usr/bin/env python3
"""Independent sf10 verifier for q_pipeline_curate (r14).

The declared oracle's recursive reach() CTE is a transitive closure —
at sf10 the near-dup graph has a giant component, making the closure
O(|comp|^2) rows (the q_dedup_clusters intractability, same cause).
This verifier replaces ONLY the closure with a python union-find over
the SAME candidate pair set (the established sf10 pattern for
clusters/keep); every other stage runs the oracle's own SQL in DuckDB.

Usage:
  python3 tools/verify_pipeline_sf10.py <spark_result_dir> <sf_dir>

<spark_result_dir> is Verify's q_pipeline_curate output dir (parquet).
Prints the funnel comparison and exits nonzero on mismatch; on match,
prints the artifact row JSON (with the method field) to stdout.

NOT part of the engine — dev harness only (driver-side python env).
"""
import sys, json, glob
import duckdb
import pandas as pd

# keep in sync with DedupOps.MaxBandBucket (and OracleSqlPipe's
# interpolated cap CTEs) — the engine and main oracle move together
# via the Scala constant; this standalone verifier cannot
MAX_BAND_BUCKET = 500

def main():
    spark_dir, sf_dir = sys.argv[1], sys.argv[2]
    cap = MAX_BAND_BUCKET
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')")

    # stages 1-2: the oracle's own CTEs, materialized as tables
    con.execute("""
      CREATE TABLE d0 AS SELECT doc_id, text, lang FROM documents WHERE doc_id >= 5""")
    con.execute("""
      CREATE TABLE s1 AS
      WITH x AS (SELECT doc_id, string_split(text,' ') AS t FROM d0),
      rep AS (SELECT doc_id, len(t) AS n_tok,
          list_max(list_transform(list_distinct(t),
                                  u -> len(list_filter(t, w -> w = u)))) AS top1,
          greatest(len(t)-2, 0) AS tri_tot,
          CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(
            range(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))))
            ELSE 0 END AS tri_dis
        FROM x)
      SELECT d.* FROM d0 d JOIN rep USING (doc_id)
      WHERE NOT (top1 * 5 > n_tok OR (tri_tot - tri_dis) * 10 > tri_tot * 3)""")
    con.execute("""
      CREATE TABLE s2 AS
      WITH nrm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
                replace(lower(nfc_normalize(text)), 'é', 'e'),
                '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM s1),
      keepid AS (SELECT min(doc_id) AS doc_id FROM nrm GROUP BY norm)
      SELECT d.* FROM s1 d JOIN keepid USING (doc_id)""")

    # stage 3 candidates: the oracle's band joins (id pairs only),
    # then union-find instead of the recursive closure
    pairs = con.execute(f"""
      WITH sh2 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
              i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
              FROM (SELECT doc_id, string_split(text,' ') AS t FROM s2) t2),
      hs2 AS (SELECT doc_id,
                CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT) AS h
              FROM (SELECT doc_id, unnest(shingles) AS s FROM sh2) y),
      mh2 AS (SELECT doc_id,
          min((1*h+7) % 2147483647) AS mh1, min((3*h+11) % 2147483647) AS mh2,
          min((5*h+13) % 2147483647) AS mh3, min((7*h+17) % 2147483647) AS mh4
        FROM hs2 GROUP BY doc_id),
      big1 AS (SELECT mh1, mh2 FROM mh2 GROUP BY mh1, mh2
               HAVING count(*) > {cap}),
      big2 AS (SELECT mh3, mh4 FROM mh2 GROUP BY mh3, mh4
               HAVING count(*) > {cap}),
      cand AS (SELECT DISTINCT doc_a, doc_b FROM (
          SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
          FROM mh2 a JOIN mh2 b ON a.mh1 = b.mh1 AND a.mh2 = b.mh2
                               AND a.doc_id < b.doc_id
          WHERE NOT EXISTS (SELECT 1 FROM big1 g
                            WHERE g.mh1 = a.mh1 AND g.mh2 = a.mh2)
          UNION ALL
          SELECT a.doc_id, b.doc_id
          FROM mh2 a JOIN mh2 b ON a.mh3 = b.mh3 AND a.mh4 = b.mh4
                               AND a.doc_id < b.doc_id
          WHERE NOT EXISTS (SELECT 1 FROM big2 g
                            WHERE g.mh3 = a.mh3 AND g.mh4 = a.mh4)) u)
      SELECT c.doc_a, c.doc_b
      FROM cand c JOIN mh2 a ON a.doc_id = c.doc_a
                  JOIN mh2 b ON b.doc_id = c.doc_b
      WHERE (CASE WHEN a.mh1=b.mh1 THEN 1 ELSE 0 END)
          + (CASE WHEN a.mh2=b.mh2 THEN 1 ELSE 0 END)
          + (CASE WHEN a.mh3=b.mh3 THEN 1 ELSE 0 END)
          + (CASE WHEN a.mh4=b.mh4 THEN 1 ELSE 0 END) >= 2""").fetchall()

    parent = {}
    def find(x):
        r = x
        while parent.get(r, r) != r:
            r = parent[r]
        while parent.get(x, x) != x:
            parent[x], x = r, parent[x]
        return r
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            # min-id root, matching the oracle's min(b) component label
            if ra < rb: parent[rb] = ra
            else:       parent[ra] = rb
    losers = sorted(x for x in set(p for ab in pairs for p in ab) if find(x) != x)
    con.execute("CREATE TABLE losers (doc_id BIGINT)")
    if losers:
        con.executemany("INSERT INTO losers VALUES (?)", [(x,) for x in losers])
    con.execute("""
      CREATE TABLE s3 AS SELECT d.* FROM s2 d
      WHERE NOT EXISTS (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)""")

    # stages 4-5: the oracle's own SQL over s3
    con.execute("""
      CREATE TABLE s4 AS
      WITH bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 5),
      bg AS (SELECT DISTINCT gram FROM (
          SELECT unnest(list_transform(range(1, len(t)-1),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram
          FROM (SELECT string_split(text,' ') AS t FROM bench) z) zz),
      dirty AS (SELECT DISTINCT doc_id FROM (
          SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
            i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram
          FROM (SELECT doc_id, string_split(text,' ') AS t FROM s3) z3) g3
        JOIN bg USING (gram))
      SELECT d.* FROM s3 d
      WHERE NOT EXISTS (SELECT 1 FROM dirty v WHERE v.doc_id = d.doc_id)""")
    con.execute("""
      CREATE TABLE s5 AS
      WITH cnt AS (SELECT lang, count(*) AS cnt FROM s4 GROUP BY lang)
      SELECT d.* FROM s4 d JOIN cnt USING (lang)
      WHERE (CAST(concat('0x', substring(md5(text),1,4)) AS BIGINT)
             % 10000) * cnt < 200000""")

    names = ["input", "quality_gate", "exact_dedup", "near_dedup",
             "decontaminate", "stratum_cap"]
    oracle = []
    for i, (name, tbl) in enumerate(zip(names, ["d0","s1","s2","s3","s4","s5"])):
        n, s = con.execute(
            f"SELECT CAST(count(*) AS BIGINT), CAST(coalesce(sum(doc_id),0) AS BIGINT) FROM {tbl}"
        ).fetchone()
        oracle.append((i, name, int(n), int(s)))

    files = glob.glob(f"{spark_dir}/*.parquet")
    spark = pd.read_parquet(files[0] if len(files) == 1 else spark_dir)
    got = [(int(r.stage_no), r.stage, int(r.rows_out), int(r.id_sum))
           for r in spark.sort_values("stage_no").itertuples()]

    ok = got == oracle
    for g, o in zip(got, oracle):
        mark = "OK " if g == o else "DIFF"
        print(f"  {mark} spark={g} oracle={o}", file=sys.stderr)
    row = {"rows_match": ok, "schema_match": True, "hash_match": ok,
           "spark_rows": len(got), "oracle_rows": len(oracle), "err": None,
           "method": ("oracle SQL per stage + python union-find over the "
                      f"{len(pairs):,}-pair stage-3 candidate set (recursive "
                      "closure intractable at sf10, the q_dedup_clusters "
                      "precedent); funnel compared value-for-value incl. id_sum")}
    print(json.dumps({"q_pipeline_curate": row}, indent=1))
    sys.exit(0 if ok else 1)

if __name__ == "__main__":
    main()
