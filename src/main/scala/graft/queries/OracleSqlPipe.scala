package graft.queries

/** DuckDB oracle SQL for the round-7 pipeline keys (URL parsing,
  * bloom decontamination, unigram-LM scoring). Same dialect-seam
  * rules as OracleSql (§2.2).
  */
object OracleSqlPipe {

  val all: Map[String, String] = Map(
    // DuckDB has no parse_url — the oracle rebuilds the synthesized
    // URL and extracts each component with an anchored regex. The
    // components are exact because the URL grammar here is fixed.
    "q_fn_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         concat('https://', source, '.example.org/docs/', doc_id,
        |                '?lang=', lang, '&ref=graft#s', doc_id % 7) AS url
        |  FROM documents)
        |SELECT doc_id, url,
        |       regexp_extract(url, '^([a-z]+)://', 1) AS proto,
        |       regexp_extract(url, '://([^/]+)/', 1) AS host,
        |       regexp_extract(url, '://[^/]+(/[^?#]*)', 1) AS path,
        |       regexp_extract(url, '\?([^#]*)', 1) AS query,
        |       regexp_extract(url, '#(.*)$', 1) AS anchor,
        |       regexp_extract(url, '[?&]lang=([^&#]*)', 1) AS q_lang
        |FROM u ORDER BY doc_id LIMIT 300""".stripMargin,

    // The bloom prefilter is engine-internal and one-sided (no false
    // negatives; FPs are killed by the exact confirm join), so the
    // oracle is the plain exact semi-join the key's answer equals.
    "q_decontam_bloom" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gs
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
        |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |bench AS (SELECT DISTINCT gram FROM e WHERE doc_id < 5)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM e JOIN bench USING (gram) WHERE doc_id >= 5
        |GROUP BY doc_id ORDER BY n_shared DESC, doc_id""".stripMargin,

    // The COMPOSED curation funnel (r14; stage 3 CAP-AWARE since r15):
    // the five stage CTE chains — each the SQL vocabulary of its
    // standalone key (q_text_repetition verdict, q_text_normalize
    // chain, the q_dedup_clusters CAPPED band-join ∪-distinct +
    // recursive reach() components — big1/big2 HAVING + NOT EXISTS
    // mirror OracleSqlLlm.mhPairCtes, because the pipeline's
    // lshCandidates now routes through the one MaxBandBucket pair
    // engine — q_decontam_bloom's exact semi-join,
    // q_sample_stratified's integer keep rule) — applied over the
    // SURVIVOR frame of the previous stage, with one (rows, id_sum)
    // aggregate per stage. cand's body is a subquery union (NOT a
    // top-level UNION CTE — the WITH RECURSIVE anchor/step trap, r12);
    // jacc_est >= 0.5 is spelled as the integer match-count >= 2.
    "q_pipeline_curate" ->
      s"""WITH RECURSIVE
        |d0 AS (SELECT doc_id, text, lang FROM documents WHERE doc_id >= 5),
        |bench AS (SELECT doc_id, text FROM documents WHERE doc_id < 5),
        |x AS (SELECT doc_id, string_split(text,' ') AS t FROM d0),
        |rep AS (SELECT doc_id, len(t) AS n_tok,
        |    list_max(list_transform(list_distinct(t),
        |                            u -> len(list_filter(t, w -> w = u)))) AS top1,
        |    greatest(len(t)-2, 0) AS tri_tot,
        |    CASE WHEN len(t) >= 3 THEN len(list_distinct(list_transform(
        |      range(1, len(t)-1), i -> concat_ws(' ', t[i], t[i+1], t[i+2]))))
        |      ELSE 0 END AS tri_dis
        |  FROM x),
        |s1 AS (SELECT d.* FROM d0 d JOIN rep USING (doc_id)
        |       WHERE NOT (top1 * 5 > n_tok
        |                  OR (tri_tot - tri_dis) * 10 > tri_tot * 3)),
        |nrm AS (SELECT doc_id, trim(regexp_replace(regexp_replace(
        |          replace(lower(nfc_normalize(text)), 'é', 'e'),
        |          '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS norm FROM s1),
        |keepid AS (SELECT min(doc_id) AS doc_id FROM nrm GROUP BY norm),
        |s2 AS (SELECT d.* FROM s1 d JOIN keepid USING (doc_id)),
        |sh2 AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |        i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS shingles
        |        FROM (SELECT doc_id, string_split(text,' ') AS t FROM s2) t2),
        |hs2 AS (SELECT doc_id,
        |          CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT) AS h
        |        FROM (SELECT doc_id, unnest(shingles) AS s FROM sh2) y),
        |mh2 AS (SELECT doc_id,
        |    min((1*h+7) % 2147483647) AS mh1, min((3*h+11) % 2147483647) AS mh2,
        |    min((5*h+13) % 2147483647) AS mh3, min((7*h+17) % 2147483647) AS mh4
        |  FROM hs2 GROUP BY doc_id),
        |big1 AS (SELECT mh1, mh2 FROM mh2 GROUP BY mh1, mh2
        |         HAVING count(*) > ${DedupOps.MaxBandBucket}),
        |big2 AS (SELECT mh3, mh4 FROM mh2 GROUP BY mh3, mh4
        |         HAVING count(*) > ${DedupOps.MaxBandBucket}),
        |cand AS (SELECT DISTINCT doc_a, doc_b FROM (
        |    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
        |    FROM mh2 a JOIN mh2 b ON a.mh1 = b.mh1 AND a.mh2 = b.mh2
        |                         AND a.doc_id < b.doc_id
        |    WHERE NOT EXISTS (SELECT 1 FROM big1 g
        |                      WHERE g.mh1 = a.mh1 AND g.mh2 = a.mh2)
        |    UNION ALL
        |    SELECT a.doc_id, b.doc_id
        |    FROM mh2 a JOIN mh2 b ON a.mh3 = b.mh3 AND a.mh4 = b.mh4
        |                         AND a.doc_id < b.doc_id
        |    WHERE NOT EXISTS (SELECT 1 FROM big2 g
        |                      WHERE g.mh3 = a.mh3 AND g.mh4 = a.mh4)) u),
        |pr AS (SELECT c.doc_a, c.doc_b
        |  FROM cand c JOIN mh2 a ON a.doc_id = c.doc_a
        |              JOIN mh2 b ON b.doc_id = c.doc_b
        |  WHERE (CASE WHEN a.mh1=b.mh1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.mh2=b.mh2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.mh3=b.mh3 THEN 1 ELSE 0 END)
        |      + (CASE WHEN a.mh4=b.mh4 THEN 1 ELSE 0 END) >= 2),
        |edges AS (SELECT doc_a AS src, doc_b AS dst FROM pr
        |          UNION ALL SELECT doc_b, doc_a FROM pr),
        |nodes AS (SELECT DISTINCT src AS id FROM edges),
        |reach(a, b) AS (
        |  SELECT id, id FROM nodes
        |  UNION
        |  SELECT reach.a, e.dst FROM reach JOIN edges e ON reach.b = e.src),
        |cl AS (SELECT a AS doc_id, min(b) AS cluster FROM reach GROUP BY a),
        |losers AS (SELECT doc_id FROM cl WHERE doc_id <> cluster),
        |s3 AS (SELECT d.* FROM s2 d WHERE NOT EXISTS
        |       (SELECT 1 FROM losers l WHERE l.doc_id = d.doc_id)),
        |bg AS (SELECT DISTINCT gram FROM (
        |    SELECT unnest(list_transform(range(1, len(t)-1),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram
        |    FROM (SELECT string_split(text,' ') AS t FROM bench) z) zz),
        |dirty AS (SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(list_transform(range(1, len(t)-1),
        |      i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gram
        |    FROM (SELECT doc_id, string_split(text,' ') AS t FROM s3) z3) g3
        |  JOIN bg USING (gram)),
        |s4 AS (SELECT d.* FROM s3 d WHERE NOT EXISTS
        |       (SELECT 1 FROM dirty v WHERE v.doc_id = d.doc_id)),
        |cnt AS (SELECT lang, count(*) AS cnt FROM s4 GROUP BY lang),
        |s5 AS (SELECT d.* FROM s4 d JOIN cnt USING (lang)
        |       WHERE (CAST(concat('0x', substring(md5(text),1,4)) AS BIGINT)
        |              % 10000) * cnt < 200000)
        |SELECT 0 AS stage_no, 'input' AS stage,
        |  CAST(count(*) AS BIGINT) AS rows_out,
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) AS id_sum FROM d0
        |UNION ALL SELECT 1, 'quality_gate', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s1
        |UNION ALL SELECT 2, 'exact_dedup', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s2
        |UNION ALL SELECT 3, 'near_dedup', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s3
        |UNION ALL SELECT 4, 'decontaminate', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s4
        |UNION ALL SELECT 5, 'stratum_cap', CAST(count(*) AS BIGINT),
        |  CAST(coalesce(sum(doc_id), 0) AS BIGINT) FROM s5
        |ORDER BY stage_no""".stripMargin,

    // stream-static enrichment replayed bounded must equal the batch
    // join+agg (stateless join: no watermark/eviction to reason about)
    "q_stream_enrich" ->
      """SELECT c_mktsegment, event_type, count(*) AS n,
        |       round(CAST(sum(value) AS DOUBLE), 2) AS sv
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    // the engine's O(iters) PageRank rounds, unrolled: each pN CTE is
    // one iteration with the same 6 dp re-rounding the engine applies
    "q_graph_pagerank" ->
      """WITH d AS (SELECT doc_id, lower(substring(text,1,60)) AS k FROM documents),
        |pairs AS (SELECT a.doc_id AS s, b.doc_id AS t
        |          FROM d a JOIN d b ON a.k = b.k AND a.doc_id < b.doc_id),
        |e AS (SELECT s AS src, t AS dst FROM pairs
        |      UNION ALL SELECT t, s FROM pairs),
        |deg AS (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
        |        FROM e GROUP BY 1),
        |p0 AS (SELECT node, deg, CAST(1.0 AS DOUBLE) AS pr FROM deg),
        |p1 AS (SELECT d.node, d.deg,
        |              round(0.15 + 0.85 * coalesce(c.inflow, 0), 6) AS pr
        |       FROM deg d LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / p.deg) AS inflow
        |         FROM e JOIN p0 p ON e.src = p.node GROUP BY 1) c USING (node)),
        |p2 AS (SELECT d.node, d.deg,
        |              round(0.15 + 0.85 * coalesce(c.inflow, 0), 6) AS pr
        |       FROM deg d LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / p.deg) AS inflow
        |         FROM e JOIN p1 p ON e.src = p.node GROUP BY 1) c USING (node)),
        |p3 AS (SELECT d.node, d.deg,
        |              round(0.15 + 0.85 * coalesce(c.inflow, 0), 6) AS pr
        |       FROM deg d LEFT JOIN (
        |         SELECT e.dst AS node, sum(p.pr / p.deg) AS inflow
        |         FROM e JOIN p2 p ON e.src = p.node GROUP BY 1) c USING (node))
        |SELECT node, deg, round(pr, 4) AS pr FROM p3
        |ORDER BY pr DESC, node LIMIT 100""".stripMargin,

    // the Spark side builds a PNG header per doc and parses it back
    // with binary expressions; the oracle recomputes the fields from
    // the same doc_id arithmetic — any build/parse byte slip mismatches
    "q_media_meta" ->
      """SELECT doc_id, TRUE AS is_png,
        |       CAST(16 + doc_id % 1024 AS BIGINT) AS width,
        |       CAST(16 + (doc_id * 7) % 768 AS BIGINT) AS height,
        |       CAST(8 AS INTEGER) AS bit_depth,
        |       CAST(6 AS INTEGER) AS color_type,
        |       CAST(29 AS INTEGER) AS n_bytes
        |FROM documents ORDER BY doc_id LIMIT 300""".stripMargin,

    // the streaming replay must equal the batch bloom decontamination
    "q_stream_decontam" ->
      """WITH g AS (
        |  SELECT doc_id, list_distinct(list_transform(range(1, len(t)-1),
        |         i -> concat_ws(' ', t[i], t[i+1], t[i+2]))) AS gs
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
        |e AS (SELECT doc_id, unnest(gs) AS gram FROM g),
        |bench AS (SELECT DISTINCT gram FROM e WHERE doc_id < 5)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
        |FROM e JOIN bench USING (gram) WHERE doc_id >= 5
        |GROUP BY doc_id ORDER BY n_shared DESC, doc_id""".stripMargin,

    // identical regex canonicalization on both engines (single-match
    // patterns, so DuckDB's replace-first == Spark's replace-all)
    "q_dedup_url" ->
      """WITH u AS (
        |  SELECT doc_id,
        |         concat('https://', source, '.example.org/page/', doc_id % 50,
        |                '?lang=', lang, '&ref=track', doc_id % 7, '#s', doc_id) AS url
        |  FROM documents),
        |c AS (SELECT doc_id,
        |             regexp_replace(regexp_replace(url, '#.*$', ''),
        |                            '&ref=[^&#]*', '') AS canonical
        |      FROM u)
        |SELECT canonical, CAST(count(*) AS BIGINT) AS n_fetches,
        |       min(doc_id) AS first_doc
        |FROM c GROUP BY canonical
        |ORDER BY n_fetches DESC, canonical LIMIT 300""".stripMargin,

    // asymmetric containment with rare-gram blocking; keep rule is the
    // exact integer cross-product, only the reported ratio divides.
    // r13: grams fold as distinct md5-32 hashes (WordShingleHashes) —
    // hash the per-doc DISTINCT gram strings, then list_distinct the
    // hash VALUES so a within-doc 32-bit collision collapses
    // identically on both engines
    "q_dedup_containment" ->
      """WITH g AS (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |         list_distinct(list_transform(range(1, len(t)-1),
        |           i -> concat_ws(' ', t[i], t[i+1], t[i+2]))),
        |         s -> CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT)))) AS gram
        |  FROM (SELECT doc_id, string_split(text,' ') AS t FROM documents) x),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM g GROUP BY 1),
        |rare AS (SELECT gram FROM g GROUP BY gram HAVING count(*) <= 5),
        |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        |         FROM g a JOIN rare r ON a.gram = r.gram
        |                  JOIN g b ON b.gram = a.gram
        |         WHERE a.doc_id < b.doc_id),
        |shared AS (SELECT c.doc_a, c.doc_b, CAST(count(*) AS BIGINT) AS shared
        |           FROM cand c JOIN g ga ON ga.doc_id = c.doc_a
        |                       JOIN g gb ON gb.doc_id = c.doc_b
        |                                AND gb.gram = ga.gram
        |           GROUP BY 1, 2)
        |SELECT s.doc_a, s.doc_b, s.shared, sa.n AS n_a, sb.n AS n_b,
        |       round(s.shared / CAST(least(sa.n, sb.n) AS DOUBLE), 4) AS containment
        |FROM shared s JOIN sizes sa ON sa.doc_id = s.doc_a
        |              JOIN sizes sb ON sb.doc_id = s.doc_b
        |WHERE s.shared * 10 >= least(sa.n, sb.n) * 8
        |ORDER BY containment DESC, doc_a, doc_b""".stripMargin,

    "q_text_perplexity" ->
      """WITH toks AS (SELECT doc_id, unnest(string_split(text,' ')) AS w
        |              FROM documents),
        |counts AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
        |tot AS (SELECT count(*) AS tot FROM toks)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
        |       round(-avg(ln(c / CAST(tot AS DOUBLE))), 4) AS xent
        |FROM toks JOIN counts USING (w) CROSS JOIN tot
        |GROUP BY doc_id ORDER BY doc_id LIMIT 300""".stripMargin
  )
}
