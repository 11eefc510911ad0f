package graft.queries

/** DuckDB oracle SQL for the round-6 warehouse/curation keys
  * (WarehouseOps + the round-6 additions to Layout/TextOps/VectorOps).
  * Same dialect seams as OracleSql (SURVEY.md §2.2): integer division
  * is `div`↔`//`, BIGINT casts where DuckDB widens to HUGEINT,
  * ⌊x+0.5⌋ instead of round() wherever a half-up boundary could be
  * data-dependent.
  */
object OracleSqlWh {

  val all: Map[String, String] = Map(

    "q_dq_audit" ->
      """SELECT check_name, violations, violations = 0 AS passed FROM (
        |  SELECT 'lineitem_complete_qty' AS check_name,
        |         CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS violations
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_range_discount',
        |         CAST(sum(CASE WHEN l_discount NOT BETWEEN 0.0 AND 0.10 THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'lineitem_set_returnflag',
        |         CAST(sum(CASE WHEN l_returnflag NOT IN ('A','N','R') THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM lineitem
        |  UNION ALL
        |  SELECT 'orders_complete_date',
        |         CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'orders_unique_key',
        |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT)
        |  FROM orders
        |  UNION ALL
        |  SELECT 'lineitem_fk_orders', CAST(count(*) AS BIGINT)
        |  FROM lineitem l
        |  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
        |) t ORDER BY check_name""".stripMargin,

    "q_scd2" ->
      """WITH ch AS (
        |  SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
        |         lag(o_orderstatus) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS prev_status
        |  FROM orders
        |), v AS (
        |  SELECT o_custkey, o_orderstatus AS status, o_orderdate AS valid_from,
        |         lead(o_orderdate) OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS valid_to,
        |         row_number() OVER (PARTITION BY o_custkey
        |           ORDER BY o_orderdate, o_orderkey) AS version
        |  FROM ch WHERE prev_status IS NULL OR prev_status <> o_orderstatus
        |)
        |SELECT o_custkey, status, valid_from, valid_to, version,
        |       valid_to IS NULL AS is_current
        |FROM v WHERE o_custkey < 300 ORDER BY o_custkey, version""".stripMargin,

    "q_dpp_join" ->
      """SELECT o_orderpriority, count(*) AS n, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS s
        |FROM orders WHERE month(o_orderdate) IN (4,5,6)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_interval_overlap" ->
      """WITH spans AS (
        |  SELECT n.n_name, o.o_orderkey, o.o_orderdate AS t0,
        |         o.o_orderdate + INTERVAL 30 DAY AS t1
        |  FROM orders o
        |  JOIN customer c ON o.o_custkey = c.c_custkey
        |  JOIN nation n ON c.c_nationkey = n.n_nationkey
        |), points AS (
        |  SELECT n_name, t0 AS t, 1 AS delta, o_orderkey FROM spans
        |  UNION ALL
        |  SELECT n_name, t1 AS t, -1 AS delta, o_orderkey FROM spans
        |), sweep AS (
        |  SELECT n_name, delta,
        |         sum(delta) OVER (PARTITION BY n_name
        |           ORDER BY t, delta, o_orderkey) AS open_now
        |  FROM points
        |)
        |SELECT n_name, CAST(max(open_now) AS BIGINT) AS peak_concurrent,
        |       CAST(sum(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_orders
        |FROM sweep GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q_zorder_layout" ->
      """WITH b AS (
        |  SELECT CAST(o_custkey % 256 AS BIGINT) AS xb,
        |         CAST(((date_diff('day', DATE '1995-01-01',
        |                          CAST(o_orderdate AS DATE)) % 256) + 256) % 256
        |              AS BIGINT) AS yb
        |  FROM orders
        |), z AS (
        |  SELECT xb, yb,
        |         ( ((xb & 1) << 0) + ((yb & 1) << 1)
        |         + ((xb & 2) << 1) + ((yb & 2) << 2)
        |         + ((xb & 4) << 2) + ((yb & 4) << 3)
        |         + ((xb & 8) << 3) + ((yb & 8) << 4)
        |         + ((xb & 16) << 4) + ((yb & 16) << 5)
        |         + ((xb & 32) << 5) + ((yb & 32) << 6)
        |         + ((xb & 64) << 6) + ((yb & 64) << 7)
        |         + ((xb & 128) << 7) + ((yb & 128) << 8) ) AS zv
        |  FROM b
        |)
        |SELECT zv // 256 AS zbucket, CAST(count(*) AS BIGINT) AS n,
        |       min(xb) AS x_min, max(xb) AS x_max,
        |       min(yb) AS y_min, max(yb) AS y_max
        |FROM z GROUP BY zbucket ORDER BY zbucket""".stripMargin,

    "q_emb_quantize" ->
      """WITH q AS (
        |  SELECT label,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |           v -> CAST(least(greatest(floor(v * 127.0 + 0.5), -127.0), 127.0) AS BIGINT)) AS qc
        |  FROM embeddings
        |), p AS (
        |  SELECT label,
        |         CAST(list_sum(qc) AS BIGINT) AS code_sum,
        |         CAST(list_sum(list_transform(qc, x -> x * x)) AS BIGINT) AS code_energy,
        |         list_min(qc) AS qmin, list_max(qc) AS qmax
        |  FROM q
        |)
        |SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
        |       CAST(sum(code_sum) AS BIGINT) AS code_sum,
        |       CAST(sum(code_energy) AS BIGINT) AS code_energy,
        |       min(qmin) AS code_min, max(qmax) AS code_max
        |FROM p GROUP BY label ORDER BY label""".stripMargin,

    "q_text_zipf" ->
      """WITH counts AS (
        |  SELECT term, CAST(count(*) AS BIGINT) AS n FROM (
        |    SELECT unnest(string_split(text, ' ')) AS term FROM documents) t
        |  GROUP BY term
        |), r AS (
        |  SELECT term, n,
        |         row_number() OVER (ORDER BY n DESC, term) AS rnk,
        |         max(n) OVER () AS top_n
        |  FROM counts
        |)
        |SELECT rnk, term, n, (10000 * n) // top_n AS share_bp
        |FROM r WHERE rnk <= 50 ORDER BY rnk""".stripMargin,

    // real streaming executions (AvailableNow bounded replay): final
    // sink tables equal their batch twins, so the oracles are the
    // batch SQL forms
    "q_stream_sliding" ->
      """SELECT ws, event_type, count(*) AS n, round(sum(value),2) AS sv FROM (
        |  SELECT make_timestamp((epoch_us(ts) // 900000000 - u) * 900000000) AS ws,
        |         event_type, value
        |  FROM events, unnest([0,1,2,3]) AS t(u))
        |GROUP BY ws, event_type ORDER BY ws, event_type LIMIT 300""".stripMargin,

    "q_stream_dedup" ->
      """SELECT DISTINCT user_id, event_type FROM events
        |ORDER BY user_id, event_type LIMIT 500""".stripMargin,

    "q_window_distinct" ->
      """SELECT user_id, event_id,
        |       CAST(count(DISTINCT event_type) OVER (PARTITION BY user_id
        |         ORDER BY ts, event_id
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS INTEGER) AS types_seen
        |FROM events WHERE user_id < 30
        |ORDER BY user_id, event_id LIMIT 400""".stripMargin,

    "q_agg_histogram" ->
      """SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |       count(*) AS n,
        |       round(min(o_totalprice),2) AS lo, round(max(o_totalprice),2) AS hi
        |FROM orders GROUP BY bucket ORDER BY bucket""".stripMargin,

    "q_quantile_hist" ->
      """WITH h AS (
        |  SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS bucket,
        |         CAST(count(*) AS BIGINT) AS n
        |  FROM orders GROUP BY bucket
        |), c AS (
        |  SELECT bucket, n,
        |         CAST(sum(n) OVER (ORDER BY bucket
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM h
        |), t AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM h)
        |SELECT p, (total * p + 99) // 100 AS target_rank, bucket,
        |       round(bucket * 25000.0, 2) AS lo,
        |       round((bucket + 1) * 25000.0, 2) AS hi
        |FROM c, t, (SELECT CAST(unnest([50, 90, 99]) AS BIGINT) AS p) ps
        |WHERE cum >= (total * p + 99) // 100
        |  AND cum - n < (total * p + 99) // 100
        |ORDER BY p""".stripMargin,

    "q_graph_triangles" ->
      """WITH d AS (SELECT doc_id, lower(substring(text,1,60)) AS k FROM documents),
        |e AS (SELECT a.doc_id AS a, b.doc_id AS b
        |      FROM d a JOIN d b ON a.k = b.k AND a.doc_id < b.doc_id),
        |deg AS (
        |  SELECT v, CAST(count(*) AS BIGINT) AS dd FROM (
        |    SELECT a AS v FROM e UNION ALL SELECT b AS v FROM e) t GROUP BY v
        |)
        |SELECT CAST((SELECT count(*) FROM deg) AS BIGINT) AS n_nodes,
        |       CAST((SELECT sum(dd) FROM deg) // 2 AS BIGINT) AS n_edges,
        |       CAST((SELECT sum(dd * (dd - 1)) FROM deg) // 2 AS BIGINT) AS n_wedges,
        |       (SELECT CAST(count(*) AS BIGINT)
        |        FROM e e1 JOIN e e2 ON e1.b = e2.a
        |        JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin,

    "q_fn_bitwise" ->
      """SELECT l_orderkey, l_linenumber,
        |       l_orderkey & l_partkey AS b_and,
        |       l_orderkey | l_partkey AS b_or,
        |       xor(l_orderkey, l_partkey) AS b_xor,
        |       l_linenumber << 3 AS b_shl,
        |       l_orderkey >> 2 AS b_shr,
        |       CAST(bit_count(l_orderkey) AS INTEGER) AS b_cnt,
        |       ~l_orderkey AS b_not
        |FROM lineitem WHERE l_orderkey <= 200
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_knn_rerank" ->
      """WITH q AS (
        |  SELECT vec_id, embedding,
        |         list_transform(CAST(embedding AS DOUBLE[]),
        |           v -> least(greatest(floor(v * 127.0 + 0.5), -127.0), 127.0)) AS qc
        |  FROM embeddings
        |), coarse AS (
        |  SELECT p.vec_id, c.vec_id AS neighbor,
        |         CAST(list_dot_product(p.qc, c.qc) AS BIGINT) AS dot_q,
        |         round(list_dot_product(CAST(p.embedding AS DOUBLE[]),
        |                                CAST(c.embedding AS DOUBLE[])), 4) AS cos
        |  FROM q p JOIN q c ON c.vec_id <> p.vec_id
        |  WHERE p.vec_id < 10
        |), sl AS (
        |  SELECT vec_id, neighbor, dot_q, cos,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY dot_q DESC, neighbor) AS crk
        |  FROM coarse
        |)
        |SELECT vec_id, neighbor, dot_q, cos FROM (
        |  SELECT vec_id, neighbor, dot_q, cos,
        |         row_number() OVER (PARTITION BY vec_id
        |           ORDER BY cos DESC, neighbor) AS rk
        |  FROM sl WHERE crk <= 20) t
        |WHERE rk <= 3 ORDER BY vec_id, cos DESC, neighbor""".stripMargin,

    "q_sql_interface" ->
      """WITH rev AS (
        |  SELECT c.c_nationkey, o.o_orderpriority,
        |         sum(o.o_totalprice) AS pri_rev, CAST(count(*) AS BIGINT) AS n
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |  GROUP BY c.c_nationkey, o.o_orderpriority
        |  HAVING count(*) > 10
        |)
        |SELECT nt.n_name, r.o_orderpriority, round(r.pri_rev, 2) AS rev, r.n,
        |       CAST(rank() OVER (PARTITION BY nt.n_name
        |                         ORDER BY round(r.pri_rev, 2) DESC) AS INTEGER) AS rk
        |FROM rev r JOIN nation nt ON nt.n_nationkey = r.c_nationkey
        |ORDER BY nt.n_name, rk, o_orderpriority""".stripMargin,

    "q_binary_payload" ->
      """SELECT source, count(*) AS n_payloads,
        |       CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
        |       CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct,
        |       min(md5(text)) AS min_hash
        |FROM documents GROUP BY source ORDER BY source""".stripMargin,

    "q_orc_roundtrip" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity),2) AS q,
        |       CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |       min(l_shipdate) AS d0, max(l_shipdate) AS d1
        |FROM lineitem WHERE l_orderkey <= 30000
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin
  )
}
