package graft.queries

/** DuckDB oracle SQL, one entry per declared query key
  * (SparkEntry.oracleSql). These strings run in DuckDB 1.0.0 against
  * the same parquet files; the driver hash-compares against the Spark
  * result. Dialect seams (SURVEY.md §2.2/§2.3 Appendix A, all
  * empirically validated Spark↔DuckDB on sf0.01):
  *  - epoch_us(x) ↔ Spark unix_micros(x)
  *  - json_extract_string ↔ get_json_object
  *  - list_dot_product(CAST .. AS DOUBLE[]) ↔ aggregate(zip_with(..))
  *  - sum(int) cast to BIGINT (DuckDB sums ints to HUGEINT)
  */
object OracleSql {

  val seed: Map[String, String] = Map(
    "q_agg_pricing" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        |       round(sum(l_quantity),2) AS sum_qty,
        |       CAST(sum(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        |       round(avg(l_extendedprice),2) AS avg_price
        |FROM lineitem WHERE l_shipdate <= timestamp '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q_join_topk" ->
      """SELECT o.o_orderkey, round(sum(l.l_extendedprice*(1-l.l_discount)),2) AS revenue,
        |       o.o_orderdate
        |FROM customer c JOIN orders o ON c.c_custkey = o.o_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |WHERE c.c_mktsegment = 'BUILDING' AND o.o_orderdate < timestamp '1998-03-15'
        |GROUP BY o.o_orderkey, o.o_orderdate ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q_join_regional" ->
      """SELECT n.n_name, CAST(sum(CAST(l.l_extendedprice*(1-l.l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM region r JOIN nation n ON n.n_regionkey = r.r_regionkey
        |JOIN customer c ON c.c_nationkey = n.n_nationkey
        |JOIN orders o ON o.o_custkey = c.c_custkey
        |JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        |JOIN supplier s ON s.s_suppkey = l.l_suppkey AND s.s_nationkey = n.n_nationkey
        |WHERE r.r_name = 'ASIA' GROUP BY n.n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q_join_semi" ->
      """SELECT count(*) AS n FROM orders o
        |WHERE EXISTS (SELECT 1 FROM lineitem l
        |              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 49)""".stripMargin,

    "q_join_anti" ->
      """SELECT count(*) AS n FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)""".stripMargin,

    "q_window_topk" ->
      """SELECT c_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT c.c_custkey, o.o_orderkey, o.o_totalprice,
        |         row_number() OVER (PARTITION BY c.c_custkey
        |                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rk
        |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey) t
        |WHERE rk <= 3 ORDER BY c_custkey, rk LIMIT 100""".stripMargin,

    "q_agg_rollup" ->
      """SELECT l_returnflag, l_linestatus, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_distinct" ->
      """SELECT o_orderpriority, count(DISTINCT o_custkey) AS u, count(*) AS n
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_sort_limit" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin,

    "q_events_tumbling" ->
      """SELECT date_trunc('hour', ts) AS h, event_type, count(*) AS n,
        |       round(sum(value),2) AS sv
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2 LIMIT 200""".stripMargin,

    "q_events_sessionize" ->
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN (epoch_us(ts) - epoch_us(lag(ts) OVER
        |               (PARTITION BY user_id ORDER BY ts)))/60000000.0 > 30
        |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |    THEN 1 ELSE 0 END AS brk
        |  FROM events)
        |SELECT user_id, cast(sum(brk) AS BIGINT) AS sessions FROM g GROUP BY user_id
        |ORDER BY sessions DESC, user_id LIMIT 50""".stripMargin,

    "q_dedup_near" ->
      """SELECT lower(substring(text,1,60)) AS k, count(*) AS n, min(doc_id) AS keep
        |FROM documents GROUP BY 1 HAVING count(*) > 1 ORDER BY n DESC, k LIMIT 50""".stripMargin,

    "q_json_extract" ->
      """SELECT event_type,
        |       round(avg(cast(json_extract_string(props,'$.k') AS double)),3) AS avg_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q_cosine_topk" ->
      """WITH probes AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 10),
        |pairs AS (
        |  SELECT p.vec_id, t.vec_id AS neighbor,
        |         round(CAST(list_dot_product(CAST(p.embedding AS DOUBLE[]),
        |               CAST(t.embedding AS DOUBLE[])) AS DOUBLE), 4) AS cos
        |  FROM probes p CROSS JOIN embeddings t WHERE t.vec_id <> p.vec_id)
        |SELECT vec_id, neighbor, cos FROM (
        |  SELECT *, row_number() OVER (PARTITION BY vec_id
        |                               ORDER BY cos DESC, neighbor) rk FROM pairs) x
        |WHERE rk <= 5 ORDER BY vec_id, cos DESC, neighbor""".stripMargin
  )

  def all: Map[String, String] =
    seed ++ OracleSqlExt.all ++ OracleSqlLlm.all ++ OracleSqlWh.all ++ OracleSqlPipe.all
}
