package graft.queries

/** DuckDB oracle SQL for the post-seed inventory (SURVEY.md §2.4 C+F).
  * Same dialect-seam rules as OracleSql (§2.2): explicit double casts
  * where DuckDB would produce DECIMAL, counts are BIGINT in both
  * engines, every query ends in a total order.
  */
object OracleSqlExt {

  val joins: Map[String, String] = Map(
    "q_join_left_outer" ->
      """SELECT c.c_custkey, c.c_name, count(o.o_orderkey) AS n_orders,
        |       round(coalesce(sum(o.o_totalprice), 0.0), 2) AS spend
        |FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        |GROUP BY c.c_custkey, c.c_name
        |ORDER BY n_orders DESC, c_custkey LIMIT 100""".stripMargin,

    "q_join_full_outer" ->
      """WITH c AS (SELECT c_nationkey AS nk_c, count(*) AS n_cust FROM customer GROUP BY 1),
        |     s AS (SELECT s_nationkey AS nk_s, count(*) AS n_supp FROM supplier GROUP BY 1)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        |       coalesce(n_cust, 0) AS n_cust,
        |       coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s
        |ORDER BY nationkey""".stripMargin,

    "q_join_range_band" ->
      """WITH bands AS (SELECT CAST(1.0 AS DOUBLE) + id*10 AS lo,
        |                      CAST(11.0 AS DOUBLE) + id*10 AS hi
        |               FROM range(5) t(id))
        |SELECT lo, hi, count(*) AS n, round(sum(l_extendedprice),2) AS s
        |FROM lineitem JOIN bands ON l_quantity >= lo AND l_quantity < hi
        |GROUP BY lo, hi ORDER BY lo""".stripMargin,

    "q_join_asof" ->
      """SELECT event_id, user_id, o_orderkey, o_orderdate FROM (
        |  SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate,
        |         row_number() OVER (PARTITION BY e.event_id
        |                            ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rk
        |  FROM events e JOIN orders o
        |    ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts) t
        |WHERE rk = 1 ORDER BY event_id LIMIT 200""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderstatus, count(*) AS n, round(sum(l_extendedprice),2) AS s
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin
  )

  val setops: Map[String, String] = Map(
    "q_set_union_all" ->
      """SELECT * FROM (
        |  SELECT c_name AS name, c_acctbal AS acctbal, 'customer' AS kind FROM customer
        |  UNION ALL
        |  SELECT s_name, s_acctbal, 'supplier' FROM supplier)
        |ORDER BY acctbal DESC, kind, name LIMIT 100""".stripMargin,

    "q_set_union" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer
        |  UNION
        |  SELECT s_nationkey FROM supplier)
        |ORDER BY nationkey""".stripMargin,

    "q_set_intersect" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 3000
        |  INTERSECT
        |  SELECT s_nationkey FROM supplier WHERE s_acctbal < 3000)
        |ORDER BY nationkey""".stripMargin,

    "q_set_except" ->
      """SELECT nationkey FROM (
        |  SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal < 3000
        |  EXCEPT
        |  SELECT s_nationkey FROM supplier WHERE s_acctbal < 3000)
        |ORDER BY nationkey""".stripMargin,

    "q_set_except_all" ->
      """WITH d AS (
        |  SELECT o_custkey FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'F')
        |SELECT o_custkey, count(*) AS n FROM d GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_set_intersect_all" ->
      """WITH d AS (
        |  SELECT o_custkey FROM orders
        |  INTERSECT ALL
        |  SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
        |SELECT o_custkey, count(*) AS n FROM d GROUP BY o_custkey ORDER BY o_custkey""".stripMargin,

    "q_dedup_exact" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |                            ORDER BY l_orderkey, l_linenumber) AS rk
        |  FROM lineitem) t
        |WHERE rk = 1 ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  def all: Map[String, String] = joins ++ setops
}
