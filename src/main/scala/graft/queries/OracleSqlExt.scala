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

    "q_join_right_outer" ->
      """SELECT p.p_partkey, p.p_name, count(l.l_orderkey) AS n_li
        |FROM lineitem l RIGHT JOIN part p ON l.l_partkey = p.p_partkey
        |GROUP BY p.p_partkey, p.p_name ORDER BY n_li, p_partkey LIMIT 100""".stripMargin,

    "q_join_range_band" ->
      """WITH bands AS (SELECT CAST(1.0 AS DOUBLE) + id*10 AS lo,
        |                      CAST(11.0 AS DOUBLE) + id*10 AS hi
        |               FROM range(5) t(id))
        |SELECT lo, hi, count(*) AS n, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
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

    "q_subquery_scalar" ->
      """SELECT o.o_orderkey, round(o.o_totalprice, 2) AS price
        |FROM orders o
        |WHERE o.o_totalprice > 1.8 * (SELECT avg(o2.o_totalprice)
        |                              FROM orders o2
        |                              WHERE o2.o_custkey = o.o_custkey)
        |ORDER BY o.o_orderkey""".stripMargin,

    "q_subquery_in" ->
      """SELECT o_orderpriority, count(*) AS n FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_join_nullsafe" ->
      """WITH c AS (SELECT CASE WHEN c_acctbal >= 0 THEN CAST(floor(c_acctbal/5000) AS BIGINT) END AS band,
        |                  count(*) AS n_cust
        |           FROM customer GROUP BY 1),
        |     s AS (SELECT CASE WHEN s_acctbal >= 0 THEN CAST(floor(s_acctbal/5000) AS BIGINT) END AS band,
        |                  count(*) AS n_supp
        |           FROM supplier GROUP BY 1)
        |SELECT c.band AS band, n_cust, n_supp
        |FROM c JOIN s ON c.band IS NOT DISTINCT FROM s.band
        |ORDER BY band NULLS FIRST""".stripMargin,

    "q_join_smj" ->
      """SELECT o_orderstatus, count(*) AS n, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s
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

    "q_merge_upsert" ->
      """WITH base AS (SELECT o_orderkey AS b_key, o_custkey AS b_cust,
        |                     o_totalprice AS b_price
        |              FROM orders WHERE o_orderstatus <> 'P'),
        |     upd  AS (SELECT o_orderkey AS u_key, o_custkey AS u_cust,
        |                     round(o_totalprice * 1.1, 3) AS u_price
        |              FROM orders WHERE o_orderstatus = 'P')
        |SELECT coalesce(u_key, b_key) AS o_orderkey,
        |       coalesce(u_cust, b_cust) AS o_custkey,
        |       coalesce(u_price, b_price) AS price,
        |       u_key IS NOT NULL AS updated
        |FROM base FULL OUTER JOIN upd ON b_key = u_key
        |ORDER BY o_orderkey LIMIT 500""".stripMargin,

    "q_dedup_exact" ->
      """SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber FROM (
        |  SELECT l_returnflag, l_linestatus, l_orderkey, l_linenumber,
        |         row_number() OVER (PARTITION BY l_returnflag, l_linestatus
        |                            ORDER BY l_orderkey, l_linenumber) AS rk
        |  FROM lineitem) t
        |WHERE rk = 1 ORDER BY l_returnflag, l_linestatus""".stripMargin
  )

  val windows: Map[String, String] = Map(
    "q_window_rank_family" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice, rk, drk, prk, cd, quartile FROM (
        |  SELECT o_orderpriority, o_orderkey, o_totalprice,
        |         rank() OVER w AS rk, dense_rank() OVER w AS drk,
        |         round(percent_rank() OVER w, 6) AS prk,
        |         round(cume_dist() OVER w, 6) AS cd,
        |         ntile(4) OVER w AS quartile
        |  FROM orders
        |  WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey)) t
        |WHERE rk <= 20 ORDER BY o_orderpriority, rk""".stripMargin,

    "q_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |       round(sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend,
        |       round(avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS mov_avg3
        |FROM orders ORDER BY o_custkey, o_orderkey LIMIT 300""".stripMargin,

    "q_window_range_frame" ->
      """SELECT l_returnflag, l_orderkey, l_linenumber, l_quantity,
        |       round(sum(l_extendedprice) OVER (PARTITION BY l_returnflag ORDER BY l_quantity
        |             RANGE BETWEEN 5 PRECEDING AND CURRENT ROW), 2) AS range_sum
        |FROM lineitem ORDER BY l_returnflag, l_quantity, l_orderkey, l_linenumber LIMIT 200""".stripMargin,

    "q_window_firstlast" ->
      """SELECT o_custkey, first_ok, last_ok, second_ok FROM (
        |  SELECT o_custkey,
        |         first_value(o_orderkey) OVER wf AS first_ok,
        |         last_value(o_orderkey) OVER wf AS last_ok,
        |         nth_value(o_orderkey, 2) OVER wf AS second_ok,
        |         row_number() OVER wo AS rn
        |  FROM orders
        |  WINDOW wo AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
        |         wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |                ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)) t
        |WHERE rn = 1 ORDER BY o_custkey LIMIT 200""".stripMargin,

    "q_window_lag_lead" ->
      """SELECT user_id, event_id,
        |       (epoch_us(ts) - epoch_us(lag(ts,1) OVER w)) / 1000000 AS gap_prev_s,
        |       (epoch_us(lead(ts,1) OVER w) - epoch_us(ts)) / 1000000 AS gap_next_s
        |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        |ORDER BY user_id, event_id LIMIT 300""".stripMargin
  )

  val aggs: Map[String, String] = Map(
    "q_agg_global" ->
      """SELECT count(*) AS n, round(sum(l_quantity),2) AS sum_qty,
        |       round(avg(l_extendedprice),2) AS avg_price,
        |       min(l_shipdate) AS min_ship, max(l_shipdate) AS max_ship FROM lineitem""".stripMargin,

    "q_agg_cube" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS s,
        |       (CASE WHEN l_returnflag IS NULL THEN 1 ELSE 0 END
        |        + CASE WHEN l_linestatus IS NULL THEN 1 ELSE 0 END) AS lvl
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n, round(sum(l_quantity),2) AS sum_qty
        |FROM lineitem GROUP BY GROUPING SETS ((l_returnflag),(l_linestatus),())
        |ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,

    "q_agg_stats" ->
      """SELECT l_returnflag, round(stddev_samp(l_quantity),4) AS sd_qty,
        |       round(stddev_pop(l_quantity),4) AS sdp_qty,
        |       round(var_samp(l_extendedprice),2) AS var_price,
        |       round(corr(l_quantity,l_extendedprice),4) AS corr_qp,
        |       round(covar_samp(l_quantity,l_extendedprice),2) AS cov_qp
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_percentile" ->
      """SELECT l_returnflag, round(quantile_cont(l_quantity, 0.25),4) AS p25,
        |       round(quantile_cont(l_quantity, 0.5),4) AS p50,
        |       round(quantile_cont(l_quantity, 0.75),4) AS p75,
        |       round(median(l_extendedprice),4) AS med_price
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_cond_bool" ->
      """SELECT o_orderpriority,
        |       CAST(count_if(o_totalprice > 200000) AS BIGINT) AS n_big,
        |       bool_or(o_orderstatus = 'P') AS any_p,
        |       bool_and(o_totalprice > 0) AS all_pos,
        |       bit_and(o_orderkey % 256) AS band,
        |       bit_or(o_orderkey % 256) AS bor,
        |       bit_xor(o_orderkey % 256) AS bxor,
        |       arg_max(o_custkey, o_orderkey) AS last_cust,
        |       arg_min(o_custkey, o_orderkey) AS first_cust
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q_agg_regr" ->
      """SELECT l_returnflag,
        |       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
        |       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
        |       round(regr_r2(l_extendedprice, l_quantity), 6) AS r2,
        |       regr_count(l_extendedprice, l_quantity) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_fn_string2" ->
      """SELECT p_partkey, repeat(p_brand, 2) AS rep, reverse(p_name) AS rev,
        |       left(p_name, 3) AS l3, right(p_name, 3) AS r3,
        |       contains(p_name, 'ring') AS has_ring,
        |       starts_with(p_name, 's') AS sw,
        |       ends_with(p_type, 'Y') AS ew,
        |       ascii(p_name) AS asc_1,
        |       chr(p_size + 64) AS ch
        |FROM part ORDER BY p_partkey LIMIT 300""".stripMargin,

    "q_fn_try" ->
      """SELECT l_orderkey, l_linenumber,
        |       TRY_CAST('not a number' AS INTEGER) AS tc_bad,
        |       TRY_CAST(CAST(l_linenumber AS VARCHAR) AS INTEGER) AS tc_ok,
        |       round(CASE WHEN l_quantity = 50 THEN NULL
        |             ELSE round(l_extendedprice, 0) / (l_quantity - 50) END, 4) AS td,
        |       string_split(l_returnflag, '')[100] AS te,
        |       l_orderkey + 1 AS ta
        |FROM lineitem WHERE l_orderkey <= 500 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_agg_pivot" ->
      """SELECT l_returnflag,
        |       round(sum(CASE WHEN l_linestatus='F' THEN l_quantity END),2) AS F,
        |       round(sum(CASE WHEN l_linestatus='O' THEN l_quantity END),2) AS O
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin,

    "q_agg_unpivot" ->
      """WITH a AS (SELECT l_returnflag, round(sum(l_quantity),2) AS sum_qty,
        |                  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |           FROM lineitem GROUP BY 1)
        |SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM a
        |UNION ALL
        |SELECT l_returnflag, 'revenue' AS metric, revenue AS value FROM a
        |ORDER BY l_returnflag, metric""".stripMargin,

    "q_agg_collect" ->
      """SELECT l_orderkey, array_to_string(list_sort(list(l_linenumber)), ',') AS lines,
        |       array_to_string(list_sort(list_distinct(list(l_linenumber))), ',') AS uniq,
        |       count(*) AS n
        |FROM lineitem WHERE l_orderkey <= 400 GROUP BY l_orderkey ORDER BY l_orderkey""".stripMargin
  )

  val functions: Map[String, String] = Map(
    "q_fn_string" ->
      """SELECT p_partkey, upper(p_name) AS nm_u, lower(p_brand) AS br_l,
        |       length(p_name) AS len, substring(p_name,1,5) AS sub5,
        |       regexp_replace(p_name,'[aeiou]','*','g') AS devowel,
        |       concat_ws('|', p_brand, p_type) AS cw,
        |       string_split(p_name,' ')[2] AS tok2,
        |       regexp_extract(p_name,'^([a-z]+)',1) AS word1,
        |       lpad(CAST(p_size AS VARCHAR),4,'0') AS pad,
        |       instr(p_name,'r') AS pos_r,
        |       trim(concat(' ', p_name, ' ')) AS trm,
        |       translate(p_brand,'#','-') AS br_t
        |FROM part WHERE p_name LIKE '%a%' ORDER BY p_partkey LIMIT 300""".stripMargin,

    "q_fn_datetime" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS ds,
        |       year(o_orderdate) AS y, month(o_orderdate) AS m, day(o_orderdate) AS d,
        |       isodow(o_orderdate) - 1 AS wd,
        |       date_diff('day', CAST(o_orderdate AS DATE), DATE '1998-12-01') AS dd,
        |       epoch_us(o_orderdate) AS em,
        |       strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS mstart,
        |       epoch_us(make_timestamp(CAST(year(o_orderdate) AS BIGINT),
        |                CAST(month(o_orderdate) AS BIGINT), 1, 0, 0, 0.0)) AS mk,
        |       strftime(CAST(o_orderdate AS DATE) + 30, '%Y-%m-%d') AS add30
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "q_fn_math" ->
      """SELECT l_orderkey, l_linenumber, round(abs(-l_extendedprice),2) AS ab,
        |       CAST(ceil(l_quantity) AS BIGINT) AS ce, CAST(floor(l_quantity) AS BIGINT) AS fl,
        |       round(sqrt(l_extendedprice),6) AS sq, round(exp(l_discount),6) AS ex,
        |       round(ln(l_extendedprice),6) AS ln_, round(log10(l_extendedprice),6) AS l10,
        |       round(pow(l_quantity,2),2) AS pw, l_orderkey % 7 AS md,
        |       CAST(sign(l_discount - 0.05) AS INTEGER) AS sg,
        |       greatest(l_quantity, CAST(25.0 AS DOUBLE)) AS gr,
        |       least(l_quantity, CAST(25.0 AS DOUBLE)) AS ls
        |FROM lineitem WHERE l_orderkey <= 1000 ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_fn_cond" ->
      """SELECT o_orderkey,
        |       CASE WHEN o_totalprice > 200000 THEN 'high'
        |            WHEN o_totalprice > 100000 THEN 'mid' ELSE 'low' END AS band,
        |       coalesce(nullif(o_orderstatus,'O'),'OPEN') AS st,
        |       o_orderpriority IN ('1-URGENT','2-HIGH') AS urgent,
        |       o_totalprice BETWEEN 50000 AND 150000 AS midrange
        |FROM orders ORDER BY o_orderkey LIMIT 300""".stripMargin,

    "q_fn_array" ->
      """SELECT vec_id, len(embedding) AS sz,
        |       round(CAST(embedding[1] AS DOUBLE),4) AS e1,
        |       round(CAST(list_sum(CAST(embedding[1:8] AS DOUBLE[])) AS DOUBLE),4) AS sum8,
        |       round(CAST(list_aggregate(embedding,'max') AS DOUBLE),4) AS mx,
        |       len(list_filter(embedding, x -> x > 0)) AS npos,
        |       round(CAST(list_reverse(embedding)[1] AS DOUBLE),4) AS last_e,
        |       round(CAST(list_sum(list_transform(CAST(embedding[1:4] AS DOUBLE[]),
        |             x -> x*x)) AS DOUBLE),4) AS sumsq4
        |FROM embeddings ORDER BY vec_id LIMIT 300""".stripMargin,

    "q_fn_explode" ->
      """SELECT vec_id, count(*) AS n, round(CAST(sum(val) AS DOUBLE),4) AS s FROM (
        |  SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS val
        |  FROM embeddings WHERE vec_id < 50) t
        |GROUP BY vec_id ORDER BY vec_id""".stripMargin,

    "q_fn_map" ->
      """SELECT l_orderkey, l_linenumber,
        |       round(map_extract(m,'qty')[1],2) AS qv,
        |       round(map_extract(m,'price')[1],2) AS pv,
        |       array_to_string(map_keys(m),',') AS mk
        |FROM (SELECT l_orderkey, l_linenumber,
        |             MAP {'qty': l_quantity, 'price': l_extendedprice} AS m
        |      FROM lineitem WHERE l_orderkey <= 300) t
        |ORDER BY l_orderkey, l_linenumber""".stripMargin,

    "q_fn_json_struct" ->
      """SELECT user_id,
        |       CAST(sum(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS BIGINT) AS sk,
        |       count(CAST(json_extract_string(props,'$.k') AS INTEGER)) AS nk
        |FROM events GROUP BY user_id ORDER BY user_id LIMIT 200""".stripMargin
  )

  def all: Map[String, String] =
    joins ++ setops ++ windows ++ aggs ++ functions ++
      // r19: the HGT decode path's oracle lives with the key (the SQL
      // is generated from the same Tiles/N/altAt constants the tile
      // synthesizer uses — one source of truth for both engines)
      Map("q_hgt_points" -> HgtOps.OracleSql)
}
