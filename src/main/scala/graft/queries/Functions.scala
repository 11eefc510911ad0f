package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, StructField, StructType}

/** Scalar-function family coverage (SURVEY.md §2.4-G) — one declared
  * key per family, each bundling the family's representative functions
  * so the t2 inventory stays readable.
  *
  * All functions used here are codegen'd Catalyst expressions except
  * the higher-order array lambdas (interpreted; see
  * catalyst/DotProduct for the codegen'd alternative pattern). Every
  * key is a narrow projection over one table: column pruning reaches
  * the parquet scan, no shuffles except the final order-by.
  */
object Functions {

  /** String family: case, trim, substring, replace, concat_ws, length,
    * split, regexp_extract, regexp_replace, lpad, instr, LIKE.
    * DuckDB seams: string_split + 1-based [i], regexp_replace needs
    * the 'g' flag to match Spark's replace-all default. */
  def qFnString(spark: SparkSession, dir: String): DataFrame = {
    val p = Tables.part(spark, dir)
    p.filter(col("p_name").like("%a%"))
      .select(
        col("p_partkey"),
        upper(col("p_name")).as("nm_u"),
        lower(col("p_brand")).as("br_l"),
        length(col("p_name")).as("len"),
        substring(col("p_name"), 1, 5).as("sub5"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("devowel"),
        concat_ws("|", col("p_brand"), col("p_type")).as("cw"),
        element_at(split(col("p_name"), " "), 2).as("tok2"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("word1"),
        lpad(col("p_size").cast("string"), 4, "0").as("pad"),
        instr(col("p_name"), "r").as("pos_r"),
        trim(concat(lit(" "), col("p_name"), lit(" "))).as("trm"),
        translate(col("p_brand"), "#", "-").as("br_t"))
      .orderBy(col("p_partkey"))
      .limit(300)
  }

  /** Date/time family: date_format, year/month/day, weekday,
    * datediff, unix_micros, date_trunc, make_timestamp, date_add.
    * Date-typed outputs are rendered as strings — date vs timestamp
    * physical types differ across the two parquet writers (§2.2). */
  def qFnDatetime(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("ds"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        expr("weekday(o_orderdate)").as("wd"),
        datediff(lit("1998-12-01").cast("date"), col("o_orderdate")).as("dd"),
        // o_orderdate reads as TIMESTAMP_NTZ; cast to TIMESTAMP is exact
        // under the UTC session (§2.2-8) and matches DuckDB epoch_us.
        unix_micros(col("o_orderdate").cast("timestamp")).as("em"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd").as("mstart"),
        unix_micros(make_timestamp(
          year(col("o_orderdate")), month(col("o_orderdate")), lit(1),
          lit(0), lit(0), lit(0))).as("mk"),
        date_format(date_add(col("o_orderdate").cast("date"), 30), "yyyy-MM-dd").as("add30"))
      .orderBy(col("o_orderkey"))
      .limit(300)
  }

  /** Math family: abs, ceil/floor, sqrt, exp, ln, log10, pow, mod,
    * sign, greatest/least. Transcendentals rounded to 6 dp (libm
    * last-ulp variance is ~1e-15 relative; 6 dp is safely coarse). */
  def qFnMath(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_orderkey") <= 1000)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(abs(-col("l_extendedprice")), 2).as("ab"),
        ceil(col("l_quantity")).as("ce"),
        floor(col("l_quantity")).as("fl"),
        round(sqrt(col("l_extendedprice")), 6).as("sq"),
        round(exp(col("l_discount")), 6).as("ex"),
        round(log(col("l_extendedprice")), 6).as("ln_"),
        round(log10(col("l_extendedprice")), 6).as("l10"),
        round(pow(col("l_quantity"), 2), 2).as("pw"),
        (col("l_orderkey") % 7).as("md"),
        signum(col("l_discount") - 0.05).cast("int").as("sg"),
        greatest(col("l_quantity"), lit(25.0)).as("gr"),
        least(col("l_quantity"), lit(25.0)).as("ls"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Conditionals: CASE WHEN chains, coalesce, nullif, IN, BETWEEN. */
  def qFnCond(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    o.select(
        col("o_orderkey"),
        when(col("o_totalprice") > 200000, "high")
          .when(col("o_totalprice") > 100000, "mid")
          .otherwise("low").as("band"),
        coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("urgent"),
        col("o_totalprice").between(50000, 150000).as("midrange"))
      .orderBy(col("o_orderkey"))
      .limit(300)
  }

  /** Array family over the real list<float> column: size, element_at,
    * slice+aggregate, array_max, filter, reverse, transform. Scalars
    * out only — list stringification differs across readers. */
  def qFnArray(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e.select(
        col("vec_id"),
        size(col("embedding")).as("sz"),
        round(element_at(col("embedding"), 1).cast("double"), 4).as("e1"),
        round(expr(
          "aggregate(slice(embedding,1,8), cast(0.0 as double), (acc,x) -> acc + cast(x as double))"
        ), 4).as("sum8"),
        round(array_max(col("embedding")).cast("double"), 4).as("mx"),
        expr("size(filter(embedding, x -> x > 0))").as("npos"),
        round(element_at(reverse(col("embedding")), 1).cast("double"), 4).as("last_e"),
        round(expr(
          "aggregate(transform(slice(embedding,1,4), x -> cast(x as double) * cast(x as double)), cast(0.0 as double), (acc,x) -> acc + x)"
        ), 4).as("sumsq4"))
      .orderBy(col("vec_id"))
      .limit(300)
  }

  /** explode/unnest: flatten the embedding vectors back to scalars and
    * re-aggregate (count + sum) per vector. */
  def qFnExplode(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
    e.filter(col("vec_id") < 50)
      .select(col("vec_id"), explode(col("embedding")).as("val"))
      .groupBy(col("vec_id"))
      .agg(count(lit(1)).as("n"),
           round(sum(col("val").cast("double")), 4).as("s"))
      .orderBy(col("vec_id"))
  }

  /** Map family: construct a map in-query, extract values and keys
    * back out as scalars (no map column exists in the fixtures —
    * SURVEY.md §1.2). */
  def qFnMap(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    val m = map(lit("qty"), col("l_quantity"), lit("price"), col("l_extendedprice"))
    l.filter(col("l_orderkey") <= 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        round(element_at(m, "qty"), 2).as("qv"),
        round(element_at(m, "price"), 2).as("pv"),
        array_join(map_keys(m), ",").as("mk"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** String family 2: repeat, reverse, left/right, contains/starts/
    * ends predicates, ascii/char codecs. */
  def qFnString2(spark: SparkSession, dir: String): DataFrame = {
    Tables.part(spark, dir)
      .select(
        col("p_partkey"),
        expr("repeat(p_brand, 2)").as("rep"),
        reverse(col("p_name")).as("rev"),
        expr("left(p_name, 3)").as("l3"),
        expr("right(p_name, 3)").as("r3"),
        expr("contains(p_name, 'ring')").as("has_ring"),
        expr("startswith(p_name, 's')").as("sw"),
        expr("endswith(p_type, 'Y')").as("ew"),
        ascii(col("p_name")).as("asc_1"),
        expr("char(p_size + 64)").as("ch"))
      .orderBy(col("p_partkey"))
      .limit(300)
  }

  /** ANSI-safe `try_` family: malformed casts and division by zero
    * yield NULL instead of failing the job — the behavior a 100 TB
    * pipeline needs on dirty data (one bad row must not kill a stage). */
  def qFnTry(spark: SparkSession, dir: String): DataFrame = {
    val l = Tables.lineitem(spark, dir)
    l.filter(col("l_orderkey") <= 500)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_cast('not a number' AS int)").as("tc_bad"),
        expr("try_cast(cast(l_linenumber AS string) AS int)").as("tc_ok"),
        // integral numerator: k/d with d ≤ 49 has no non-representable
        // 4-decimal half-way case, unlike 2-decimal money ÷ d (§2.2-2)
        round(expr("try_divide(round(l_extendedprice, 0), l_quantity - 50)"), 4).as("td"),
        expr("try_element_at(split(l_returnflag, ''), 100)").as("te"),
        expr("try_add(l_orderkey, 1)").as("ta"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** Structured JSON parse (from_json → struct field), vs the seeded
    * string-path get_json_object key. */
  def qFnJsonStruct(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.events(spark, dir)
    val schema = StructType(Seq(StructField("k", IntegerType)))
    e.select(col("user_id"), from_json(col("props"), schema).getField("k").as("k"))
      .groupBy(col("user_id"))
      .agg(sum(col("k")).cast("bigint").as("sk"), count(col("k")).as("nk"))
      .orderBy(col("user_id"))
      .limit(200)
  }

  /** Bitwise family: AND / OR / XOR / shifts / popcount / NOT — pure
    * integer algebra, bit-identical in any engine (the primitives
    * under the Z-order and salting keys, declared here as a scalar
    * family row of their own). */
  def qFnBitwise(spark: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(spark, dir)
      .filter(col("l_orderkey") <= 200)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(col("l_partkey")).as("b_and"),
        col("l_orderkey").bitwiseOR(col("l_partkey")).as("b_or"),
        col("l_orderkey").bitwiseXOR(col("l_partkey")).as("b_xor"),
        shiftleft(col("l_linenumber"), 3).as("b_shl"),
        shiftright(col("l_orderkey"), 2).as("b_shr"),
        bit_count(col("l_orderkey")).as("b_cnt"),
        expr("~l_orderkey").as("b_not"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  /** URL family: parse_url component extraction (PROTOCOL / HOST /
    * PATH / QUERY / REF / keyed QUERY) — the web-corpus field a
    * training pipeline partitions and filters on (domain dedup,
    * per-site sampling caps). The fixture has no URL column, so the
    * key synthesizes a deterministic URL per document from its own
    * fields first; the oracle rebuilds the same string and extracts
    * the components with anchored regexes (DuckDB has no parse_url).
    * Pure per-row projection — no shuffle before the presentation
    * sort, codegen end to end. */
  def qFnUrl(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .withColumn("url", concat(
        lit("https://"), col("source"), lit(".example.org/docs/"),
        col("doc_id"), lit("?lang="), col("lang"),
        lit("&ref=graft#s"), pmod(col("doc_id"), lit(7))))
      .select(
        col("doc_id"), col("url"),
        expr("parse_url(url, 'PROTOCOL')").as("proto"),
        expr("parse_url(url, 'HOST')").as("host"),
        expr("parse_url(url, 'PATH')").as("path"),
        expr("parse_url(url, 'QUERY')").as("query"),
        expr("parse_url(url, 'REF')").as("anchor"),
        expr("parse_url(url, 'QUERY', 'lang')").as("q_lang"))
      .orderBy(col("doc_id"))
      .limit(300)
}
