package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Central loader for the driver-provided fixture tables (TESTDATA.md).
  *
  * Owns the one session-level read hazard (SURVEY.md §1.2): `events.ts`
  * has shipped in THREE physical layouts across fixture generations,
  * and the loader adapts on the actual file schema so all of them
  * present one TIMESTAMP surface downstream:
  *  - parquet TIMESTAMP(NANOS) (early driver fixtures): Spark 4.x
  *    refuses to read it unless
  *    `spark.sql.legacy.parquet.nanosAsLong=true`; with that flag the
  *    column arrives as raw nanos (LongType) and we truncate to
  *    microseconds with *integer* division (`div`) — bit-identical to
  *    DuckDB's native ns→µs truncation for the non-negative epoch
  *    values in the fixtures. (Floating-point division would lose
  *    precision above 2^53 ns and is deliberately avoided.)
  *  - raw int64 nanos (our GenData sf1 fixture — Spark cannot WRITE ns
  *    parquet): arrives as LongType with or without the flag; same
  *    exact ns→µs path.
  *  - parquet TIMESTAMP(MICROS), isAdjustedToUTC=false (driver
  *    fixtures from round 8 on): arrives as TIMESTAMP_NTZ; cast to the
  *    session-zone TIMESTAMP, value-preserving under the UTC session
  *    this engine pins, so downstream code keeps seeing the exact type
  *    the other two layouts produce.
  * `tools/oracle_check.py` keeps the DuckDB side agreeing
  * byte-for-byte: only the raw-int64 layout needs a view rewrite there
  * (the same ns→µs truncation); DuckDB reads the other two layouts
  * natively to the equivalent µs surface (details in the script).
  *
  * Scale notes:
  *  - Plain lazy parquet scans: Catalyst column pruning + predicate
  *    pushdown reach the file scan unimpeded; nothing is cached or
  *    collected here.
  *  - At 100 TB these tables would be directory-partitioned
  *    (e.g. orders/lineitem by date); the loaders take a directory so
  *    swapping a partitioned layout in changes nothing downstream.
  */
object Tables {

  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Runtime session confs every query path relies on. Safe to call
    * repeatedly; both are dynamic SQL confs. */
  def configure(spark: SparkSession): Unit = {
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
  }

  /** Physical dataType of `events.ts` in this fixture (one batch
    * footer read). Shared with StreamOps.eventsStream, whose streaming
    * source must declare an explicit schema and therefore needs the
    * layout BEFORE it can read (ADVICE r8: the dispatch logic used to
    * live twice and could drift). */
  def tsPhysicalType(spark: SparkSession, sfDir: String): org.apache.spark.sql.types.DataType = {
    configure(spark)
    memoizedSchema(spark, s"$sfDir/events.parquet")("ts").dataType
  }

  /** Normalize an events frame (batch or streaming) from its physical
    * `ts` layout to the one session-zone TIMESTAMP surface downstream
    * code assumes. Fails FAST on an unrecognized layout (ADVICE r8):
    * the old silent fallthrough would let a fourth fixture generation
    * (ms-as-long, string ts, …) flow into window/watermark code that
    * assumes TimestampType and break far from the loader — or worse,
    * quietly compute on wrong values. */
  def normalizeTs(df: DataFrame, tsType: org.apache.spark.sql.types.DataType): DataFrame =
    tsType match {
      // ns layouts arrive as long (nanosAsLong / raw int64); exact ns→µs.
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      // µs NTZ layout (driver r8+): value-preserving cast under UTC.
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(org.apache.spark.sql.types.TimestampType))
      // µs/ms TIMESTAMP (tz-adjusted): already the downstream surface.
      case org.apache.spark.sql.types.TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts arrived as unsupported physical type $other; known layouts: " +
          "int64 nanos (LongType via nanosAsLong / raw), TIMESTAMP_NTZ (µs), TIMESTAMP. " +
          "Teach Tables.normalizeTs the new layout (and mirror it in tools/oracle_check.py).")
    }

  /** Per-file-path schema memo (r19, optimization guide §1.2: every
    * `spark.read.parquet` without an explicit schema re-infers by
    * reading a footer at PLAN time — a fixed per-call cost paid inside
    * every timed query construction, per table). Keyed by canonical
    * path; the one layout-variant column (`events.ts`, three physical
    * layouts across fixture generations) is precisely WHY the key is
    * the file path, not the table name.
    *
    * r20 (VERDICT r19 wrong #4): each entry also pins the source's
    * STAT TOKEN (length + mtime, folded over the immediate children
    * when the path is a directory — Spark-written parquet dirs get
    * fresh part-file names per write, so any regeneration moves the
    * token). r19's memo assumed no path ever changes columns in-JVM —
    * true for GenData today, but `events.ts` has had three physical
    * layouts across fixture generations, and a same-path regeneration
    * inside one test JVM would have served a stale schema. A moved
    * token re-infers and replaces the entry (TablesMemoSpec drives the
    * regeneration case). The stat calls are local-FS metadata —
    * microseconds against the ~30–70 ms footer JOB the memo removes. */
  private val schemaMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (String, org.apache.spark.sql.types.StructType)]()

  /** Cheap change token for a fixture path: length+mtime of the file,
    * or of every immediate child when the path is a directory. */
  private def statToken(canonical: String): String = {
    val f = new java.io.File(canonical)
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).sortBy(_.getName)
        .map(c => s"${c.getName}:${c.length}:${c.lastModified}")
        .mkString(s"${f.lastModified}|", ",", "")
    else s"${f.length}:${f.lastModified}"
  }

  private def memoizedSchema(spark: SparkSession,
                             path: String): org.apache.spark.sql.types.StructType = {
    val canonical = new java.io.File(path).getCanonicalPath
    val token = statToken(canonical)
    schemaMemo.compute(canonical, (_, prev) =>
      if (prev != null && prev._1 == token) prev
      else (token, spark.read.parquet(path).schema))._2
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    configure(spark)
    val path = s"$sfDir/$name.parquet"
    val df = spark.read.schema(memoizedSchema(spark, path)).parquet(path)
    if (name == "events") normalizeTs(df, df.schema("ts").dataType) else df
  }

  def region(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame       = load(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "lineitem")
  def events(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "events")
  def documents(spark: SparkSession, dir: String): DataFrame  = load(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "embeddings")

  /** Register every fixture table as a temp view (suffixed names are
    * avoided — views are session-scoped, so per-sf callers re-register)
    * making the whole engine reachable through `spark.sql(...)` — the
    * second front door next to the DataFrame API. The events ns-fix
    * rides along because the view wraps the SAME loader DataFrame. */
  def registerViews(spark: SparkSession, dir: String): Unit =
    all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
