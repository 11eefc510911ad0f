package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic fixture generator — synthesizes an sf1-scale twin of
  * the driver's TESTDATA.md tables (FIXTURES.md schemas + measured
  * value domains) so the engine's 100 TB claims get at least one
  * order of magnitude of LOCAL scaling evidence (VERDICT r7 #1).
  *
  * Usage: `runMain graft.tools.GenData <outDir> [mult] [tables]` —
  * mult scales row counts relative to sf1 (default 1.0 → lineitem ≈
  * 6 M rows, documents 50 k, embeddings 20 k; 10× the driver's
  * sf0.1). Optional `tables` is a comma-separated subset to write
  * (e.g. `documents,embeddings` for the sf10 dedup/ANN fixture —
  * VERDICT r8 #4: the 100× evidence needs only the north-star corpus
  * tables, and skipping lineitem keeps the fixture ~60 M rows
  * smaller). Values remain a pure function of (table, key, mult), so
  * a subset fixture is byte-identical to the same tables of a full
  * one.
  *
  * Design constraints, in order:
  *  - DETERMINISTIC: every value is a pure function of (table, key)
  *    via xxhash64 — no RNG state, no driver loops; re-running
  *    reproduces the fixture VALUE-identically (measured r18: row
  *    set and every column hash equal across regenerations; the
  *    parquet container bytes may differ in page/row-group layout,
  *    so consumers must key on values — which the staged-artifact
  *    fingerprint's size/mtime/stripe sampling treats as a changed
  *    source, costing one index rebuild after a regeneration, the
  *    conservative direction).
  *  - DISTRIBUTED: built from `spark.range` + column expressions
  *    (codegen'd, zero shuffles except lineitem's explode) — the
  *    generator itself is the shape you'd run to synthesize 100 TB.
  *  - SCHEMA-FAITHFUL to FIXTURES.md: same column names, int widths,
  *    ms-timestamps (TIMESTAMP_MILLIS writer), value domains, FK
  *    integrity (lineitem explodes FROM orders, so zero orphans by
  *    construction), documents' planted duplication structure (exact
  *    dups ~0.16%, 60-char shared-prefix groups ~10% of docs), and
  *    L2-normalized near-isotropic embeddings (weak label tilt,
  *    planted cos ≈ 0.9 twin pairs at 1 per 250 vectors).
  *
  * One deliberate divergence: the driver writes `events.ts` as parquet
  * TIMESTAMP(NANOS), which Spark cannot WRITE. We store raw int64
  * nanos instead — `Tables.load` consumes both identically (under
  * nanosAsLong the driver's column already ARRIVES as long nanos),
  * and `tools/oracle_check.py` builds the DuckDB events view with the
  * same ns→µs truncation when it sees the int64 form.
  */
object GenData {

  /** 31-word DB-flavored vocabulary (driver fixture uses a same-sized
    * small vocabulary — TF-IDF/langid/perplexity keys need realistic
    * collision rates, not uniqueness). */
  val Vocab: Seq[String] = Seq(
    "query", "plan", "scan", "filter", "join", "shuffle", "batch",
    "stream", "row", "column", "table", "index", "spark", "vector",
    "window", "merge", "sort", "hash", "cache", "disk", "memory",
    "node", "task", "stage", "executor", "driver", "schema", "parquet",
    "string", "value", "fast")

  private val DayS = 86400L
  private val Epoch1995 = 788918400L         // 1995-01-01 UTC, seconds
  private val Epoch2024Ns = 1704067200L * 1000000000L // 2024-01-01 UTC, ns

  /** Non-negative deterministic hash of (seed, cols...). */
  private def h(seed: String, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: cols): _*), lit(Long.MaxValue))

  /** Uniform double in [0, 1) with ~1e-9 grain, full mantissa kept
    * downstream (driver fixtures are NOT 2dp-rounded). */
  private def u01(seed: String, cols: Column*): Column =
    pmod(xxhash64((lit(seed) +: cols): _*), lit(1000000000L)).cast("double") / 1e9

  private def pick(seed: String, values: Seq[String], cols: Column*): Column =
    element_at(array(values.map(lit): _*),
      pmod(xxhash64((lit(seed) +: cols): _*), lit(values.size)).cast("int") + 1)

  /** The special-geometry fixtures (FIXTURES.md) as (mult, tables,
    * embGeo) generation specs — each a pure deterministic function of
    * these args, so the parquet bytes need not live in git history
    * (ADVICE r17 #5: the 52 MB mog10 fixture was committed; it is now
    * generated on first use). */
  val SpecialFixtures: Map[String, (Double, Set[String], String)] = Map(
    "mog1"    -> (1.0, Set("embeddings"), "mog:64:80"),
    "mog1w"   -> (1.0, Set("embeddings"), "mog:64:120"),
    "mog10"   -> (10.0, Set("embeddings"), "mog:64:120"),
    // r19: the next half-decade for the k ∝ N gate rule — 400 k
    // vectors, same clustered geometry as the 200 k law fixture
    "mog20"   -> (20.0, Set("embeddings"), "mog:64:120"),
    "bpewide" -> (1.0, Set("bpewide"), "iso"))

  /** Generate a [[SpecialFixtures]] dir on first use, under the same
    * check-lock-recheck discipline as the staged artifacts (the lock
    * lives under the gitignored layout root, never in testdata): a
    * second JVM racing the cold generation waits and reuses. Validity
    * is spec-aware, not mere existence (ADVICE r18 #4): a
    * `_FIXTURE_SPEC` sentinel beside the table records the
    * (mult, tables, geo) the dir was generated with, so a re-dialed
    * SpecialFixtures entry regenerates instead of silently serving the
    * OLD geometry — the exact staleness class every staged artifact's
    * sentinel already closes. Value-identity across regenerations of
    * the SAME spec is the generator's own determinism guarantee (see
    * the DETERMINISTIC note above: container bytes may differ). */
  def ensure(spark: SparkSession, dir: String): Unit = {
    val f = new java.io.File(dir)
    SpecialFixtures.get(f.getName).foreach { case (mult, tables, geo) =>
      val table = if (tables.contains("bpewide")) "documents" else "embeddings"
      val spec = s"mult=$mult tables=${tables.toSeq.sorted.mkString(",")} geo=$geo"
      val specFile = new java.io.File(f, "_FIXTURE_SPEC")
      def present = new java.io.File(f, s"$table.parquet").exists &&
        scala.util.Try(java.nio.file.Files.readString(specFile.toPath))
          .toOption.contains(spec)
      if (!present) {
        val lockDir = new java.io.File(graft.queries.Layout.layoutRoot)
        java.nio.file.Files.createDirectories(lockDir.toPath)
        val lock = new java.io.File(lockDir, s"fixture_${f.getName}.lock")
        graft.api.StagedArtifact.withProcessLock(lock) {
          if (!present) {
            println(s"[gendata] regenerating fixture ${f.getName} ($spec)")
            // drop a stale sentinel first so a crash mid-generation
            // cannot leave new-spec metadata over old-spec tables
            specFile.delete()
            generate(spark, f.getPath, mult, Some(tables), geo)
            java.nio.file.Files.writeString(specFile.toPath, spec)
          }
        }
      }
    }
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("testdata/sf1")
    val mult = if (args.length > 1) args(1).toDouble else 1.0
    val only: Option[Set[String]] =
      if (args.length > 2) Some(args(2).split(",").map(_.trim).toSet) else None
    // Embedding geometry (r16, VERDICT r15 missing #1): "iso" (default,
    // the driver-parity near-isotropic geometry below — the documented
    // PQ worst case) or "mog:<k>:<spreadPct>" — a mixture of k Gaussians
    // (well, uniform balls — same second-moment math): per-dim cluster
    // center ±1.0 plus per-dim vector noise ±spreadPct/100, then
    // L2-normalized. Expected intra-cluster cos ≈ 1/(1+s²) (uniform
    // variance ratio), so "mog:64:80" ⇒ ~0.61 — the clustered geometry
    // real text embeddings exhibit, which the ANN recall story must be
    // measured on, not just the isotropic floor. Same determinism rule
    // as everything else: a pure function of (vec_id, geometry args).
    val embGeo = args.lift(3).getOrElse("iso")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-gendata")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    generate(spark, out, mult, only, embGeo)
    spark.stop()
    println(s"[gendata] complete: $out (mult=$mult)")
  }

  /** The generation body, callable from a host session ([[ensure]])
    * as well as [[main]]. The ms-timestamp writer type is scoped to
    * the call (set + restored), so output bytes do not depend on the
    * host session's config. */
  def generate(spark: SparkSession, out: String, mult: Double,
               only: Option[Set[String]], embGeo: String): Unit = {
    // driver fixtures carry ms timestamps; match the physical type
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val prevTs = spark.conf.getOption(tsKey)
    spark.conf.set(tsKey, "TIMESTAMP_MILLIS")
    try generateBody(spark, out, mult, only, embGeo)
    finally prevTs match {
      case Some(v) => spark.conf.set(tsKey, v)
      case None => spark.conf.unset(tsKey)
    }
  }

  private def generateBody(spark: SparkSession, out: String, mult: Double,
                           only: Option[Set[String]], embGeo: String): Unit = {
    def n(base: Long): Long = math.max(1L, (base * mult).toLong)
    val nCust = n(150000); val nSupp = n(10000); val nPart = n(200000)
    val nOrd = n(1500000); val nEvt = n(1000000); val nDoc = n(50000)
    val nEmb = n(20000); val nUser = n(15000)

    // Driver-layout parity: each table is ONE parquet file named
    // <table>.parquet, rows sorted by the table's key. Two reasons:
    // (a) the streaming keys read events/documents via a file-stream
    //     source with pathGlobFilter=<table>.parquet — a DIRECTORY of
    //     part files matches zero leaves and silently streams nothing
    //     (found at sf1, r8);
    // (b) key-sorted single files give byte-deterministic output and
    //     an arrival order that matches event time, which watermarked
    //     replays require exactly like the driver fixture provides.
    // Columns are computed in parallel upstream; only the final sort+
    // write is single-task (seconds at sf1). Parquet files are
    // row-group-splittable, so scan parallelism is unaffected.
    def write(name: String, df: DataFrame, key: String): Unit = {
      if (only.exists(!_.contains(name))) return
      writeFile(name, df, key)
    }
    // ungated single-file writer — the bpewide pseudo-table writes
    // under the STANDARD documents.parquet name in its own out dir
    def writeFile(name: String, df: DataFrame, key: String): Unit = {
      val tmp = s"$out/_tmp_$name"
      df.repartition(1).sortWithinPartitions(col(key))
        .write.mode(SaveMode.Overwrite).parquet(tmp)
      val tmpDir = new java.io.File(tmp)
      val part = tmpDir.listFiles().filter(_.getName.endsWith(".parquet")) match {
        case Array(one) => one
        case other => sys.error(s"expected 1 part file for $name, got ${other.length}")
      }
      def rmrf(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rmrf)
        f.delete()
      }
      rmrf(new java.io.File(s"$out/$name.parquet")) // stale dir from a prior layout
      java.nio.file.Files.move(part.toPath,
        java.nio.file.Paths.get(s"$out/$name.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
      tmpDir.listFiles().foreach(_.delete()); tmpDir.delete()
      println(s"[gendata] $name written")
    }

    import spark.implicits._

    // region / nation: fixed small dims, driver-identical names
    write("region", Seq((0, "AFRICA"), (1, "AMERICA"), (2, "ASIA"),
      (3, "EUROPE"), (4, "MIDDLE EAST")).toDF("r_regionkey", "r_name"), "r_regionkey")
    write("nation", (0 until 25).map(i => (i, s"NATION_$i", i % 5))
      .toDF("n_nationkey", "n_name", "n_regionkey"), "n_nationkey")

    write("customer", spark.range(nCust).toDF("c_custkey")
      .withColumn("c_name", format_string("Customer#%09d", col("c_custkey")))
      .withColumn("c_nationkey", pmod(h("cnat", col("c_custkey")), lit(25)).cast("int"))
      .withColumn("c_acctbal", round(lit(-1000.0) + u01("cbal", col("c_custkey")) * 11000.0, 6))
      .withColumn("c_mktsegment", pick("cseg", Seq("AUTOMOBILE", "BUILDING",
        "FURNITURE", "HOUSEHOLD", "MACHINERY"), col("c_custkey"))), "c_custkey")

    write("supplier", spark.range(nSupp).toDF("s_suppkey")
      .withColumn("s_name", format_string("Supplier#%09d", col("s_suppkey")))
      .withColumn("s_nationkey", pmod(h("snat", col("s_suppkey")), lit(25)).cast("int"))
      .withColumn("s_acctbal", round(lit(-1000.0) + u01("sbal", col("s_suppkey")) * 11000.0, 6)), "s_suppkey")

    write("part", spark.range(nPart).toDF("p_partkey")
      .withColumn("p_name", concat_ws(" ",
        pick("pn1", Seq("small", "large", "bright", "dark", "round", "flat",
          "heavy", "light"), col("p_partkey")),
        pick("pn2", Seq("ring", "box", "rod", "plate", "tube", "cap",
          "disk", "wire"), col("p_partkey"))))
      .withColumn("p_brand", concat(lit("Brand#"),
        (pmod(h("pbr", col("p_partkey")), lit(25)) + 1).cast("int")))
      .withColumn("p_type", pick("pty", Seq("ECONOMY", "LARGE", "MEDIUM",
        "PROMO", "SMALL", "STANDARD"), col("p_partkey")))
      .withColumn("p_size", (pmod(h("psz", col("p_partkey")), lit(50)) + 1).cast("int"))
      .withColumn("p_retailprice", round(lit(900.0) + u01("prp", col("p_partkey")) * 99.9, 2)), "p_partkey")

    val orders = spark.range(nOrd).toDF("o_orderkey")
      .withColumn("o_custkey", pmod(h("ocust", col("o_orderkey")), lit(nCust)))
      .withColumn("o_orderstatus", pick("ost", Seq("F", "O", "P"), col("o_orderkey")))
      // money columns are exact 2 dp (driver parity — lets the decimal
      // accumulation keys cast them losslessly)
      .withColumn("o_totalprice", round(lit(1000.0) + u01("otp", col("o_orderkey")) * 499000.0, 2))
      .withColumn("o_orderdate", timestamp_seconds(
        lit(Epoch1995) + pmod(h("oda", col("o_orderkey")), lit(2404L)) * DayS))
      .withColumn("o_orderpriority", pick("opr", Seq("1-URGENT", "2-HIGH",
        "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"), col("o_orderkey")))
    write("orders", orders, "o_orderkey")

    // lineitem explodes FROM orders: FK integrity by construction,
    // 1..7 lines per order (mean 4 — the driver's measured shape)
    val li = orders.select(col("o_orderkey").as("l_orderkey"))
      .withColumn("l_linenumber", explode(sequence(lit(1),
        (pmod(h("nl", col("l_orderkey")), lit(7)) + 1).cast("int"))))
    val lkey = Seq(col("l_orderkey"), col("l_linenumber"))
    write("lineitem", li
      .withColumn("l_partkey", pmod(h("lpk", lkey: _*), lit(nPart)))
      .withColumn("l_suppkey", pmod(h("lsk", lkey: _*), lit(nSupp)))
      .withColumn("l_quantity", (pmod(h("lqt", lkey: _*), lit(50)) + 1).cast("double"))
      .withColumn("l_extendedprice", round(lit(900.0) + u01("lep", lkey: _*) * 104100.0, 2))
      .withColumn("l_discount", pmod(h("ldc", lkey: _*), lit(11)).cast("double") / 100.0)
      .withColumn("l_tax", pmod(h("ltx", lkey: _*), lit(9)).cast("double") / 100.0)
      .withColumn("l_returnflag", pick("lrf", Seq("A", "N", "R"), lkey: _*))
      .withColumn("l_linestatus", pick("lls", Seq("F", "O"), lkey: _*))
      .withColumn("l_shipdate", timestamp_seconds(
        lit(Epoch1995 + DayS) + pmod(h("lsd", lkey: _*), lit(2498L)) * DayS)), "l_orderkey")

    // events: ts is raw int64 nanos (see scaladoc) with genuine
    // sub-microsecond jitter so the ns→µs truncation path is LIVE.
    // ts is MONOTONE in event_id (driver parity: corr ≈ 0.999995) —
    // the file-stream replays in file order, so arrival order must
    // track event time or every watermarked key drops the whole
    // stream as late data (found at sf1, r8): each event gets its own
    // [i·step, (i+1)·step) nanosecond slot with in-slot jitter.
    write("events", spark.range(nEvt).toDF("event_id")
      .withColumn("ts", lit(Epoch2024Ns) +
        col("event_id") * lit(29L * DayS * 1000000000L / nEvt) +
        pmod(h("ets", col("event_id")), lit(29L * DayS * 1000000000L / nEvt)))
      .withColumn("user_id", pmod(h("eus", col("event_id")), lit(nUser)))
      .withColumn("event_type", pick("ety", Seq("click", "error", "purchase",
        "signup", "view"), col("event_id")))
      .withColumn("value", round(u01("evl", col("event_id")) * 560.0, 6))
      .withColumn("props", concat(lit("{\"k\": "),
        pmod(h("epr", col("event_id")), lit(100)), lit("}"))), "event_id")

    // documents: planted duplication structure (FIXTURES.md) —
    //  - exact dups: ids ≡ 0 (mod 625), id > 0, clone the full row of
    //    id−1 (gid indirection) → ~80 dup pairs at sf1
    //  - shared prefixes: 10% of gids take their first 12 words from
    //    their 40-block key → ~1250 groups of ~4 sharing ≥60 chars
    //  - embedded dups: ids ≡ 300 (mod 2500), id > 0, append the FULL
    //    text of doc id−7 → ~20 containment pairs at sf1 (victim ids
    //    ≡ 293 mod 2500 never hit the 625-clone rule, so the victim's
    //    own text is always its gid text)
    //  - Zipf tail: each word position has a 3% chance of drawing a
    //    long-tail type `t<k>`, k < 4·nDoc (hapax-heavy — df 1-3),
    //    instead of the 31-word head. The head-only first cut made
    //    EVERY 3-gram's df ≈ 150 at sf1 (31³ ≈ 30k types vs 4.6 M
    //    instances — the gram space saturates), which silently turned
    //    rare-gram blocking (q_dedup_containment) into a no-op; real
    //    corpora are Zipf with an unbounded hapax tail, and the tail
    //    layer restores that property at every mult. Tail draws key on
    //    the same prefix/body strings as head draws, so prefix groups
    //    and exact clones still share text verbatim.
    val vocabArr = array(Vocab.map(lit): _*)
    val tailN = math.max(31L, 4L * nDoc)
    // word at position d for a (g, fx, k) = (gid, inpfx, pk) triple —
    // used twice: own text and the embedded victim's text
    def words(g: String, fx: String, k: String, len: String): String =
      s"""transform(sequence(0, $len - 1), d ->
         |  case when pmod(xxhash64(concat('zt',
         |      case when $fx and d < 12
         |           then concat('p', cast($k as string), '_', cast(d as string))
         |           else concat('w', cast($g as string), '_', cast(d as string))
         |      end)), 100) < 3
         |  then concat('t', cast(pmod(xxhash64(concat('tw',
         |      case when $fx and d < 12
         |           then concat('p', cast($k as string), '_', cast(d as string))
         |           else concat('w', cast($g as string), '_', cast(d as string))
         |      end)), $tailN) as string))
         |  else element_at(vocab_arr, cast(pmod(xxhash64(
         |      case when $fx and d < 12
         |           then concat('p', cast($k as string), '_', cast(d as string))
         |           else concat('w', cast($g as string), '_', cast(d as string))
         |      end), 31) + 1 as int)) end)""".stripMargin
    write("documents", spark.range(nDoc).toDF("doc_id")
      .withColumn("gid", when(col("doc_id") > 0 &&
        pmod(col("doc_id"), lit(625)) === 0, col("doc_id") - 1).otherwise(col("doc_id")))
      .withColumn("inpfx", pmod(col("gid"), lit(20)) < 2)
      .withColumn("pk", (col("gid") / 40).cast("long"))
      .withColumn("len", (pmod(h("dlen", col("gid")), lit(91)) + 10).cast("int"))
      // embedded-dup layer: victim columns derived from doc_id−7
      .withColumn("isctn", col("doc_id") > 0 && pmod(col("doc_id"), lit(2500)) === 300)
      .withColumn("vgid", col("doc_id") - 7)
      .withColumn("vfx", pmod(col("vgid"), lit(20)) < 2)
      .withColumn("vpk", (col("vgid") / 40).cast("long"))
      .withColumn("vlen", (pmod(h("dlen", col("vgid")), lit(91)) + 10).cast("int"))
      .withColumn("vocab_arr", vocabArr)
      .withColumn("text", expr(
        s"""concat_ws(' ', case when isctn
           |  then concat(${words("gid", "inpfx", "pk", "len")},
           |              ${words("vgid", "vfx", "vpk", "vlen")})
           |  else ${words("gid", "inpfx", "pk", "len")} end)""".stripMargin))
      .withColumn("lang",
        when(pmod(h("dlng", col("gid")), lit(100)) < 41, "en")
          .when(pmod(h("dlng", col("gid")), lit(100)) < 56, "de")
          .when(pmod(h("dlng", col("gid")), lit(100)) < 71, "es")
          .when(pmod(h("dlng", col("gid")), lit(100)) < 86, "fr")
          .otherwise("zh"))
      .withColumn("source", concat(lit("src"), pmod(h("dsrc", col("gid")), lit(20))))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .select("doc_id", "text", "lang", "source", "n_chars"), "doc_id")

    // embeddings: near-isotropic noise + WEAK label tilt, matching the
    // driver geometry (measured at sf0.1: intra-label mean cos ≈
    // 0.001, pair-cos std ≈ 1/√dims, frac(cos ≥ 0.4) ≈ 5.6e-4 — the
    // loose-τ dedup answer is the NOISE TAIL, not cluster structure),
    // then L2-normalized so cosine ≡ dot product. On top: a LINEAR
    // planted near-dup layer — vec_id ≡ 1 (mod 250) redraws its base
    // noise from vec_id−1, landing the pair at cos ≈ 0.90 (80 pairs at
    // sf1) — the wide-band scale-path target (BASELINE.md §sf1).
    // r8 fix, caught by the scaling sweep: the first cut made label
    // centers DOMINANT (intra-label cos ≈ 0.92), so every intra-label
    // pair passed τ = 0.4 and the declared answer itself exploded
    // quadratically to 20 M rows (151 s at sf1) — an unfaithful twin.
    // Per-dim magnitudes: center ±0.1, base noise ±1, perturb ±0.33
    // (variance ratio ⇒ twin cos ≈ 0.336/0.373 ≈ 0.90, intra-label
    // non-twin cos ≈ 0.009).
    val embBase = embGeo.split(":") match {
      case Array("iso") =>
        spark.range(nEmb).toDF("vec_id")
          .withColumn("base", when(pmod(col("vec_id"), lit(250)) === 1,
            col("vec_id") - 1).otherwise(col("vec_id")))
          .withColumn("label", pmod(h("elb", col("base")), lit(10)).cast("int"))
          .withColumn("raw", expr(
            """transform(sequence(0, 63), d ->
              |  (cast(pmod(xxhash64(concat('c', cast(label as string), '_', cast(d as string))), 601) as double) - 300) / 3000.0
              |  + (cast(pmod(xxhash64(concat('n', cast(base as string), '_', cast(d as string))), 2001) as double) - 1000) / 1000.0
              |  + (cast(pmod(xxhash64(concat('p', cast(vec_id as string), '_', cast(d as string))), 661) as double) - 330) / 1000.0)""".stripMargin))
      case Array("mog", k, spreadPct) =>
        // clustered geometry: dominant per-cluster center + per-vector
        // noise scaled by spread; label keeps the 10-value domain
        // (cluster mod 10) so every embeddings consumer sees the same
        // schema and value domain as the iso fixture
        val s = spreadPct.toInt
        spark.range(nEmb).toDF("vec_id")
          .withColumn("cluster", pmod(h("mgc", col("vec_id")), lit(k.toInt)).cast("int"))
          .withColumn("label", pmod(col("cluster"), lit(10)).cast("int"))
          .withColumn("raw", expr(
            s"""transform(sequence(0, 63), d ->
               |  (cast(pmod(xxhash64(concat('mc', cast(cluster as string), '_', cast(d as string))), 2001) as double) - 1000) / 1000.0
               |  + (cast(pmod(xxhash64(concat('mn', cast(vec_id as string), '_', cast(d as string))), 2001) as double) - 1000) * ${s}d / 100000.0)""".stripMargin))
      case other => sys.error(s"unknown embGeo '$embGeo' (iso | mog:<k>:<spreadPct>)")
    }
    write("embeddings", embBase
      .withColumn("nrm", expr("sqrt(aggregate(raw, 0d, (a, x) -> a + x * x))"))
      .withColumn("embedding", expr("transform(raw, x -> cast(x / nrm as float))"))
      .select("vec_id", "embedding", "label"), "vec_id")

    // r16 (VERDICT r15 missing #3): wide-symbol BPE corpus, requested
    // as pseudo-table "bpewide", written under the STANDARD
    // documents.parquet name (point the out dir at a dedicated
    // fixture). The driver-parity corpus draws from a 31-word ASCII
    // vocabulary, which caps the batched BPE learner's symbol-disjoint
    // anti-chain at ~4–6 selections/round no matter the batch dial —
    // this corpus draws word TYPES over a 512-codepoint alphabet
    // (U+0100–U+02FF: Latin Extended A/B + IPA, all BMP letters) so
    // the top-B candidate pairs are mostly symbol-disjoint and the
    // batch-128/256 dials actually exercise. Same documents schema and
    // determinism rule (pure function of doc_id and the fixed seeds).
    if (only.exists(_.contains("bpewide"))) {
      val nTypes = math.max(1000L, (100000L * mult).toLong)
      val alpha = (0x100 until 0x300).map(cp => new String(Character.toChars(cp)))
      // word type wt(doc,d) ∈ [0, nTypes); its string is 6–15 symbols
      // keyed on (wt, position) so a type spells identically everywhere
      val wt = s"pmod(xxhash64('bwt', doc_id, d), ${nTypes}L)"
      writeFile("documents", spark.range(nDoc).toDF("doc_id")
        .withColumn("len", (pmod(h("blen", col("doc_id")), lit(91)) + 10).cast("int"))
        .withColumn("alpha_arr", array(alpha.map(lit): _*))
        .withColumn("text", expr(
          s"""concat_ws(' ', transform(sequence(0, len - 1), d ->
             |  concat_ws('', transform(
             |    sequence(0, cast(pmod(xxhash64('bwl', $wt), 10) + 5 as int)),
             |    p -> element_at(alpha_arr,
             |      cast(pmod(xxhash64('bws', $wt, p), ${alpha.size}) + 1 as int))))))""".stripMargin))
        .withColumn("lang", lit("xx"))
        .withColumn("source", lit("bpewide"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .select("doc_id", "text", "lang", "source", "n_chars"), "doc_id")
    }
  }
}
