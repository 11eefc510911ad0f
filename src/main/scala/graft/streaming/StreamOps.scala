package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** Structured Streaming operators over `events`-shaped input
  * (SURVEY.md §2.4-I). Every transform takes an unbounded DataFrame
  * from any `readStream` source (tests feed MemoryStream; production
  * would use Kafka/files) and returns the transformed streaming frame
  * — source/sink wiring stays at the edge, the ops compose.
  *
  * DuckDB cannot verify streams, so these are ⛔ keys: each op's test
  * oracle is its batch equivalent (the seeded tumbling/sessionize
  * queries) replayed through MemoryStream, including out-of-order
  * delivery within the watermark (StreamingSpec).
  *
  * Scale notes: all stateful ops key their state by (window) or
  * (user_id) — state is partitioned by the shuffle like any groupBy,
  * and the watermark bounds state size; without it tumbling state
  * grows with #windows forever. flatMapGroupsWithState keeps one
  * session accumulator per user; timeouts evict.
  */
object StreamOps {

  /** Tumbling 1-hour counts with a 10-minute watermark; late rows
    * beyond the watermark are dropped, in-watermark disorder is
    * absorbed. Append mode emits only finalized windows. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
      .select(col("window.start").as("h"), col("event_type"), col("n"), col("sv"))

  /** Sliding 1-hour windows every 15 minutes. */
  def slidingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"))

  /** Session windows with a 30-minute gap, native session_window. */
  def sessionCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("session_window.start").as("ss"),
        col("session_window.end").as("se"), col("user_id"), col("n"))

  /** Stream-stream interval join: each purchase joins the same user's
    * clicks from the preceding hour. Both sides carry watermarks and
    * the join has a time-range constraint, so state on each side is
    * bounded (Spark evicts rows older than watermark + interval). */
  def clickToPurchase(clicks: DataFrame, purchases: DataFrame,
                      watermark: String = "10 minutes"): DataFrame = {
    val c = clicks.select(col("user_id").as("c_user"), col("ts").as("c_ts"),
      col("event_id").as("click_id")).withWatermark("c_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user"), col("ts").as("p_ts"),
      col("event_id").as("purchase_id")).withWatermark("p_ts", watermark)
    p.join(c,
      col("p_user") === col("c_user") &&
      col("c_ts") >= col("p_ts") - expr("INTERVAL 1 HOUR") &&
      col("c_ts") <= col("p_ts"))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        col("p_ts"), col("c_ts"))
  }

  /** Stateful exact dedup on event_id within the watermark. */
  def dedupWithinWatermark(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")

  // --- arbitrary stateful processing -----------------------------------

  case class Ev(event_id: Long, ts: Timestamp, user_id: Long,
                event_type: String, value: Double)
  case class SessionAcc(count: Long, lastTsMicros: Long)
  case class UserSessions(user_id: Long, sessions: Long)

  /** Per-user session counting via flatMapGroupsWithState — the
    * arbitrary-state re-implementation of the batch lag+cumsum
    * sessionize (its test oracle). Emits a running snapshot per user
    * on every trigger (Update mode). */
  def sessionizeStateful(events: Dataset[Ev], gapMinutes: Long = 30): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionAcc, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (userId: Long, rows: Iterator[Ev], state: GroupState[SessionAcc]) =>
          // rows within a trigger batch are not ordered; sort this
          // micro-batch (bounded memory: one user's batch slice)
          val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var acc = state.getOption.getOrElse(SessionAcc(0L, Long.MinValue))
          sorted.foreach { e =>
            val tsMicros = e.ts.getTime * 1000L
            val newSession = acc.lastTsMicros == Long.MinValue ||
              (tsMicros - acc.lastTsMicros) > gapMicros
            acc = SessionAcc(acc.count + (if (newSession) 1 else 0), tsMicros)
          }
          state.update(acc)
          Iterator.single(UserSessions(userId, acc.count))
      }
  }

  /** Convenience: run any of the above on a bounded replay of the
    * events parquet via a one-shot streaming-style pipeline. Used by
    * specs; not a declared t2 key. */
  def replayBatch(spark: SparkSession, sfDir: String): DataFrame =
    graft.Tables.events(spark, sfDir)

  private val runSeq = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Test seam (r20, VERDICT r19 wrong #5): the bounded replay runners
    * disable no-data micro-batches (rationale at the runners), and the
    * safety argument — "no declared stream key's SINK can differ, only
    * state cleanup" — lived in prose alone: a future append-mode
    * watermark key would silently emit nothing under the replay
    * runners. NoDataBatchSpec now executes the invariant by flipping
    * this override to the engine default and comparing every declared
    * stream key's rows both ways. Production code never sets it. */
  @volatile private[graft] var noDataBatchesForTest: Option[String] = None

  private def noDataBatchesConf: (String, String) =
    "spark.sql.streaming.noDataMicroBatches.enabled" ->
      noDataBatchesForTest.getOrElse("false")

  /** Run `body` with `spark.sql.shuffle.partitions` temporarily set to
    * `n`. Stateful streaming operators allocate one state-store
    * instance per shuffle partition per stateful operator (a
    * stream-stream join keeps FOUR per partition), and the store
    * lifecycle — open, checkpoint, commit, close — dominates a bounded
    * single-batch replay: at 32 partitions q_stream_join spent ~6 s in
    * store management for a 2k×2k join. The scope must cover the WHOLE
    * replay (start → awaitTermination): the first micro-batch plans
    * asynchronously after `start()` returns, so restoring the conf
    * early races the state-store layout — observed as a bimodal
    * 2.2 s / 7.2 s stream-join bench before the callers were widened
    * ([[runToMemorySink]] keeps every caller inside the scope by
    * construction). At production scale the right value is sized to
    * state volume (state partitions ≫ cores), not to this
    * bounded-replay optimum. */
  // State-store maintenance stays at the DEFAULT 60 s interval:
  // disabling it (1h) was measured and is WORSE — the maintenance task
  // also unloads providers whose query stopped, so back-to-back
  // replays accumulate stopped queries' in-heap state maps (7.7 → 8.2
  // → 14.2 s across three KeyBench passes); firing it every 500 ms
  // adds its own jitter (spread 0.56–1.70 s). The measured variance
  // source was checkpoint fsync on a disk-backed /tmp — see
  // [[runToMemorySink]]'s tmpfs checkpoint (r17, VERDICT r16 wrong #2).
  private def withShufflePartitions[T](spark: SparkSession, n: Int)(body: => T): T =
    withConfs(spark, "spark.sql.shuffle.partitions" -> n.toString)(body)

  /** Scoped session-conf override (restores or unsets on exit). */
  private[graft] def withConfs[T](spark: SparkSession,
                                  confs: (String, String)*)(body: => T): T = {
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  /** Execute a bounded replay of `stream` into a memory sink and
    * return the sink table: Trigger.AvailableNow, awaitTermination
    * held INSIDE the shuffle-partition scope (the conf-race rationale
    * lives once, on [[withShufflePartitions]] — ADVICE r6 deduped the
    * five inline copies of it).
    *
    * Checkpoint on tmpfs (r17, VERDICT r16 wrong #2): every micro-
    * batch commit fsyncs offset/commit/state-delta files, and the
    * default temp checkpoint lands on a DISK-backed /tmp — on this
    * box's VM disk that fsync latency was q_stream_join_ordered's
    * 1.95 s quiet-ref spread (9 pinned micro-batches × 2 stateful ops;
    * every other key's spread ≤ 0.5 s). A bounded replay's checkpoint
    * is temp-and-deleted by construction — durability buys it nothing
    * — so it goes to /dev/shm when present (deleted in the same
    * finally as the query stop). A production deployment points its
    * LONG-RUNNING query at durable storage and sizes the commit
    * interval to amortize exactly this cost. */
  private def runToMemorySink(spark: SparkSession, stream: Dataset[_],
      sinkName: String, mode: String, partitions: Int): DataFrame = {
    val shm = new java.io.File("/dev/shm")
    val ckpt =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, "graft_ckpt_")
      else java.nio.file.Files.createTempDirectory("graft_ckpt_")
    def purge(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(purge)); f.delete()
    }
    try {
      // No-data micro-batches OFF for bounded replays (r19, guide §1/§2
      // "remove work outright"): after the data batches, the engine
      // fires an extra empty batch purely to let watermark-driven
      // operators emit/evict — a full offset-log + state-commit cycle
      // that, at this fixture scale, costs as much as a data batch
      // (~0.1–0.8 s/key measured A/B across the 11 declared keys).
      // Every declared stream key emits its rows in the DATA batch
      // (complete-mode aggs re-emit the whole table each batch;
      // stateless append, inner stream-stream joins and update-mode
      // fMGWS emit on arrival), so the empty batch can only change
      // STATE CLEANUP, never the sink table — re-verified 11/11 oracle
      // MATCH at sf0.001/0.01/0.1. A production query that relies on
      // watermark-triggered APPEND emission (windowed agg in append
      // mode, dropDuplicatesWithinWatermark eviction) must keep the
      // default; this scope covers only the bounded replay runners.
      withConfs(spark,
        "spark.sql.shuffle.partitions" -> partitions.toString,
        noDataBatchesConf) {
        val q = stream.writeStream.format("memory").queryName(sinkName)
          .outputMode(mode)
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
    } finally purge(ckpt.toFile)
    spark.table(sinkName)
  }

  /** Execute a bounded replay of `stream` into a PARQUET file sink and
    * return a batch reader over the sink directory (r19, VERDICT r18
    * next #5). The memory sink materializes EVERY emitted row on the
    * driver heap — exactly what a production deployment replaces with
    * a file/queue sink, and what OOMed q_stream_neardup's sf10 row
    * (millions of pairs) while the parquet-sink instrument
    * (tools.StreamNeardupScale) replayed the identical query
    * comfortably. This sink keeps the replay distributed at every SF:
    * executors write parquet parts, the driver holds nothing, and the
    * returned frame reads the files through the sink's _spark_metadata
    * commit log (exactly-once by construction).
    *
    * Lifecycle: the returned frame is LAZY, so the sink dir cannot be
    * purged in a finally like the checkpoint — it must outlive this
    * call by an unknowable span. Dirs are therefore (a) on tmpfs when
    * available (same rationale as the checkpoint — a bounded replay's
    * sink is temp-by-construction), (b) named by owning pid, and
    * (c) self-cleaning: each call sweeps sibling dirs whose owning
    * process is gone, so no run leaks more than one JVM's worth of
    * bounded replay output past that JVM's lifetime. */
  private def runToParquetSink(spark: SparkSession, stream: Dataset[_],
      partitions: Int): DataFrame = {
    val shm = new java.io.File("/dev/shm")
    val base =
      if (shm.isDirectory && shm.canWrite) new java.io.File(shm, "graft_stream_sink")
      else new java.io.File(System.getProperty("java.io.tmpdir"), "graft_stream_sink")
    java.nio.file.Files.createDirectories(base.toPath)
    def purge(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(purge)); f.delete()
    }
    // sweep dead owners' sink dirs (pid parsed from the dir name; a
    // pid that no longer resolves to a live process has no lazy
    // frame left that could read the dir)
    val self = ProcessHandle.current().pid
    val Named = """p(\d+)_\d+""".r
    Option(base.listFiles()).getOrElse(Array.empty).foreach { d =>
      d.getName match {
        case Named(pid) if pid.toLong != self &&
            !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false) =>
          purge(d)
        case _ =>
      }
    }
    val out = new java.io.File(base, s"p${self}_${runSeq.incrementAndGet()}")
    val ckpt =
      if (shm.isDirectory && shm.canWrite)
        java.nio.file.Files.createTempDirectory(shm.toPath, "graft_ckpt_")
      else java.nio.file.Files.createTempDirectory("graft_ckpt_")
    try {
      // no-data micro-batches off — same rationale and same measured
      // A/B evidence as runToMemorySink (the parquet-sink replays are
      // stateless-append by construction, the safest case)
      withConfs(spark,
        "spark.sql.shuffle.partitions" -> partitions.toString,
        noDataBatchesConf) {
        // the parquet sink supports APPEND only — which is the mode
        // every stateless ingestion query runs anyway
        val q = stream.writeStream.format("parquet")
          .option("path", out.getPath)
          .outputMode("append")
          .option("checkpointLocation", ckpt.toString)
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        try q.awaitTermination() finally q.stop()
      }
    } finally purge(ckpt.toFile)
    // explicit schema: a replay that emitted zero rows leaves a dir
    // whose schema could not be inferred from files alone
    spark.read.schema(stream.schema).parquet(out.getPath)
  }

  /** Streaming file source over the fixture's events parquet with the
    * explicit schema every streaming source needs. The physical `ts`
    * layout varies by fixture generation (ns-as-long vs µs NTZ — the
    * full story is in [[graft.Tables]]'s scaladoc), and a streaming
    * source cannot schema-infer, so we peek the batch footer once at
    * plan time and build the matching schema + normalization, exactly
    * as `Tables.load` does for batch reads. */
  private def eventsStream(spark: org.apache.spark.sql.SparkSession, sfDir: String) = {
    import org.apache.spark.sql.types._
    // layout dispatch + normalization live ONCE, in Tables (ADVICE r8:
    // this method used to carry a second copy that could drift); the
    // footer peek costs one batch read per q_stream_* call, plan-time.
    val tsType = graft.Tables.tsPhysicalType(spark, sfDir)
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", tsType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    graft.Tables.normalizeTs(
      spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sfDir),
      tsType)
  }

  /** DECLARED streaming key (t2-verified): streaming benchmark
    * DECONTAMINATION — the bloom-accelerated exact semi-join
    * (GraftOps.bloomSemiJoin) applied to a documents STREAM against
    * the static benchmark gram set. Composition of the two scale
    * primitives: the bloom map rides the broadcast into every
    * micro-batch (stream-static, stateless at the join), non-matching
    * stream grams die map-side, the exact confirm join keeps the
    * answer exact, and only the per-doc counts hold state
    * (complete-mode agg). This is how online ingestion keeps eval
    * data out of a training corpus; the oracle is the batch
    * decontamination SQL. */
  def qStreamDecontam(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val sinkName = s"graft_stream_decontam_${runSeq.incrementAndGet()}"
    val docsBatch = graft.Tables.documents(spark, sfDir)
    val bench = graft.api.GraftOps
      .wordShingles(docsBatch.filter(col("doc_id") < 5), "doc_id", "text")
      .select(col("gram")).distinct()
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .filter(col("doc_id") >= 5)
    val grams = graft.api.GraftOps.wordShingles(stream, "doc_id", "text")
    runToMemorySink(spark,
      graft.api.GraftOps.bloomSemiJoin(grams, bench, "gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_shared")),
      sinkName, "complete", partitions = 4)
      .orderBy(col("n_shared").desc, col("doc_id"))
  }

  /** DECLARED streaming key (r13, t2-verified): INGESTION-TIME
    * QUALITY FILTERING — the streaming half of q_quality_linear.
    * Each arriving document scores STATELESSLY per row: the hashed
    * linear model's integer weight is a deterministic expression of
    * the token, so the whole dot product fuses into one SQL
    * `aggregate` lambda — no join, no shuffle, no state store, and
    * APPEND mode (which would reject any stateful aggregation at
    * analysis time — running at all is the statelessness proof).
    * A trained model swaps the fused expression for a stream-static
    * broadcast join against the (bucket, weight) table: equally
    * stateless, same plan shape as qStreamAssign's model broadcast.
    * The per-doc sum is the SAME exact bigint as the batch key's, so
    * the oracle IS q_quality_linear's SQL. */
  def qStreamQuality(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    val sinkName = s"graft_stream_quality_${runSeq.incrementAndGet()}"
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
    // one codegen'd expression per row: the interpreted SQL lambda
    // spelling (two md5s per token through the higher-order-function
    // path) measured 41 s at sf10 vs 11.9 s for graft_hashed_swi
    // (the rest is replay + sink floor, SCALE.md §stream quality) —
    // QualityLinearSpec pins expression ≡ lambda on both eval paths
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    // null text: the batch key's explode(split(text)) DROPS the doc
    // and the oracle's unnest emits no row — null-propagating the
    // expression would instead emit a null-score row and break the
    // stream ≡ batch ≡ oracle equality (r13 self-review)
    val scored = stream.filter(col("text").isNotNull).select(
      col("doc_id"),
      expr("graft_hashed_swi(text)").as("swi"),
      size(split(col("text"), " ")).cast("long").as("n_tok"))
      .select(col("doc_id"),
        round(expr("1.0 / (1.0 + exp(-(swi / (1000.0 * n_tok))))"), 4)
          .as("score"),
        col("n_tok"))
      .withColumn("keep", col("score") >= 0.5)
    runToMemorySink(spark, scored, sinkName, "append", partitions = 4)
      .orderBy(col("doc_id"))
  }

  /** DECLARED streaming key (r10, t2-verified): INGESTION-TIME
    * NEAR-DUP DETECTION — the streaming half of the MinHash+LSH
    * dedup. The static side is the batch corpus's signature table
    * (4 minhashes/doc, checkpointed once) with the same over-cap
    * band-key guards as q_dedup_minhash; each ARRIVING document
    * computes its own 4-minhash signature STATELESSLY (per-row
    * `array_min(transform(shingles, …))` — no explode, no streaming
    * aggregation) and probes the two band indexes with stateless
    * stream-static equi joins. Exactly-once pair emission without
    * any state store: a pair {a, b} surfaces only when its SMALLER
    * member arrives (stream doc < static doc), and cross-band
    * duplicates die on the same map-side band-1-keys-differ
    * predicate (+ over-cap escape) as the batch key. This is how
    * production ingestion rejects near-dups against an indexed
    * corpus without re-running corpus×corpus dedup; the streamed
    * pair set equals the batch one exactly, so the oracle IS
    * q_dedup_minhash's SQL. */
  def qStreamNeardup(spark: SparkSession, sfDir: String): DataFrame = {
    // PARQUET sink (r19, was memory through r18): the memory sink
    // materialized every emitted pair on the driver heap — fine
    // through sf1 (~10 k pairs) but OOM at sf10's millions, which left
    // that row a documented skip while tools.StreamNeardupScale
    // verified the identical query through a parquet sink. The
    // declared key now IS the parquet-sink shape — the sink a
    // production ingestion pipeline runs — so the replay stays
    // distributed at every SF and the sf10 sweep verifies this key
    // directly. Emitted rows are identical (the sink only changes
    // where they land), so the oracle is untouched.
    runToParquetSink(spark, streamNeardupPairs(spark, sfDir), partitions = 4)
      .orderBy(col("jacc_est").desc, col("doc_a"), col("doc_b"))
      .limit(200)
  }

  /** The streaming near-dup pair frame (un-sunk): shared by the
    * declared memory-sink key and the parquet-sink scale instrument. */
  private[graft] def streamNeardupPairs(
      spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    import graft.queries.DedupOps.{MinhashP, MinhashPerms, hx, jaccEstCol}
    graft.catalyst.GraftFunctions.ensureRegistered(spark)

    // static: corpus signatures + over-cap band keys (tiny by the
    // ≤ N/cap argument — they ride broadcasts). r19: the signatures
    // come from the PERSISTED index (DedupOps.minhashIndex — the same
    // store the incremental key and the curation pipeline read)
    // instead of re-hashing the corpus per execution: the scaladoc's
    // own production story ("probing the static band index") made
    // literal. Signatures are text-pure, so the probed pair set
    // cannot move — StreamingSpec pins streamed ≡ batch pair-set
    // equality across this seam.
    // localCheckpoint: the store is 4 longs/doc, but as a bare parquet
    // relation the static side is re-listed and re-planned inside
    // EVERY micro-batch (4 consumers — measured ~0.5 s slower than the
    // old in-memory signature frame); pinning it in memory keeps the
    // old downstream shape with only the signature computation skipped.
    val mh = graft.queries.DedupOps.minhashIndex(spark, sfDir)
      .localCheckpoint(true)
    // r20: BOTH bands' over-cap key sets in ONE aggregate + ONE
    // checkpoint (was one groupBy job + one checkpoint job per band —
    // two fixed-cost jobs per execution for two tiny, broadcast-bound
    // frames). The exploded (band, k1, k2) union shuffles the same
    // 2·N key rows the two separate aggregates did; per-band counts —
    // and therefore the capped key sets — are identical by
    // construction, so the probed pair set cannot move (StreamingSpec
    // pins streamed ≡ batch across this seam).
    val bigBoth = mh.select(explode(array(
        struct(lit(1).as("band"), col("mh1").as("k1"), col("mh2").as("k2")),
        struct(lit(2).as("band"), col("mh3").as("k1"), col("mh4").as("k2")))).as("bk"))
      .groupBy(col("bk.band").as("band"), col("bk.k1").as("big_k1"),
        col("bk.k2").as("big_k2"))
      .agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") > graft.queries.DedupOps.MaxBandBucket)
      .select(col("band"), col("big_k1"), col("big_k2"))
      .localCheckpoint(true)
    val big1 = bigBoth.filter(col("band") === 1).drop("band")
    val big2 = bigBoth.filter(col("band") === 2).drop("band")
    def statCapped(big: DataFrame, k1: String, k2: String) = mh
      .join(broadcast(big),
        col(k1) === col("big_k1") && col(k2) === col("big_k2"), "left_anti")
      .select(col("doc_id").as("b_doc"), col("mh1").as("b_mh1"),
        col("mh2").as("b_mh2"), col("mh3").as("b_mh3"), col("mh4").as("b_mh4"))

    // stream: per-row signature — the same shingle-hash min as the
    // batch explode+groupBy spelling (same value set → same min;
    // shingle-less docs yield null minhashes and can never equi-match,
    // exactly like their absence from the batch signature table)
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    // the SAME permutation family as the batch signatures, imported
    // from DedupOps so the two spellings cannot drift (r10 review)
    val hsExpr = s"transform(graft_word_shingles(text, 3), s -> ${hx("s")})"
    val mhCols = MinhashPerms.zipWithIndex.map { case ((a, b), i) =>
      expr(s"array_min(transform(__hs, h -> (h * $a + $b) % $MinhashP))")
        .as(s"s_mh${i + 1}") }
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "documents.parquet")
      .parquet(sfDir)
      .withColumn("__hs", expr(hsExpr))
      .select(col("doc_id").as("s_doc") +: mhCols: _*)
    def streamCapped(big: DataFrame, k1: String, k2: String) = stream
      .join(broadcast(big),
        col(k1) === col("big_k1") && col(k2) === col("big_k2"), "left_anti")

    val pairCols = Seq(
      col("s_doc").as("doc_a"), col("b_doc").as("doc_b"),
      jaccEstCol("s_", "b_").as("jacc_est"))
    val band1 = streamCapped(big1, "s_mh1", "s_mh2")
      .join(statCapped(big1, "mh1", "mh2"),
        col("s_mh1") === col("b_mh1") && col("s_mh2") === col("b_mh2") &&
        col("s_doc") < col("b_doc"))
      .select(pairCols: _*)
    val band2 = streamCapped(big2, "s_mh3", "s_mh4")
      .join(statCapped(big2, "mh3", "mh4"),
        col("s_mh3") === col("b_mh3") && col("s_mh4") === col("b_mh4") &&
        col("s_doc") < col("b_doc"))
      .join(broadcast(big1.withColumn("__b1cap", lit(true))),
        col("s_mh1") === col("big_k1") && col("s_mh2") === col("big_k2"), "left")
      .filter(col("s_mh1") =!= col("b_mh1") || col("s_mh2") =!= col("b_mh2") ||
        coalesce(col("__b1cap"), lit(false)))
      .select(pairCols: _*)

    band1.unionAll(band2).filter(col("jacc_est") >= 0.5)
  }

  /** DECLARED streaming key (r10, t2-verified): ONLINE IVF-CELL
    * ASSIGNMENT — the serving half of the k-means quantizer. The model
    * (k = 8, 2 Lloyd rounds — exactly q_kmeans_build's) is trained on
    * the BATCH embeddings table, folded into the one-row
    * [[graft.api.GraftOps.centroidArray]] frame, and joined
    * (stream-static broadcast on a constant key, stateless) onto a
    * STREAM of the same vectors; each arriving vector gets its cell
    * from the codegen'd [[graft.api.GraftOps.cellColumn]] argmin, and
    * a complete-mode count/min per cell snapshots the partition. This
    * is how production ingestion routes new embeddings into an IVF
    * index without re-clustering; determinism: assignment is the
    * build's own metric, so the streamed partition equals the batch
    * one and the oracle is q_kmeans_build's (same unrolled-Lloyd
    * CTEs, same audit projection). State is k rows — the watermark
    * story is trivial because the join itself is stateless. */
  def qStreamAssign(spark: SparkSession, sfDir: String): DataFrame = {
    import org.apache.spark.sql.types._
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val sinkName = s"graft_stream_assign_${runSeq.incrementAndGet()}"
    // r16: the serving model comes from the PERSISTED IVF index — the
    // SAME (k=8, iters=2) artifact the batch search key reads
    // (VectorOps.ivfIndex / StagedArtifact), which is the production
    // serving shape: train offline once, broadcast the stored
    // centroids to the stream. Values are bit-identical to the
    // in-session build (IvfIndexSpec), so the oracle cannot move.
    val (cent, _) = graft.queries.VectorOps.ivfIndex(spark, sfDir, k = 8, iters = 2)
    val model = graft.api.GraftOps.centroidArray(cent).withColumn("__one", lit(1))
    val schema = StructType(Seq(
      StructField("vec_id", LongType), StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType)))
    val stream = spark.readStream.schema(schema)
      .option("pathGlobFilter", "embeddings.parquet")
      .parquet(sfDir)
    runToMemorySink(spark,
      stream.withColumn("__one", lit(1))
        .join(broadcast(model), "__one")
        .withColumn("cell", graft.api.GraftOps.cellColumn("embedding"))
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n"), min(col("vec_id")).as("rep")),
      sinkName, "complete", partitions = 4)
      .orderBy(col("cell"))
  }

  /** DECLARED streaming key (t2-verified): the SLIDING window
    * aggregation (1 h window, 15 min slide — each event lands in 4
    * overlapping windows) as a real Structured Streaming query,
    * COMPLETE-mode memory sink, Trigger.AvailableNow. Same
    * batch-equivalence argument as [[qStreamTumbling]]; the oracle is
    * the same SQL as q_events_sliding (the explicit 4-shift union). */
  def qStreamSliding(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_sliding_${runSeq.incrementAndGet()}"
    runToMemorySink(spark,
      eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .select(col("window.start").as("ws"), col("event_type"), col("n"), col("sv")),
      sinkName, "complete", partitions = 4)
      .orderBy(col("ws"), col("event_type"))
      .limit(300)
  }

  /** DECLARED streaming key (t2-verified): STATEFUL streaming dedup —
    * `dropDuplicates` on the (user_id, event_type) key columns keeps
    * one state-store entry per key and emits each key once, in APPEND
    * mode. Only the KEY COLUMNS are selected before the dedup, so the
    * emitted row set is exactly the distinct key set — deterministic
    * regardless of which physical duplicate wins the state race — and
    * the oracle is a plain SELECT DISTINCT. (The watermarked variant,
    * dropDuplicatesWithinWatermark, is unit-tested in StreamingSpec;
    * state there is evictable, which a bounded replay can't show.) */
  def qStreamDedup(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_dedup_${runSeq.incrementAndGet()}"
    runToMemorySink(spark,
      eventsStream(spark, sfDir)
        .select(col("user_id"), col("event_type"))
        .dropDuplicates("user_id", "event_type"),
      sinkName, "append", partitions = 4)
      .orderBy(col("user_id"), col("event_type"))
      .limit(500)
  }

  /** DECLARED streaming key (t2-verified): the tumbling aggregation
    * executed as a real Structured Streaming query — file source over
    * the events parquet, Trigger.AvailableNow, COMPLETE-mode memory
    * sink (complete mode emits every window each trigger, so the final
    * table equals the batch aggregate regardless of how the source
    * splits batches — no watermark/sentinel dance needed for a bounded
    * replay). Returns the sink table ordered like the batch twin; the
    * oracle is the same SQL as q_events_tumbling. */
  def qStreamTumbling(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_tumbling_${runSeq.incrementAndGet()}"
    runToMemorySink(spark,
      eventsStream(spark, sfDir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv"))
        .select(col("window.start").as("h"), col("event_type"), col("n"), col("sv")),
      sinkName, "complete", partitions = 4)
      .orderBy(col("h"), col("event_type"))
      .limit(200)
  }

  /** DECLARED streaming key (t2-verified): the stream-stream interval
    * join [[clickToPurchase]] executed as a real Structured Streaming
    * query — ONE file source over the events parquet split into two
    * filtered branches (Spark plans two scans of the same stream),
    * APPEND-mode memory sink, Trigger.AvailableNow. An inner
    * stream-stream join emits matches in the micro-batch that finds
    * them (the watermark only bounds join state for eviction), so the
    * bounded single-file replay yields exactly the batch join — the
    * oracle is the equivalent epoch-µs interval self-join. */
  def qStreamJoin(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_join_${runSeq.incrementAndGet()}"
    val src = eventsStream(spark, sfDir)
    // 2 partitions: a stream-stream join materializes FOUR state
    // stores per partition per side, and store commit latency
    // dominates this one-micro-batch bounded replay (7.4→2.3 s going
    // 32→4 in r5; measured r6: 2 ≈ 4 at ~2.2 s, 1 is WORSE at 2.7 s —
    // the remaining cost is query lifecycle, not store count)
    runToMemorySink(spark,
      clickToPurchase(
        src.filter(col("event_type") === "click"),
        src.filter(col("event_type") === "purchase")),
      sinkName, "append", partitions = 2)
      .orderBy(col("purchase_id"), col("click_id"))
      .limit(300)
  }

  /** DECLARED streaming key (r14, VERDICT r13 #6): the SAME interval
    * join as [[qStreamJoin]], fed the PRODUCTION way — event-time-
    * ordered micro-batches instead of the one-shot replay. The events
    * slice into [[StreamJoinOrderedFiles]] time-contiguous files (ts
    * is monotone in event_id, so event_id ranges ARE time ranges)
    * staged with explicit, strictly increasing modification times —
    * FileStreamSource orders discovery by mod time, so no sleeps are
    * needed (the StreamJoinScale instrument slept 1.1 s/file; a
    * declared key cannot) — and `maxFilesPerTrigger = 1` makes each
    * file one micro-batch. The watermark then ADVANCES between
    * batches and evicts matched state, so steady-state store size is
    * bounded by event rate × (watermark + interval),
    * corpus-size-INDEPENDENT — the state plateau StreamJoinScale
    * measured (254 k rows flat vs the replay's 4 M at sf10). Nothing
    * is ever late (file order = event-time order), so the emitted row
    * set equals the batch interval join exactly and the oracle is
    * [[qStreamJoin]]'s verbatim.
    *
    * Staging lands under Layout.layoutRoot keyed by fixture (basename
    * + canonical-path hash, so equal basenames never collide) and is
    * PERSISTENTLY memoized across JVMs via
    * [[graft.api.StagedArtifact.publishDir]] (r18 — the stream feed
    * rides the same versioned staging primitive as the index
    * artifacts): a `_STAGED` sentinel (canonical fixture path, slice
    * count, content-aware source fingerprint — in-place regeneration
    * invalidates) marks the complete staging inside an immutable
    * `_v<hash8>` version dir, cold staging runs under the family
    * build LEASE (a contended second stager waits and reuses instead
    * of paying a duplicate build), publish is one atomic rename, and
    * a regeneration publishes a NEW version dir — a JVM mid-replay on
    * the superseded one keeps valid paths for a full publish cycle
    * (reader grace; the r14–r17 designs each narrowed but never
    * closed that purge-under-reader window). Verify's fresh JVM on a
    * fresh checkout covers the cold staging; bench warm runs measure
    * only the streaming replay. The staging is the bounded-fixture
    * stand-in for a real arriving stream; a production deployment
    * points the same query at its landing directory and stages
    * nothing. */
  def qStreamJoinOrdered(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_join_ord_${runSeq.incrementAndGet()}"
    val nFiles = StreamJoinOrderedFiles
    val canonical = new java.io.File(sfDir).getCanonicalPath
    // staging key = basename (readability) + canonical-path hash
    // (uniqueness): two fixtures sharing a directory NAME must never
    // share a staging dir — with basename-only keying, each JVM saw
    // the other's sentinel as stale and purged batches the sibling
    // was mid-replay on (ADVICE r14 #1)
    val pathKey = java.security.MessageDigest.getInstance("MD5")
      .digest(canonical.getBytes("UTF-8")).take(4)
      .map(b => f"$b%02x").mkString
    val srcDir = new java.io.File(
      s"${graft.queries.Layout.layoutRoot}/${new java.io.File(sfDir).getName}" +
        s"/stream_join_slices_$pathKey")
    val evRoot = new java.io.File(sfDir, "events.parquet")
    // fail fast on a mis-pointed sfDir: StagedArtifact.fingerprint
    // (content-aware, r17 — shared with the index artifacts) errors on
    // a missing or empty source rather than fingerprinting NOTHING and
    // validating against any other missing source (ADVICE r15 #4)
    require(evRoot.exists,
      s"events.parquet missing under $sfDir — cannot fingerprint the stream source")
    val evFp = graft.api.StagedArtifact.fingerprint(evRoot)
    val sentinelBody = s"$canonical n=$nFiles fp=$evFp"
    def ev = graft.Tables.events(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"))
      .filter(col("event_type").isin("click", "purchase"))
    val schema = ev.schema
    // r18: staged via StagedArtifact.publishDir — the stream feed now
    // rides the SAME versioned-publish discipline as the index
    // artifacts: build lease (the r15–r17 flat staging built first and
    // locked second, so two contended cold stagers paid duplicate
    // builds — now the second waits and reuses), atomic rename into an
    // immutable `_v<hash8>` dir, and reader grace (a fixture
    // regeneration publishes a NEW version; a JVM mid-replay on the
    // old one keeps valid paths until the family's next publish,
    // closing the last in-place-purge surface ADVICE r14 #1 family).
    val published = graft.api.StagedArtifact.publishDir(srcDir, sentinelBody) { tmp =>
      // no checkpoint: the nFiles+1 staging reads each re-scan the
      // 4-column pushed-down parquet projection — cheap, runs once
      // per fixture EVER (the sentinel), and leaves no storage-memory
      // pin behind (an eager localCheckpoint's blocks outlive the
      // staging with no clean Dataset-level release — r14 review #2)
      val maxId = ev.agg(max(col("event_id"))).head().getLong(0)
      val step = maxId / nFiles + 1
      val base = System.currentTimeMillis() - (nFiles + 1) * 2000L
      def rmrf(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rmrf)); f.delete()
      }
      (0 until nFiles).foreach { i =>
        val slice = new java.io.File(tmp, s"__slice_$i")
        ev.filter(col("event_id") >= i * step && col("event_id") < (i + 1) * step)
          .coalesce(1).write.mode("overwrite").parquet(slice.getPath)
        // move the single part file up under an explicit mod time:
        // discovery order = event-time order
        val part = slice.listFiles().filter(_.getName.endsWith(".parquet")).head
        val dst = new java.io.File(tmp, f"batch_$i%03d.parquet")
        java.nio.file.Files.move(part.toPath, dst.toPath)
        java.nio.file.Files.setLastModifiedTime(dst.toPath,
          java.nio.file.attribute.FileTime.fromMillis(base + i * 2000L))
        rmrf(slice)
      }
    }
    val src = spark.readStream.schema(schema)
      .option("pathGlobFilter", "batch_*.parquet")
      .option("maxFilesPerTrigger", "1")
      .parquet(published.getPath)
    // Interpreted expression evaluation for THIS multi-batch replay
    // (r20, VERDICT r19 next #3 — attack the micro-batch floor within
    // the rules). Measured: the advancing watermark embeds a NEW
    // timestamp literal in every micro-batch's state/eviction
    // predicates, so each of the 8 batches misses the codegen cache
    // and pays fresh janino compiles — pure fixed cost at the
    // fixture's 10 k-row batches (StreamBatchProfile: addBatch ~480 ms
    // of a ~700 ms batch, with per-row work in the milliseconds).
    // A/B/A ×7 reps: 4.75/4.77 min interpreted vs 5.24/5.62 baseline
    // (−0.5…−0.8 s, the only dial of five measured that moved it;
    // minDeltasForSnapshot and maxBatchesToRetainInMemory were
    // neutral). Scoped HERE and not in the shared runners because the
    // single-batch replays amortize one compile in warmup and their
    // per-row work (shingle/minhash expressions) WANTS codegen —
    // measured: q_stream_join erratic, q_stream_neardup flat-to-worse
    // under the same confs. Production (real batch sizes) keeps the
    // default — the compile amortizes over rows — so the dial is
    // env-overridable (`GRAFT_STREAM_ORDERED_CODEGEN=default`).
    // Results cannot move: interpreted and codegen'd evaluation are
    // semantically identical by contract, re-pinned by the 11/11
    // stream oracle MATCH at three SFs and StreamingSpec.
    val interpretedReplay =
      !sys.env.get("GRAFT_STREAM_ORDERED_CODEGEN").contains("default")
    val codegenConfs: Seq[(String, String)] =
      if (interpretedReplay)
        Seq("spark.sql.codegen.wholeStage" -> "false",
            "spark.sql.codegen.factoryMode" -> "NO_CODEGEN")
      else Seq.empty
    withConfs(spark, codegenConfs: _*) {
      runToMemorySink(spark,
        clickToPurchase(
          src.filter(col("event_type") === "click"),
          src.filter(col("event_type") === "purchase")),
        sinkName, "append", partitions = 2)
    }
      .orderBy(col("purchase_id"), col("click_id"))
      .limit(300)
  }

  /** Micro-batch count for [[qStreamJoinOrdered]] — 8, not the
    * instrument's 16: each micro-batch pays a fixed offset-log +
    * state-checkpoint commit (~1 s at fixture scale, the
    * bounded-replay floor per batch), so batch count is pure fixed
    * cost here; 8 advancing-watermark batches demonstrate the same
    * eviction plateau (state is bounded per batch either way) at half
    * the overhead. Production tunes trigger size to latency, not to
    * this floor. */
  private val StreamJoinOrderedFiles = 8

  /** DECLARED streaming key (t2-verified): stream-STATIC enrichment —
    * the events stream joined to the static customer dimension and
    * aggregated per (market segment, event type) in COMPLETE mode.
    * This is the standard streaming-enrichment shape at scale: the
    * stream-static join is STATELESS (no watermark, no state store —
    * each micro-batch joins against the dimension snapshot), the
    * dimension side broadcasts, and the stream never shuffles before
    * the aggregation. The oracle is the equivalent batch join+agg. */
  def qStreamEnrich(spark: SparkSession, sfDir: String): DataFrame = {
    val sinkName = s"graft_stream_enrich_${runSeq.incrementAndGet()}"
    val cust = graft.Tables.customer(spark, sfDir)
      .select(col("c_custkey"), col("c_mktsegment"))
    runToMemorySink(spark,
      eventsStream(spark, sfDir)
        .join(broadcast(cust), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"), col("event_type"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sv")),
      sinkName, "complete", partitions = 4)
      .orderBy(col("c_mktsegment"), col("event_type"))
  }

  /** DECLARED streaming key (t2-verified): per-user session counts via
    * [[sessionizeStateful]] (flatMapGroupsWithState) executed as a real
    * Structured Streaming query — file source over the events parquet,
    * Trigger.AvailableNow, UPDATE-mode memory sink. The sink holds one
    * running snapshot per user per trigger; the session count is
    * nondecreasing, so max(sessions) per user is the final state and
    * the result equals the batch lag+cumsum sessionize — the oracle is
    * the same SQL as q_events_sessionize. The single-file source makes
    * the bounded replay one micro-batch, so the in-batch sort inside
    * the state function sees each user's full history in order. */
  def qStreamSessionize(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val sinkName = s"graft_stream_sessionize_${runSeq.incrementAndGet()}"
    val src = eventsStream(spark, sfDir)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Ev]
    runToMemorySink(spark, sessionizeStateful(src),
      sinkName, "update", partitions = 4)
      .groupBy(col("user_id"))
      .agg(max(col("sessions")).as("sessions"))
      .orderBy(col("sessions").desc, col("user_id"))
      .limit(50)
  }
}
