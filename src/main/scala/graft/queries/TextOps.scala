package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators over the `documents` table (SURVEY.md
  * §2.4-H + the LLM-pipeline north star): tokenization/word count,
  * TF-IDF, corpus profiling, token counting, quality scoring,
  * heuristic language ID, and content fingerprinting.
  *
  * Scale notes: every key is explode → groupBy (one shuffle, partial
  * aggregation map-side). Token explosion multiplies rows by ~100
  * (tokens/doc) BEFORE the shuffle — at 100 TB, project doc_id+token
  * only (done here via column pruning) and pre-aggregate per input
  * split. Nothing here collects to the driver.
  */
object TextOps {

  private def docs(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)

  /** Tokenize + global word count, top 100. */
  def qTextWordcount(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(explode(split(col("text"), " ")).as("word"))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("word"))
      .limit(100)

  /** Head-vocabulary size for [[qTextTfidf]]'s broadcast df split —
    * the [[graft.api.GraftOps.unigramCrossEntropy]] convention: 1024
    * words ≈ the Zipf mass at any corpus scale (the head's SHARE only
    * grows with corpus size), a few tens of KB broadcast. */
  private[graft] val TfidfHeadK = 1024

  /** TF-IDF: top-5 terms per language. tf = term count within the
    * language; df = docs containing the term; idf = ln(N/df). Ranked
    * on the ROUNDED score so cross-engine ordering is stable.
    *
    * r11 (VERDICT r10 #5): the tf⋈df join splits on the Zipf
    * head/tail exactly like [[graft.api.GraftOps.unigramCrossEntropy]]
    * — the top-[[TfidfHeadK]] words by df BROADCAST and resolve
    * map-side on top of tf's own aggregate output (at corpus scale
    * the head IS the Zipf mass: those words appear in every language
    * partition, so they are precisely the hot join keys), and only
    * tail-word tf rows reach the shuffle join against the tail df
    * table. Same arithmetic on the same integers → hash-identical
    * output; PlanSpec pins the broadcast. */
  def qTextTfidf(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // explode ONCE into a per-(doc, word) base aggregate; both tf and
    // df derive from it — at corpus scale the token stream is the
    // dominant volume and must not be materialized twice. widened:
    // the explosion would otherwise run on the narrow scan's 1-2
    // tasks (GraftOps.widened).
    val base = graft.api.GraftOps.widened(d, "doc_id")
      .select(col("lang"), col("doc_id"),
        explode(split(col("text"), " ")).as("word"))
      .groupBy(col("lang"), col("doc_id"), col("word"))
      .agg(count(lit(1)).as("c"))
    val tf = base.groupBy(col("lang"), col("word")).agg(sum(col("c")).as("tf"))
    // NOT checkpointed (unlike unigramCrossEntropy's counts): dfw's
    // two consumers AND tf all hang off base's one Exchange, which
    // ReuseExchange dedups — a checkpoint here severs that reuse and
    // re-runs the token explosion (measured: sf10 4.2 → 6.0 s).
    val dfw = base.groupBy(col("word")).agg(count(lit(1)).as("df"))
    // deterministic head: ties broken on the word itself
    val headDf = dfw.orderBy(col("df").desc, col("word").asc).limit(TfidfHeadK)
    val probed = tf.join(broadcast(headDf), Seq("word"), "left")
    val headHit = probed.filter(col("df").isNotNull)
    val tailHit = probed.filter(col("df").isNull).drop("df")
      .join(dfw, Seq("word")) // tail words only ever reach this shuffle
    val nd = d.agg(count(lit(1)).as("nd"))
    val scored = headHit.unionByName(tailHit)
      .crossJoin(broadcast(nd))
      .withColumn("tfidf",
        round(col("tf") * log(col("nd").cast("double") / col("df")), 4))
    val w = Window.partitionBy(col("lang")).orderBy(col("tfidf").desc, col("word"))
    scored.withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("lang"), col("word"), col("tfidf"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  /** Corpus profile per (lang, source): doc count, char-length stats,
    * mean token count. */
  def qTextProfile(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(col("lang"), col("source"))
      .agg(
        count(lit(1)).as("n"),
        round(avg(col("n_chars")), 2).as("avg_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"),
        round(avg(size(split(col("text"), " ")).cast("double")), 2).as("avg_toks"))
      .orderBy(col("lang"), col("source"))

  /** Token counting three ways: whitespace split, regex word match,
    * and a BPE-ish greedy ≤4-char chunking — plus mean word length. */
  def qTextTokens(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"), col("n_chars"),
        size(split(col("text"), " ")).as("n_ws"),
        expr("regexp_count(text, '[a-z]+')").as("n_words"),
        expr("regexp_count(text, '[a-z]{1,4}')").as("n_bpe"),
        round(length(regexp_replace(col("text"), " ", "")) /
          size(split(col("text"), " ")).cast("double"), 4).as("avg_wlen"))
      .orderBy(col("doc_id"))
      .limit(300)

  /** The composite-quality ingredients, single-sourced (r10 review:
    * qDedupKeep's survivor rule re-spelled this arithmetic; a drift
    * in either copy would break its oracle contract silently). `t` is
    * the whitespace token array; both ratios round to 4 dp before the
    * product re-rounds — the exact q_text_quality oracle arithmetic. */
  private[graft] val QualityStopwords = Seq("the", "a", "of", "and", "to", "in")
  private[graft] def ttrCol(t: Column): Column =
    round(size(array_distinct(t)) / size(t).cast("double"), 4)
  private[graft] def stopRatioCol(t: Column): Column =
    round(size(filter(t, w => w.isin(QualityStopwords.map(lit): _*))) /
      size(t).cast("double"), 4)
  private[graft] def qualityScoreCol(t: Column): Column =
    round(ttrCol(t) * (lit(1.0) - stopRatioCol(t)), 4)

  /** Quality scoring: type-token ratio, stopword ratio, short-doc
    * flag, and a composite score. */
  def qTextQuality(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .withColumn("t", split(col("text"), " "))
      .select(
        col("doc_id"),
        size(col("t")).as("n_tok"),
        ttrCol(col("t")).as("ttr"),
        stopRatioCol(col("t")).as("stop_ratio"),
        (col("n_chars") < 100).as("short_flag"))
      .withColumn("score", round(col("ttr") * (lit(1.0) - col("stop_ratio")), 4))
      .orderBy(col("doc_id"))
      .limit(300)

  /** Gopher-style rule filter (Rae et al. 2021, public): the
    * pre-model quality gate of MassiveText-lineage pipelines. Every
    * signal is an INTEGER (token count, character sum, alphabetic and
    * stop-word token counts) and every rule compares integers —
    * mean-word-length bounds spell as cross-multiplications
    * (3n ≤ csum ≤ 10n), the alphabetic-ratio floor as 5·n_alpha ≥
    * 4·n_tok — so the key is rounding-hazard-free across engines by
    * construction (the r13 determinism rule applied at birth). One
    * corpus pass, explode + conditional sums (codegen'd), partial
    * aggregation map-side; the per-doc collapse is the only shuffle.
    * widened (r14, VERDICT r13): the explode + per-token rlike ran
    * serially off the single-row-group fixture scan — the same narrow
    * head stage its siblings (langid, bigrams) were guarded against
    * at r9; no-op at real scale where the scan is already wide. */
  def qQualityGopher(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_tok"),
        sum(length(col("tok"))).as("csum"),
        sum(when(col("tok").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
        sum(when(col("tok").isin("the", "a", "of", "and", "to", "in"), 1L)
          .otherwise(0L)).as("n_stop"))
      .withColumn("keep",
        col("n_tok") >= 30 && col("n_tok") <= 100000 &&
        col("csum") >= col("n_tok") * 3 && col("csum") <= col("n_tok") * 10 &&
        col("n_alpha") * 5 >= col("n_tok") * 4 &&
        col("n_stop") >= 2)
      .orderBy(col("doc_id"))

  /** Heuristic language ID by stopword-family scoring, reported as a
    * (labeled lang × predicted lang) confusion matrix. The synthetic
    * corpus shares one vocabulary across langs, so the prediction is
    * degenerate — the operator shape (per-doc scoring → argmax with a
    * deterministic tie chain → confusion rollup) is what's under test. */
  def qTextLangid(spark: SparkSession, dir: String): DataFrame =
    // explode once + conditional sums (codegen'd) instead of four
    // interpreted list_filter lambdas per doc — ~4× faster at sf0.1,
    // identical counts (every doc has ≥1 token, so no doc is lost).
    // widened (r9): the single-file fixture scans as 1–2 tasks, which
    // serialized the token explosion ahead of the doc-grain shuffle —
    // the steepest text-key scaling at sf10 (8.1× for 10×) until the
    // same guard its sibling qTextBigrams already had was applied.
    graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(col("lang"), col("doc_id"), explode(split(col("text"), " ")).as("w"))
      .groupBy(col("lang"), col("doc_id"))
      .agg(
        sum(when(col("w").isin("the", "a", "of"), 1).otherwise(0)).as("s_en"),
        sum(when(col("w").isin("der", "die", "und"), 1).otherwise(0)).as("s_de"),
        sum(when(col("w").isin("el", "los", "de"), 1).otherwise(0)).as("s_es"),
        sum(when(col("w").isin("le", "les", "et"), 1).otherwise(0)).as("s_fr"))
      .withColumn("pred",
        when(col("s_en") >= greatest(col("s_de"), col("s_es"), col("s_fr")), "en")
          .when(col("s_de") >= greatest(col("s_es"), col("s_fr")), "de")
          .when(col("s_es") >= col("s_fr"), "es")
          .otherwise("fr"))
      .groupBy(col("lang"), col("pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred"))

  /** Token-bigram statistics — n-gram LM preparation: corpus-wide
    * bigram counts with the left-token marginal (counts only; the
    * conditional probability is a client-side division, kept out of
    * the declared result to avoid rounding-boundary classes §2.2-2).
    * The marginal Σ_w2 n(w1,w2) is a window sum over the bigram
    * aggregate — one explode and one shuffle total, instead of a
    * second aggregation over the exploded bigrams plus a join. */
  def qTextBigrams(spark: SparkSession, dir: String): DataFrame = {
    val bi = graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(split(col("text"), " ").as("t"))
      .filter(size(col("t")) >= 2) // descending-sequence guard, see qTextContamination
      .select(explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] as w1, t[i+1] as w2))")).as("b"))
      .select(col("b.w1"), col("b.w2"))
    val counts = bi.groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("n"))
    counts
      .withColumn("n_w1", sum(col("n")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("w1"))))
      .select(col("w1"), col("w2"), col("n"), col("n_w1"))
      .orderBy(col("n").desc, col("w1"), col("w2"))
      .limit(100)
  }

  /** Document chunking: overlapping 20-token windows every 10 tokens —
    * the context-window preprocessing step of a training pipeline.
    * Row expansion ≈ tokens/stride before the shuffle; only (doc_id,
    * start, chunk) is carried. */
  def qTextChunk(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("doc_id") < 100)
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .select(col("doc_id"), col("t"),
        explode(expr("sequence(1, size(t), 10)")).as("s"))
      .select(col("doc_id"), col("s").as("chunk_start"),
        expr("array_join(slice(t, s, 20), ' ')").as("chunk"),
        expr("size(slice(t, s, 20))").as("chunk_toks"))
      .orderBy(col("doc_id"), col("chunk_start"))

  /** Deterministic hash-based sampling (~10%): reproducible, engine-
    * neutral, and cluster-stable — the sampling a 100 TB pipeline can
    * actually re-run (rand()-based sampling is none of those). */
  def qTextSample(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(expr("cast(conv(substring(md5(text),1,4),16,10) as int) % 100 < 10"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("chars"))
      .orderBy(col("lang"))

  /** Stratified (balanced-allocation) sampling: downsample every
    * language stratum toward ~20 docs, deterministically. Two passes:
    * (1) tiny per-stratum counts, broadcast; (2) stateless keep rule
    * `bucket(text) · cnt < 20 · 10⁴` (bucket = 4 hex chars of md5 mod
    * 10⁴, uniform), an exact integer comparison both engines evaluate
    * identically — the per-stratum rate adapts as 20/cnt without any
    * per-stratum ranking. This is the 100 TB shape: a window
    * row_number over (lang) would shuffle the whole corpus into a
    * handful of skewed stratum partitions; the broadcast-rate filter
    * touches each row once, embarrassingly parallel, and only the
    * 5-row count aggregate shuffles. Trade-off (documented, inherent):
    * hash sampling yields ≈N per stratum, not exactly N — binomial
    * noise around 20/cnt · cnt; exact-N needs the rank shuffle. */
  def qSampleStratified(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
    val keep = col("bucket") * col("cnt") < lit(200000L)
    d.select(col("lang"), col("n_chars"),
        expr("cast(conv(substring(md5(text),1,4),16,10) as int) % 10000").as("bucket"))
      .join(broadcast(counts), "lang")
      .groupBy(col("lang"))
      .agg(
        max(col("cnt")).as("n_total"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"),
        sum(when(keep, col("n_chars")).otherwise(0L)).as("kept_chars"))
      .orderBy(col("lang"))
  }

  /** Temperature-based multi-source mixing (τ = 0.5): downsample each
    * language stratum with probability ∝ √cnt_s / cnt_s — the
    * exponent-smoothed rebalancing a multilingual training pipeline
    * uses so head languages stop dominating without flattening the
    * mix entirely (smaller strata keep a larger share than
    * proportional, smaller than uniform). K = 100 target docs total,
    * allocated ∝ √cnt_s.
    *
    * Cross-engine exactness: the naive form computes pow/normalized
    * rates in floating point, where a 1-ulp libm difference at the
    * keep threshold flips rows between engines. Here the weights are
    * integer isqrt(cnt) (floor of the correctly-rounded IEEE sqrt —
    * exact for counts ≪ 2⁵²), W = Σ weights is an integer, and the
    * keep rule `bucket · W · cnt_s < K · w_s · 10⁴` is an exact
    * integer comparison — zero doubles anywhere near a decision
    * boundary. Same two-pass broadcast shape as q_sample_stratified:
    * one tiny count aggregate, one stateless corpus pass. */
  def qSampleTemperature(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("cnt"))
      .withColumn("w", expr("cast(sqrt(cnt) as bigint)"))
    val totalW = counts.agg(sum(col("w")).as("tw"))
    val keep = col("bucket") * col("tw") * col("cnt") < lit(100L) * col("w") * lit(10000L)
    d.select(col("lang"),
        expr("cast(conv(substring(md5(text),1,4),16,10) as int) % 10000").as("bucket"))
      .join(broadcast(counts), "lang")
      .crossJoin(broadcast(totalW))
      .groupBy(col("lang"))
      .agg(
        max(col("cnt")).as("n_total"),
        max(col("w")).as("weight"),
        sum(when(keep, 1L).otherwise(0L)).as("n_kept"))
      .orderBy(col("lang"))
  }

  /** Benchmark decontamination: corpus docs sharing an n-gram with
    * the benchmark set (docs 0–4 as the stand-in) and how many
    * distinct n-grams they share — the overlap report a training
    * pipeline uses to drop contaminated documents before training.
    * n=3 here because the fixture's 31-word vocab makes longer grams
    * unique; production uses 8–13-grams, same plan. Scale shape: the
    * benchmark side is small by definition → its distinct gram set
    * broadcasts; the corpus explodes to (doc, gram) once and hash-
    * joins — no shuffle of the corpus beyond the final count agg. */
  def qTextContamination(spark: SparkSession, dir: String): DataFrame = {
    val g = trigrams(docs(spark, dir))
    val bench = g.filter(col("doc_id") < 5)
      .select(col("gram"), col("doc_id").as("bench_doc")).distinct()
    g.filter(col("doc_id") >= 5)
      .join(broadcast(bench), "gram")
      .groupBy(col("doc_id"), col("bench_doc"))
      .agg(countDistinct(col("gram")).as("shared"))
      .orderBy(col("shared").desc, col("doc_id"), col("bench_doc"))
  }

  /** Distinct word-trigrams per document — shared by the
    * contamination and bloom-decontamination keys (the generic form,
    * incl. the short-doc guard rationale, lives on
    * [[graft.api.GraftOps.wordShingles]]). */
  private def trigrams(d: DataFrame): DataFrame =
    graft.api.GraftOps.wordShingles(d, "doc_id", "text", n = 3)

  /** Bloom-filter decontamination — the 100 TB shape of
    * [[qTextContamination]]: the benchmark set's distinct grams are
    * folded into a 65536-bit Bloom filter (k=2, xxhash64-derived
    * probes) represented as a sparse word→bits MAP in ONE ROW, which
    * broadcasts to the corpus scan; every corpus gram probes the map
    * with two codegen'd lookups and only the surviving sliver reaches
    * the exact confirm join that removes false positives. The final
    * answer is therefore EXACT (bloom errors are one-sided: no false
    * negatives), which is what lets a plain SQL semi-join oracle
    * verify it. At real scale the bloom is O(benchmark grams) bits
    * regardless of corpus size and the corpus token stream is
    * filtered map-side before its only shuffle; DecontamBloomSpec
    * proves candidate-superset + FP-kill on an adversarial fixture. */
  def qDecontamBloom(spark: SparkSession, dir: String): DataFrame = {
    // no checkpoint, deliberately (measured r7): the corpus side flows
    // LINEARLY scan → shingle → prefilter → confirm (one pass), and
    // only the small bench side is consumed twice (bloom build +
    // confirm broadcast) — unlike the minhash self-joins there is no
    // corpus recompute to cut, and eager materialization only added
    // ~0.1 s at sf0.1
    val g = trigrams(docs(spark, dir))
    val bench = g.filter(col("doc_id") < 5).select(col("gram")).distinct()
    val corpus = g.filter(col("doc_id") >= 5)
    graft.api.GraftOps.bloomSemiJoin(corpus, bench, "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_shared")) // per-doc grams pre-distinct'd
      .orderBy(col("n_shared").desc, col("doc_id"))
  }

  /** Unigram language-model scoring: per-document cross-entropy
    * −avg(ln p(w)) under the corpus's own unigram distribution — the
    * cheap "perplexity-ish" quality signal a pipeline computes before
    * it can afford a neural scorer (high xent = surprising/garbled
    * text, low = boilerplate). Two passes over the token stream: one
    * partial-agg shuffle for the count table, then a shuffle join of
    * tokens↔counts on the word key (both sides hash-partition on w;
    * the count table is vocabulary-sized, not corpus-sized) and a
    * per-doc aggregation. Scored on ln directly — no pow() — and
    * rounded at 4dp for cross-engine stability (§2.2). */
  def qTextPerplexity(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.unigramCrossEntropy(docs(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
      .limit(300)

  /** Content fingerprinting: md5, sha-256 prefix, and an order-
    * sensitive polynomial rolling hash over tokens (mod 2^31−1) whose
    * per-token value is derived from md5 so both engines agree. */
  def qTextFingerprint(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .select(
        col("doc_id"),
        md5(col("text")).as("fp_md5"),
        substring(sha2(col("text"), 256), 1, 16).as("fp_sha"),
        expr(
          """aggregate(
            |  transform(split(text, ' '),
            |            w -> cast(conv(substring(md5(w),1,8),16,10) as bigint)),
            |  cast(0 as bigint),
            |  (acc, x) -> (acc * 131 + x) % 2147483647)""".stripMargin).as("fp_poly"))
      .orderBy(col("doc_id"))
      .limit(300)

  /** Gopher-style repetition signals per document — the filter family
    * a training pipeline runs before dedup (Rae et al. 2021, public):
    * most-common-token mass, duplicate bigram/trigram fraction,
    * longest consecutive-token run, and a composite `repetitive`
    * verdict. Everything is per-doc array lambdas — no explode, no
    * token shuffle, embarrassingly parallel at any scale (the whole
    * key is one narrow projection; only the final presentation sort
    * exchanges). The verdict compares exact integer cross-products
    * (top1·5 > n_tok, dup_tri·10 > tri_tot·3) so no rounded double
    * sits on a cross-engine decision boundary (§2.2-2).
    *
    * The run-length trick: run START positions are the indices where
    * t[i] ≠ t[i−1] (out-of-range t[−1] is NULL → the ‘≠’ is NULL →
    * filtered, so position 0 is admitted by the explicit i=0 arm);
    * run lengths are differences of consecutive starts, closed by
    * size(t). The oracle does the same arithmetic 1-indexed. */
  def qTextRepetition(spark: SparkSession, dir: String): DataFrame =
    repetitionSignals(docs(spark, dir))
      .orderBy(col("doc_id"))
      .limit(300)

  /** The signal projection of [[qTextRepetition]] over any (doc_id,
    * text) frame — unsorted, so specs can drive it with synthetic
    * repetitive/short docs the fixture lacks.
    *
    * r15: the five raw statistics come from the codegen'd one-pass
    * [[graft.catalyst.RepStats]] — the previous interpreted-lambda
    * spelling (array_distinct/transform/filter per row, O(n·distinct)
    * for top1) owned 5.5 s of the curation pipeline's sf0.1 quality
    * gate; it never showed in this key's own wall because
    * TakeOrderedAndProject evaluates the projection only on the 300
    * winners. RepStatsSpec pins the expression ≡ the SQL spelling on
    * adversarial inputs; the derived fractions below are unchanged. */
  private[graft] def repetitionSignals(d: DataFrame): DataFrame = {
    graft.catalyst.GraftFunctions.ensureRegistered(d.sparkSession)
    d.withColumn("__rs", expr("graft_rep_stats(text)"))
      .withColumn("n_tok", col("__rs.n_tok"))
      .withColumn("top1", col("__rs.top1"))
      .withColumn("bi_tot", greatest(col("__rs.n_tok") - 1, lit(0)))
      .withColumn("bi_dis", col("__rs.bi_dis"))
      .withColumn("tri_tot", greatest(col("__rs.n_tok") - 2, lit(0)))
      .withColumn("tri_dis", col("__rs.tri_dis"))
      .select(
        col("doc_id"),
        col("n_tok"),
        // all three fractions are round-half-up(10⁴·k/n) computed in
        // EXACT integer arithmetic — floor((2·10⁴·k + n) / (2n)) —
        // then divided by 10⁴.0 (one IEEE op on identical integers).
        // round(k/n, 4) on the double would sit on the §2.2 half-up
        // boundary class for data-dependent denominators (e.g.
        // 57/800: Spark's shortest-repr HALF_UP says .0713, DuckDB's
        // scaled-multiply says .0712); the integer form cannot.
        expr("((20000 * top1 + n_tok) div (2 * n_tok)) / cast(10000 as double)").as("top1_frac"),
        when(col("bi_tot") > 0,
          expr("((20000 * (bi_tot - bi_dis) + bi_tot) div (2 * bi_tot)) / 10000.0"))
          .otherwise(0.0).as("dup_bi_frac"),
        when(col("tri_tot") > 0,
          expr("((20000 * (tri_tot - tri_dis) + tri_tot) div (2 * tri_tot)) / 10000.0"))
          .otherwise(0.0).as("dup_tri_frac"),
        col("__rs.max_run").as("max_run"),
        (col("top1") * 5 > col("n_tok") ||
          (col("tri_tot") - col("tri_dis")) * 10 > col("tri_tot") * 3).as("repetitive"))
  }

  /** Corpus Zipf profile: global term frequencies ranked, with each
    * term's share of the top term's count in exact basis points —
    * (10⁴·n) div n₁, integer division, no float rounding seam. The
    * rank/share curve is the standard corpus-health fingerprint (a
    * natural corpus tracks n ∝ 1/rank; a scraped-boilerplate corpus
    * goes flat). One explode + one map-side-combinable count agg; the
    * ranking window runs over the aggregated VOCABULARY (tiny at any
    * corpus scale), not the token stream. */
  /** BM25 retrieval scoring (r10) — the classic probabilistic ranking
    * function (Robertson/Spärck Jones; the Lucene `ln(1 + (N−df+0.5)/
    * (df+0.5))` idf variant, k1 = 1.2, b = 0.75) of every document
    * against a fixed 3-term query, top-20 by score. The retrieval
    * counterpart of [[qTextTfidf]]'s corpus-level term weights.
    *
    * Scale shape — deliberately the cheapest possible BM25: per-doc
    * term frequencies and length come from per-row array ops on the
    * SPLIT TEXT (`size(filter(...))` — no token explode, no
    * per-(doc,term) shuffle; a 3-term query needs 3 counters per row,
    * not an inverted index), the corpus statistics (N, avgdl, per-term
    * df) are ONE global aggregate row broadcast back, and the score is
    * a codegen'd per-row expression. Total: one partial+final agg of
    * one row + a broadcast nested-loop of 1 row — the same two-pass
    * shape as the prefix-sum operators. A production system amortizes
    * the stats pass across queries (they're query-independent except
    * df, which an inverted index or CMS sketch serves).
    *
    * Determinism: tf/dl/df/N are exact integers; avgdl is re-rounded
    * to 6 dp before use so the one inexact corpus statistic is
    * bit-identical across engines; ln of identical rationals and the
    * fixed double chain round to 4 dp (the [[qTextTfidf]] log
    * discipline). Ties at the top-20 boundary break on doc_id. */
  def qTextBm25(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("query", "join", "scan")
    // constants appear as the LITERALS 2.2 / 1.2 / 0.25 / 0.75 on both
    // engines, never as computed doubles: 1.2 + 1 in Scala lands
    // exactly on a round-to-even tie against the parsed literal 2.2,
    // and a one-ulp constant seam would poison every score
    val base = docs(spark, dir).select(
      (col("doc_id") +: size(split(col("text"), " ")).as("dl") +:
        terms.map(t =>
          size(expr(s"filter(split(text, ' '), x -> x = '$t')")).as(s"tf_$t"))): _*)
    val statCols = count(lit(1)).as("nd") +: round(avg(col("dl")), 6).as("avgdl") +:
      terms.map(t => sum(when(col(s"tf_$t") > 0, 1L).otherwise(0L)).as(s"df_$t"))
    val stats = base.agg(statCols.head, statCols.tail: _*)
    val score = terms.map { t =>
      val tf = col(s"tf_$t").cast("double")
      val idf = log(lit(1.0) +
        (col("nd") - col(s"df_$t") + lit(0.5)) / (col(s"df_$t") + lit(0.5)))
      when(col(s"tf_$t") > 0,
        idf * tf * lit(2.2) /
          (tf + lit(1.2) * (lit(0.25) + lit(0.75) * col("dl") / col("avgdl"))))
        .otherwise(lit(0.0))
    }.reduce(_ + _)
    base.crossJoin(broadcast(stats))
      .select(col("doc_id"), round(score, 4).as("bm25"))
      .filter(col("bm25") > 0)
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  def qTextZipf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(explode(split(col("text"), " ")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("n"))
    val byFreq = Window.orderBy(col("n").desc, col("term"))
    counts
      .withColumn("rnk", row_number().over(byFreq))
      .withColumn("top_n", max(col("n")).over(Window.partitionBy()))
      .filter(col("rnk") <= 50)
      .select(col("rnk"), col("term"), col("n"),
        expr("(10000 * n) div top_n").as("share_bp"))
      .orderBy(col("rnk"))
  }

  /** Hashed-feature linear quality scoring over the documents corpus —
    * [[graft.api.GraftOps.hashedLinearScore]] at dim 1024: the
    * fastText/CCNet-style corpus-filter shape (hashing-trick features,
    * broadcast weight table, sigmoid of the mean token weight, a keep
    * flag at 0.5). Complements q_text_quality's hand-built ratio
    * heuristics with the model-application machinery a production
    * quality/toxicity filter runs. */
  def qQualityLinear(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.hashedLinearScore(
        Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** DSIR importance resampling toward the English subset: fit hashed
    * bag-of-bucket models on target (lang='en') and raw corpus, score
    * log w per doc, select gumbel-top-100. */
  def qSampleImportance(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.importanceResample(
        Tables.documents(spark, dir), "doc_id", "text",
        col("lang") === "en")
      .orderBy(col("gscore").desc, col("doc_id"))

  /** BPE merge rounds to run for [[qBpeMerges]] (unrolled in the
    * oracle, so the two constants must agree). */
  private[graft] val BpeMergeRounds = 4

  /** DECLARED: BPE-style tokenizer-pair statistics (r14, VERDICT r13
    * #7) — the byte-pair-encoding vocabulary-learning round (Sennrich
    * et al. 2016, public): count adjacent symbol pairs weighted by
    * word frequency, merge the most frequent pair everywhere, repeat.
    * Emits the merge table (round, pair, weighted count) for
    * [[BpeMergeRounds]] rounds plus the surviving top-15 pair counts
    * (round = rounds+1) — exact integers end to end.
    *
    * Scale shape — the real BPE scaling story: the CORPUS is touched
    * exactly once (the wordcount shuffle, map-side combinable); every
    * merge round runs over the DISTINCT-WORD table, which Zipf keeps
    * orders of magnitude smaller than the corpus at any scale. Each
    * round is one vocabulary-sized pair-explode + agg, a 1-row
    * TakeOrdered for the best pair, and a broadcast-1-row map-side
    * rewrite — no driver collect; the loop is the kmeans/pagerank
    * driver pattern (localCheckpoint cuts per-round lineage).
    *
    * Greedy-merge determinism: a word's symbols live as a string with
    * every symbol wrapped in its own spaces (" a  b  c "), so the
    * merge is replace(" a  b ", " ab ") — both engines' replace-all
    * scans left-to-right without rescanning replacements, which IS
    * BPE's non-overlapping greedy pass ("a a a" → "aa a"), and the
    * double-space boundaries make adjacent merges independent
    * ("a a a a" → "aa aa", where single-space wrapping would consume
    * the shared boundary and miss the second merge). Ties break on
    * (count desc, a, b) — pure string comparisons. BpeSpec proves the
    * replace-based merge ≡ a direct fold implementation on random
    * symbol arrays and pins best-count monotonicity across rounds. */
  def qBpeMerges(spark: SparkSession, dir: String): DataFrame = {
    val (merges, v) = bpeLearn(spark, dir)
    val survivors = bpePairCounts(v)
      .orderBy(col("cnt").desc, col("a"), col("b")).limit(15)
      .select(lit(BpeMergeRounds + 1).as("round"), col("a"), col("b"), col("cnt"))
    (survivors :: merges).reduce(_.unionAll(_))
      .orderBy(col("round"), col("cnt").desc, col("a"), col("b"))
  }

  /** The STORED merge-table/vocabulary artifact behind the consuming
    * BPE keys (r18, VERDICT r17 missing #1 — the exact PQ/IVF r16
    * precedent): the learn loop runs ONCE per (corpus, dials) and
    * publishes `merges` + `vocab` as parquet under the
    * [[graft.api.StagedArtifact]] discipline — sentinel = canonical
    * corpus path + the learner's dials + a recursive
    * documents.parquet fingerprint, so a regenerated corpus or
    * re-dialed geometry rebuilds instead of serving stale spellings.
    * [[qBpeEncode]] reads the batched family's merges and
    * [[qBpeTokenize]] the greedy family's vocabulary; the LEARN keys
    * (q_bpe_merges / q_bpe_merges_batched) keep learning per
    * execution — they ARE the measured learn walls. Strings and
    * exact integers round-trip parquet exactly, so a stored-table
    * read is value-identical to the in-session learn it replaced and
    * the DuckDB oracles (which recompute the deterministic unrolled
    * learn) hash-match by construction — BpeSpec pins stored ≡
    * learned table-for-table. tools.BpeVocabBuild is the same shape
    * at production dials (37 k merges). */
  private[graft] def bpeStored(spark: SparkSession, dir: String,
                               batched: Boolean): Map[String, DataFrame] = {
    import graft.api.StagedArtifact
    val canonical = new java.io.File(dir).getCanonicalPath
    val key = StagedArtifact.pathKey(canonical)
    val root = s"${Layout.layoutRoot}/${new java.io.File(dir).getName}"
    val docRoot = new java.io.File(dir, "documents.parquet")
    require(docRoot.exists,
      s"documents.parquet missing under $dir — cannot fingerprint the BPE corpus")
    val fp = StagedArtifact.fingerprint(docRoot)
    val (fam, sentinel) =
      if (batched)
        (s"bpe_merges_${key}_b${BpeBatchRounds}x$BpeBatchSize",
         s"$canonical batched rounds=$BpeBatchRounds batch=$BpeBatchSize fp=$fp")
      else
        (s"bpe_merges_${key}_g$BpeMergeRounds",
         s"$canonical greedy rounds=$BpeMergeRounds fp=$fp")
    StagedArtifact.loadOrBuild(spark, new java.io.File(s"$root/$fam"),
      sentinel, gc = Some((s"bpe_merges_${key}_", s"fp=$fp"))) {
      if (batched) {
        val (merges, v) = bpeLearnBatched(spark, dir, BpeBatchRounds, BpeBatchSize)
        val zero = spark.range(0).select(
          lit(0).as("round"), lit(0).as("rk"),
          lit("").as("a"), lit("").as("b"), lit(0L).as("cnt"))
        Seq("merges" -> (zero :: merges).reduce(_.unionAll(_)), "vocab" -> v)
      } else {
        val (merges, v) = bpeLearn(spark, dir)
        val zero = spark.range(0).select(
          lit(0).as("round"), lit("").as("a"), lit("").as("b"), lit(0L).as("cnt"))
        Seq("merges" -> (zero :: merges).reduce(_.unionAll(_)), "vocab" -> v)
      }
    }
  }

  /** DECLARED: apply the learned BPE vocabulary corpus-wide (r14) —
    * the tokenize step that consumes the learn loop's final
    * vocabulary. The final merged vocabulary IS the tokenization of
    * every distinct word, so corpus token statistics need no second
    * corpus pass: explode each vocab word's symbols weighted by its
    * corpus frequency (the wordcount aggregate from the learn step)
    * and sum. Emits the top-30 symbols by corpus token count — the
    * vocabulary a loader would budget by.
    *
    * r18: reads the STORED vocabulary ([[bpeStored]]) instead of
    * re-learning per execution — the key's wall is the consumption
    * cost a deployment pays against its versioned tokenizer artifact;
    * q_bpe_merges keeps measuring the learn itself. */
  def qBpeTokenize(spark: SparkSession, dir: String): DataFrame = {
    val v = bpeStored(spark, dir, batched = false)("vocab")
    // n_words counts DISTINCT vocabulary words containing the symbol
    // (s ↔ word is a bijection), not symbol occurrences — a word
    // tokenizing to [a, b, a] adds 2 to a's n_tok but 1 to its
    // n_words (r14 review catch: count(*) over the explode counted
    // occurrences on BOTH engines, so the hash could never object)
    v.select(col("s"), col("f"), explode(split(trim(col("s")), "  ")).as("sym"))
      .groupBy(col("sym"))
      .agg(sum(col("f")).as("n_tok"), countDistinct(col("s")).as("n_words"))
      .orderBy(col("n_tok").desc, col("sym"))
      .limit(30)
  }

  /** The shared BPE learn loop: wordcount → wrapped char symbols →
    * `rounds` greedy merge rounds (declared keys use
    * [[BpeMergeRounds]]; tools.BpeScaleBench dials this to measure
    * where the O(rounds) driver-chained job sequence stops being
    * viable — SCALE.md §BPE dial). Returns (per-round best frames
    * newest-first, final vocabulary (s, f)) — single-sourced so
    * [[qBpeMerges]] and [[qBpeTokenize]] cannot drift on the merge
    * sequence. Terminates early when no adjacent pair remains (the
    * empty `best` would otherwise crossJoin the vocabulary to zero
    * rows); the check reads an already-materialized 1-row checkpoint,
    * so it adds no job. */
  /** The wordcount → wrapped-char-symbols seed shared by the greedy
    * and batched learners (one corpus pass, Zipf-bounded output). */
  private def bpeSeed(spark: SparkSession, dir: String): DataFrame = {
    val wc = graft.api.GraftOps.widened(docs(spark, dir), "doc_id")
      .select(explode(split(col("text"), " ")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("f"))
      .localCheckpoint(true) // vocabulary-sized; seeds the round loop
    wc.select(expr("regexp_replace(w, '(.)', ' $1 ')").as("s"), col("f"))
  }

  private[graft] def bpeLearn(spark: SparkSession, dir: String,
                              rounds: Int = BpeMergeRounds): (List[DataFrame], DataFrame) = {
    graft.api.BuildCounters.bpeLearns.incrementAndGet()
    var v = bpeSeed(spark, dir)
    var merges = List.empty[DataFrame]
    for (r <- 1 to rounds) {
      val best = bpePairCounts(v)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(1)
        .localCheckpoint(true) // 1 row; read by the rewrite AND the output
      if (best.isEmpty) return (merges, v)
      merges ::= best.select(lit(r).as("round"), col("a"), col("b"), col("cnt"))
      v = v.crossJoin(broadcast(best.select(col("a"), col("b"))))
        .withColumn("s", expr(
          "replace(s, concat(' ', a, '  ', b, ' '), concat(' ', a, b, ' '))"))
        .select(col("s"), col("f"))
        .localCheckpoint(true) // vocabulary-sized; cut round lineage
    }
    (merges, v)
  }

  /** Batched-merge geometry for [[qBpeMergesBatched]] (unrolled in
    * the oracle, so the constants must agree). Production dials
    * `batch` into the hundreds; the declared 4×8 keeps the oracle
    * unrollable while exercising the selection rule for real. */
  private[graft] val BpeBatchRounds = 4
  private[graft] val BpeBatchSize = 8

  /** DECLARED (r15): BATCHED BPE vocabulary learning — the standard
    * scalable-BPE trick that lifts the greedy loop's rounds ceiling.
    * tools.BpeScaleBench measured the greedy chain's per-round FLOOR
    * at ~0.55 s (sf1, warm) — pure driver-chained job overhead,
    * data-size-independent — putting a production ~30 k-merge
    * vocabulary at ~4.6 h of fixed cost. Batching merges the top-B
    * SYMBOL-DISJOINT pairs per round (B = [[BpeBatchSize]]): rank
    * candidates by (cnt desc, a, b), keep a pair iff no
    * strictly-higher-ranked candidate in the top-B shares a symbol
    * with it — a declarative anti-chain both engines spell with one
    * NOT EXISTS, whose every selection sequential greedy would also
    * make (rank 1 always survives, so progress is guaranteed and
    * batch = 1 IS the greedy learner — BpeSpec pins that exactly).
    * The B merges then apply in ONE vocabulary rewrite per round:
    * a rank-ordered left fold of the wrapped-symbol replace (both
    * engines fold identically; symbol-disjoint replaces commute, and
    * when an earlier merge in the fold creates occurrences of a later
    * merge's symbol — e.g. (a,b) then (ab,x) — the fold order makes
    * the result deterministic and identical cross-engine).
    * Emits the selected merge table: (round, rk, a, b, cnt). */
  def qBpeMergesBatched(spark: SparkSession, dir: String): DataFrame = {
    // empty-seed frame: a pre-exhausted corpus (no round-1 pair at
    // all) must yield ZERO rows like the oracle, not empty.reduce
    // (r15 review; the greedy key is immune via its survivors frame)
    val zero = spark.range(0).select(
      lit(0).as("round"), lit(0).as("rk"),
      lit("").as("a"), lit("").as("b"), lit(0L).as("cnt"))
    (zero :: bpeLearnBatched(spark, dir, BpeBatchRounds, BpeBatchSize)._1)
      .reduce(_.unionAll(_))
      .orderBy(col("round"), col("rk"))
  }

  /** DECLARED (r17): apply the LEARNED merge table to NOVEL words —
    * the production ENCODE step as an oracle-verified key. The corpus
    * words double into guaranteed-novel strings (w‖reverse(w) —
    * injective, so ordering ties are impossible), each wraps into the
    * learner's spaced-symbol form, and the FULL rank-ordered merge
    * list (round-major, rk-minor — the batched learner's own global
    * order) applies as ONE `aggregate` fold of the wrapped replace:
    * exactly the learner's rewrite expression pointed at new text.
    * The DuckDB oracle recomputes the merge table with the same
    * unrolled round CTEs and folds the same list as rounds×batch
    * guarded nested replaces. Novel substrings stay single symbols;
    * trained subunits inside the doubled words still merge — the
    * cross-engine hash pins every spelled string exactly.
    * [[bpeEncode]] is the per-word JVM twin of this fold (BpeSpec
    * pins their equivalence through the vocabulary); this key is the
    * DISTRIBUTED spelling a pipeline runs over arriving text: merge
    * list broadcast, one map stage, no shuffle before the final
    * order.
    *
    * r18 (VERDICT r17 wrong #2): the merge table comes from the
    * STORED artifact ([[bpeStored]]) — the r17 cut re-learned it per
    * execution, so the key's wall was dominated by re-paying the
    * learn q_bpe_merges_batched already measures. The declared key is
    * now the production shape: read the published merges, broadcast
    * the fold, touch raw text once. The oracle keeps its unrolled
    * deterministic learn — the stored table is value-identical to the
    * learn it persisted, so hashes are unchanged by construction. */
  def qBpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val gm = bpeStored(spark, dir, batched = true)("merges")
      .agg(expr(
        "transform(array_sort(collect_list(struct(round, rk, a, b))), " +
          "m -> struct(m.a AS a, m.b AS b))").as("__ms"))
    val novel = docs(spark, dir)
      .select(explode(split(col("text"), " ")).as("w"))
      .filter(length(col("w")) > 0).distinct()
      .select(concat(col("w"), reverse(col("w"))).as("w"))
    novel
      .select(col("w"), expr("regexp_replace(w, '(.)', ' $1 ')").as("s"))
      .crossJoin(broadcast(gm))
      .withColumn("s", expr(
        "aggregate(__ms, s, (acc, m) -> " +
          "replace(acc, concat(' ', m.a, '  ', m.b, ' '), concat(' ', m.a, m.b, ' ')))"))
      .select(col("w"), size(split(trim(col("s")), "  ")).as("n_sym"),
        trim(col("s")).as("spelling"))
      .orderBy(col("w")).limit(300)
  }

  /** The batched learn loop behind [[qBpeMergesBatched]] — same seed,
    * pair counter, and wrapped-symbol merge spelling as [[bpeLearn]];
    * only the per-round selection (top-B disjoint anti-chain instead
    * of top-1) and the rewrite (rank-ordered fold instead of a single
    * replace) differ. Returns (per-round selected-merge frames
    * newest-first, final vocabulary). */
  private[graft] def bpeLearnBatched(spark: SparkSession, dir: String,
                                     rounds: Int, batch: Int): (List[DataFrame], DataFrame) = {
    graft.api.BuildCounters.bpeLearns.incrementAndGet()
    var v = bpeSeed(spark, dir)
    var merges = List.empty[DataFrame]
    val rankW = Window.orderBy(col("cnt").desc, col("a"), col("b"))
    for (r <- 1 to rounds) {
      // top-B candidates with their rank — ≤ batch rows, so the
      // single-partition window is by construction tiny
      val top = bpePairCounts(v)
        .orderBy(col("cnt").desc, col("a"), col("b")).limit(batch)
        .withColumn("rk", row_number().over(rankW))
        .localCheckpoint(true)
      // anti-chain selection: drop a pair iff ANY strictly higher
      // rank shares a symbol (kept ⊆ sequential greedy's kept set)
      val i = top.select(col("rk").as("i_rk"), col("a").as("i_a"),
        col("b").as("i_b"), col("cnt").as("i_cnt"))
      val j = top.select(col("rk").as("j_rk"), col("a").as("j_a"), col("b").as("j_b"))
      val sel = i.join(j,
          col("j_rk") < col("i_rk") &&
            (col("j_a") === col("i_a") || col("j_a") === col("i_b") ||
             col("j_b") === col("i_a") || col("j_b") === col("i_b")), "left_anti")
        .select(col("i_rk").as("rk"), col("i_a").as("a"),
          col("i_b").as("b"), col("i_cnt").as("cnt"))
        .localCheckpoint(true) // ≤ batch rows; read by rewrite AND output
      if (sel.isEmpty) return (merges, v)
      merges ::= sel.select(lit(r).as("round"), col("rk"), col("a"), col("b"), col("cnt"))
      // ONE vocabulary rewrite: rank-ordered fold of the wrapped replace
      val ms = sel.agg(expr(
        "transform(array_sort(collect_list(struct(rk, a, b))), m -> struct(m.a AS a, m.b AS b))")
        .as("__ms"))
      v = v.crossJoin(broadcast(ms))
        .withColumn("s", expr(
          "aggregate(__ms, s, (acc, m) -> " +
            "replace(acc, concat(' ', m.a, '  ', m.b, ' '), concat(' ', m.a, m.b, ' ')))"))
        .select(col("s"), col("f"))
        .localCheckpoint(true)
    }
    (merges, v)
  }

  /** Apply a learned merge table to ONE word — the production ENCODE
    * step for text the learner never saw (r17: the stored-vocabulary
    * tokenize join covers training-corpus words; new ingest needs the
    * merges themselves). Standard BPE encode: repeatedly find the
    * lowest-GLOBAL-rank pair present and merge every non-overlapping
    * occurrence left-to-right. This is exactly the learner's
    * rank-ordered replace-all fold restricted to pairs that occur:
    * replace-all of an absent pair is the identity, and a merge at
    * rank r can only CREATE pairs whose rank exceeds r (a pair
    * containing symbol `ab` was learnable only after `ab` existed),
    * so the min-rank iteration visits ranks in the fold's own order —
    * BpeSpec pins encode(word) ≡ the stored vocabulary spelling for
    * EVERY trained word. O(len² · rounds-present) per word,
    * vocabulary-size-independent — the property that makes encode
    * viable against a 37 k-merge table (tools.BpeEncodeNew measures
    * it). `ranks` maps (a, b) → global rank (round-major, rk-minor). */
  private[graft] def bpeEncode(word: String,
      ranks: collection.Map[(String, String), Int]): Vector[String] = {
    var syms = word.map(_.toString).toVector
    var done = syms.length < 2
    while (!done) {
      // lowest-rank pair present
      var best = Int.MaxValue
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.getOrElse((syms(i), syms(i + 1)), Int.MaxValue)
        if (r < best) best = r
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // one greedy left-to-right pass merging every non-overlapping
        // occurrence of that pair (the learner's replace semantics)
        val out = Vector.newBuilder[String]
        var j = 0
        while (j < syms.length) {
          if (j < syms.length - 1 &&
              ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue) == best) {
            out += (syms(j) + syms(j + 1)); j += 2
          } else { out += syms(j); j += 1 }
        }
        syms = out.result()
        if (syms.length < 2) done = true
      }
    }
    syms
  }

  /** Adjacent-pair weighted counts over a wrapped-symbol vocabulary
    * frame (s, f). sequence(0, size-2) DESCENDS on 1-symbol words —
    * the r13 guard rule — hence the size ≥ 2 filter. */
  private def bpePairCounts(v: DataFrame): DataFrame =
    v.select(col("f"), split(trim(col("s")), "  ").as("t"))
      .filter(size(col("t")) >= 2)
      .select(col("f"), explode(expr(
        "transform(sequence(0, size(t)-2), i -> struct(t[i] as a, t[i+1] as b))"))
        .as("p"))
      .groupBy(col("p.a").as("a"), col("p.b").as("b"))
      .agg(sum(col("f")).as("cnt"))
}
