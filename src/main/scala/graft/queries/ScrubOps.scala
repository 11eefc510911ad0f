package graft.queries

import graft.Tables
import graft.catalyst.GraftFunctions
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-cleaning operators (the LLM-pipeline north star): PII
  * masking/pseudonymization and unicode text normalization — the two
  * transforms a training pipeline runs on every record before dedup
  * and training.
  *
  * Scale notes: both keys are narrow per-row projections (regex +
  * hash + normalizer, all codegen'd) — zero shuffles besides the
  * presentation sort; at 100 TB they stream through the scan at full
  * parallelism. Nothing collects.
  */
object ScrubOps {

  /** PII scrub over the entity tables: mask embedded numeric
    * identifiers (`Customer#000000042` → `Customer##########`),
    * extract the identifier, count its digits, and emit a stable
    * irreversible surrogate (md5 prefix) — the pseudonymization that
    * keeps records joinable after the raw identifier is dropped. The
    * slim fixture has no phones/emails; the same regex machinery
    * applies unchanged to those patterns (the digit class and the
    * capture are the operator under test, not the dictionary). */
  def qPiiScrub(spark: SparkSession, dir: String): DataFrame = {
    // one implementation of the scrub chain: GraftOps.piiScrub
    def scrub(df: DataFrame, key: String, name: String, entity: String): DataFrame =
      graft.api.GraftOps.piiScrub(df, name).select(
        col(key).as("key"),
        lit(entity).as("entity"),
        col(s"${name}_masked").as("name_masked"),
        col(s"${name}_id").as("id_num"),
        col(s"${name}_token").as("id_token"),
        expr(s"regexp_count($name, '[0-9]')").as("n_digits"))
    scrub(Tables.customer(spark, dir), "c_custkey", "c_name", "customer")
      .unionAll(scrub(Tables.supplier(spark, dir), "s_suppkey", "s_name", "supplier"))
      .orderBy(col("entity"), col("key"))
      .limit(300)
  }

  /** Unicode normalization chain over part descriptions: NFC
    * composition (the codegen'd graft_nfc expression ↔ DuckDB's
    * native nfc_normalize), case folding, accent folding, punctuation
    * strip, and whitespace collapse. The fixture is pure ASCII — NFC
    * of it is the identity — so each row's input is suffixed with a
    * DECOMPOSED `e + U+0301` literal (same codepoints in the oracle
    * SQL): nfc_len < raw_len proves canonical composition actually
    * ran, and the accent-fold replace matches only the COMPOSED form,
    * which is exactly why normalization must precede folding. */
  def qTextNormalize(spark: SparkSession, dir: String): DataFrame = {
    GraftFunctions.ensureRegistered(spark)
    Tables.part(spark, dir)
      .withColumn("raw",
        concat(concat_ws(" ", col("p_name"), col("p_brand"), col("p_type")),
          lit(" e\u0301"))) // decomposed: e + combining acute
      .withColumn("nfc", expr("graft_nfc(raw)"))
      // one implementation of the fold/squash chain: GraftOps.normalizeText
      .transform(d => graft.api.GraftOps.normalizeText(d, "raw"))
      .select(
        col("p_partkey"),
        length(col("raw")).as("raw_len"),
        length(col("nfc")).as("nfc_len"),
        col("norm"))
      .orderBy(col("p_partkey"))
      .limit(300)
  }

  /** Cross-document boilerplate removal over the documents corpus —
    * [[graft.api.GraftOps.removeBoilerplate]] at width 10 / minDocs 2:
    * every aligned 10-token passage shared by ≥2 distinct docs is
    * stripped and the survivors reassembled in document order. On the
    * planted fixture the exact-dup pairs scrub to empty and the
    * 60-char shared-prefix groups lose their first passage, so the
    * removal path is exercised at every SF (minDocs 2 — a production
    * run tunes it upward; the machinery is threshold-independent).
    * The presentation sort is the only global exchange beyond the
    * op's own two (hash-count agg + per-doc rebuild). */
  def qScrubBoilerplate(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.removeBoilerplate(
        Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))

  /** ExactSubstr REMOVAL over the documents corpus —
    * [[graft.api.GraftOps.scrubSharedSpans]] at width 20 / minDocs 2:
    * the scrub step completing q_dedup_substring's detection (Lee et
    * al. 2021 cut the duplicated substrings in place). Exact-dup
    * pairs are rewritten to empty, embedded-dup victims lose the
    * copied tail at its unaligned offset, sub-width docs and the
    * 12-token shared prefixes pass through untouched. */
  def qScrubSubstring(spark: SparkSession, dir: String): DataFrame =
    graft.api.GraftOps.scrubSharedSpans(
        Tables.documents(spark, dir), "doc_id", "text")
      .orderBy(col("doc_id"))
}
