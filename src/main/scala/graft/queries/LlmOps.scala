package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** LLM-training-data pipeline operators: deduplication, vector
  * similarity, text analysis (the north-star additions —
  * SURVEY.md §2.4 F/H + BASELINE.json:6).
  */
object LlmOps {

  /** Near-duplicate grouping by normalized 60-char prefix key — the
    * cheap first pass of a dedup pipeline (exact/prefix dedup before
    * MinHash). One shuffle on the normalized key; at 100 TB the key
    * space is wide so skew is bounded by actual duplicate clusters. */
  def qDedupNear(spark: SparkSession, dir: String): DataFrame = {
    Tables.documents(spark, dir)
      .groupBy(lower(substring(col("text"), 1, 60)).as("k"))
      .agg(count(lit(1)).as("n"), min(col("doc_id")).as("keep"))
      .filter(col("n") > 1)
      .orderBy(col("n").desc, col("k"))
      .limit(50)
  }

  /** Brute-force cosine top-k: a small probe set is BROADCAST against
    * the full embeddings table (embeddings are L2-normalized, so
    * cosine ≡ dot product). The big side streams; per-probe top-k via
    * row_number. At 100 TB the probe side must stay the broadcast
    * side; the scale path is LSH/IVF bucketing (see SimilaritySearch).
    * Dot product via zip_with/aggregate higher-order fns. */
  def qCosineTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
    val probes = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("p_id"), col("embedding").as("p_emb"))
    val pairs = emb
      .select(col("vec_id").as("neighbor"), col("embedding").as("t_emb"))
      .crossJoin(broadcast(probes))
      .filter(col("neighbor") =!= col("p_id"))
      .select(
        col("p_id").as("vec_id"),
        col("neighbor"),
        round(
          expr("""aggregate(
                    zip_with(p_emb, t_emb, (a, b) -> cast(a as double) * cast(b as double)),
                    cast(0.0 as double), (acc, x) -> acc + x)"""),
          4).as("cos"))
    val w = Window.partitionBy(col("vec_id")).orderBy(col("cos").desc, col("neighbor"))
    pairs
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= 5)
      .select(col("vec_id"), col("neighbor"), col("cos"))
      .orderBy(col("vec_id"), col("cos").desc, col("neighbor"))
  }
}
