package graft

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared adversarial corpus (SCALE.md §Corpus-skew): 10× the
  * sf0.001 documents (distinct doc_ids, texts replicated — every
  * block/band population grows 10×, still under the caps) plus a
  * 600-doc identical-text mega-cluster — one bucket above the
  * MaxBlockBucket/MaxBandBucket = 500 caps. Built once per JVM;
  * consumed by BlockCapSpec (per-operator cap behavior) and
  * CurationPipelineSpec (composed-pipeline funnel under the same
  * skew, VERDICT r7 #7).
  */
object AdvFixture {
  val MegaBase = 5000000L
  val MegaN = 600
  val MegaText =
    "boilerplate terms of service header repeated verbatim across every document in this synthetic corpus"
  val MegaPairs: Long = MegaN.toLong * (MegaN - 1) / 2

  @volatile private var cached: String = _

  /** Directory holding `documents.parquet` for the adversarial corpus
    * derived from `sf`'s documents table. */
  def dir(spark: SparkSession, sf: String): String = synchronized {
    if (cached == null) {
      val d = Files.createTempDirectory("graft-adv-fixture").toString
      val base = spark.read.parquet(s"$sf/documents.parquet")
      def cols(df: DataFrame) = df.select(
        col("doc_id"), col("text"), col("lang"), col("source"), col("n_chars"))
      val tenX = (0 until 10).map { i =>
        cols(base.withColumn("doc_id", col("doc_id") + lit(i * 100000L)))
      }.reduce(_ unionAll _)
      val mega = spark.range(MegaN).select(
        (col("id") + lit(MegaBase)).as("doc_id"),
        lit(MegaText).as("text"),
        lit("en").as("lang"),
        lit("boilerplate").as("source"),
        lit(MegaText.length.toLong).as("n_chars"))
      tenX.unionAll(mega).coalesce(4)
        .write.mode("overwrite").parquet(s"$d/documents.parquet")
      cached = d
    }
    cached
  }
}
