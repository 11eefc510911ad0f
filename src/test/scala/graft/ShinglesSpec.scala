package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import graft.catalyst.GraftFunctions

/** The codegen'd WordShingles expression must be indistinguishable
  * from the interpreted SQL spelling it replaced
  * (`array_distinct(transform(sequence(0, size(t)-n), i ->
  * concat_ws(' ', t[i], …)))` guarded by `size(t) >= n`) — including
  * order (first occurrence), empty tokens from space runs, and the
  * no-partial-grams rule for sub-shingle docs (§2.2). Every gram-based
  * key (containment / minhash / clusters / contamination / bloom
  * decontamination / curation) rides this equivalence.
  */
class ShinglesSpec extends SparkSpec {

  private def sqlSpelling(n: Int) = {
    val parts = (0 until n).map(j => s"t[i+$j]").mkString("concat_ws(' ', ", ", ", ")")
    s"array_distinct(transform(sequence(0, size(t)-$n), i -> $parts))"
  }

  // dup-heavy tiny vocabulary + explicit space-run / empty / short
  // cases: the adversarial surface for dedup + token-boundary rules
  private val docGen: Gen[String] = Gen.oneOf(
    Gen.listOf(Gen.oneOf("a", "b", "c", "aa", "")).map(_.mkString(" ")),
    Gen.listOfN(2, Gen.oneOf("x", "y")).map(_.mkString(" ")), // sub-shingle
    Gen.const(""),
    Gen.const("   "),
    Gen.const("a  b   c a  b"),
    Gen.listOf(Gen.oneOf("w1", "w2", "w3", "w4", "w5")).map(_.mkString(" ")))

  test("graft_word_shingles ≡ the interpreted SQL spelling, n ∈ {2,3,5}, 200 random docs") {
    GraftFunctions.ensureRegistered(spark)
    import scala.jdk.CollectionConverters._
    var sc = org.scalacheck.rng.Seed(20260813L)
    val docs = (0 until 200).map { _ =>
      val s = docGen.pureApply(Gen.Parameters.default, sc, retries = 1000)
      sc = sc.next
      s
    }
    val df = spark.createDataset(docs)(org.apache.spark.sql.Encoders.STRING)
      .toDF("text").withColumn("t", split(col("text"), " "))
    Seq(2, 3, 5).foreach { n =>
      val rows = df.select(
        expr(s"graft_word_shingles(text, $n)").as("fast"),
        when(size(col("t")) >= n, expr(sqlSpelling(n)))
          .otherwise(array().cast("array<string>")).as("slow"))
        .collectAsList().asScala
      rows.foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1),
          s"n=$n diverged: fast=${r.getSeq[String](0)} slow=${r.getSeq[String](1)}")
      }
    }
  }

  test("graft_word_shingle_hashes ≡ md5-32 of graft_word_shingles, deduped by value (both eval paths)") {
    // r13: containment's fold rides this seam. The SQL spelling on the
    // right is the Spark half of the cross-engine contract
    // (conv(substring(md5(s),1,8),16,10) — DuckDB spells the same
    // value CAST(concat('0x', substring(md5(s),1,8)) AS BIGINT)).
    GraftFunctions.ensureRegistered(spark)
    import scala.jdk.CollectionConverters._
    var sc = org.scalacheck.rng.Seed(20260814L)
    val docs = (0 until 200).map { _ =>
      val s = docGen.pureApply(Gen.Parameters.default, sc, retries = 1000)
      sc = sc.next
      s
    }
    val df = spark.createDataset(docs)(org.apache.spark.sql.Encoders.STRING).toDF("text")
    Seq(2, 3).foreach { n =>
      val rows = df.select(
        expr(s"graft_word_shingle_hashes(text, $n)").as("fast"),
        expr(s"array_distinct(transform(graft_word_shingles(text, $n), " +
          "s -> cast(conv(substring(md5(s),1,8),16,10) as bigint)))").as("slow"))
        .collectAsList().asScala
      rows.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1),
          s"n=$n diverged: fast=${r.getSeq[Long](0)} slow=${r.getSeq[Long](1)}")
      }
      // interpreted path must agree with the codegen'd one
      val interp = docs.map(d => Option(d).map { s =>
        graft.catalyst.WordShingles.computeHashes(
          org.apache.spark.unsafe.types.UTF8String.fromString(s), n)
          .toLongArray().toSeq
      })
      val fast = rows.map(r => Option(r.getSeq[Long](0)))
      assert(interp == fast.toList, s"n=$n: interpreted != codegen")
    }
  }

  test("null text yields null; sub-shingle docs yield an EMPTY array, never partial grams") {
    GraftFunctions.ensureRegistered(spark)
    val df = spark.sql(
      "SELECT graft_word_shingles(cast(null as string), 3) AS a, " +
        "graft_word_shingles('one two', 3) AS b, " +
        "graft_word_shingles('one two three four', 3) AS c")
    val r = df.collect()(0)
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2) == Seq("one two three", "two three four"))
  }
}
