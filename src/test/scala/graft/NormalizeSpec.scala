package graft

import org.apache.spark.sql.functions._
import graft.catalyst.{GraftFunctions, NfcNormalize}
import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.unsafe.types.UTF8String

/** graft_nfc (unicode NFC composition) — the canonicalization leg of
  * q_text_normalize. The parquet fixtures are pure ASCII, so these
  * synthetic composed/decomposed pairs are the only place the
  * composition behaviour is observable.
  */
class NormalizeSpec extends SparkSpec {

  private val decomposed = "éclair" // e + combining acute + ...
  private val composed = "\u00e9clair" // precomposed

  test("graft_nfc composes decomposed input and is identity on NFC input (codegen path)") {
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val out = Seq(decomposed, composed, "ascii only")
      .toDF("s")
      .select(expr("graft_nfc(s)").as("n"), length(col("s")).as("l0"), length(expr("graft_nfc(s)")).as("l1"))
      .collect()
    assert(out(0).getString(0) === composed && out(0).getInt(1) === 7 && out(0).getInt(2) === 6)
    assert(out(1).getString(0) === composed && out(1).getInt(1) === 6 && out(1).getInt(2) === 6)
    assert(out(2).getString(0) === "ascii only")
  }

  test("interpreted eval agrees with codegen and NULL propagates") {
    val e = NfcNormalize(Literal(UTF8String.fromString(decomposed),
      org.apache.spark.sql.types.StringType))
    assert(e.eval(null).asInstanceOf[UTF8String].toString === composed)
    val n = NfcNormalize(Literal(null, org.apache.spark.sql.types.StringType))
    assert(n.eval(null) === null)
  }

  test("q_text_normalize: composition shortens every row; norm is clean lowercase") {
    val rows = queries.ScrubOps.qTextNormalize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Int]("nfc_len") === r.getAs[Int]("raw_len") - 1,
        "the decomposed suffix must compose to exactly one char less")
      val norm = r.getAs[String]("norm")
      assert(norm.matches("[a-z0-9 ]+") && !norm.contains("  "), norm)
      assert(norm.endsWith(" e"), s"accent fold lost the suffix: '$norm'")
    }
  }

  test("q_pii_scrub masks every digit and extracts the same id the key holds") {
    val rows = queries.ScrubOps.qPiiScrub(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(!r.getAs[String]("name_masked").exists(_.isDigit))
      assert(r.getAs[Long]("id_num") === r.getAs[Long]("key"),
        "fixture names embed their own key as the identifier")
      assert(r.getAs[String]("id_token").matches("[0-9a-f]{12}"))
    }
  }
}
