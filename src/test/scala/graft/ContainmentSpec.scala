package graft

import graft.queries.DedupOps
import org.apache.spark.sql.functions._

/** Containment dedup (DedupOps.qDedupContainment): proves on planted
  * geometry that the asymmetric score catches the embedded-duplicate
  * case BOTH existing verify keys miss — a short doc pasted into the
  * middle of a longer host shares no 60-char prefix (prefix blocking
  * never pairs them) and its symmetric Jaccard is diluted by the
  * host's size (below any near-dup threshold).
  */
class ContainmentSpec extends SparkSpec {

  import spark.implicits._

  // 90-token host; the embedded doc is tokens 40..59 of it (unique
  // tokens → every shingle is rare); decoys share nothing
  private val hostToks = (0 until 90).map(i => s"w$i")
  private lazy val fixture = Seq(
    (1L, hostToks.mkString(" ")),
    (2L, hostToks.slice(40, 60).mkString(" ")),
    (3L, (0 until 40).map(i => s"x$i").mkString(" ")),
    (4L, (0 until 40).map(i => s"y$i").mkString(" "))
  ).toDF("doc_id", "text")

  test("embedded duplicate scores containment 1.0 and is the only pair reported") {
    val rows = DedupOps.containmentPairs(fixture).collect()
    assert(rows.length === 1, s"expected exactly the planted pair: ${rows.mkString(",")}")
    val r = rows.head
    assert((r.getLong(0), r.getLong(1)) === ((1L, 2L)))
    // 20 tokens → 18 trigrams, all inside the host
    assert(r.getLong(2) === 18L && r.getLong(4) === 18L)
    assert(r.getDouble(5) === 1.0)
    // and symmetric Jaccard on the same pair is hopeless: 18 shared of
    // 88 host shingles → the verify keys' 0.5-class thresholds never
    // see it
    assert(18.0 / 88.0 < 0.25)
  }

  test("boilerplate grams generate no candidates (rare-gram blocking self-caps)") {
    // 20 docs sharing one identical boilerplate sentence (df=20 ≫ 5)
    // plus unique tails: the shared grams are NOT rare, so no pair is
    // ever generated — the blocking is the cap
    val boiler = "standard legal disclaimer text appended to every page by the template"
    val docs = (1L to 20L).map(i =>
      (i, s"$boiler unique${i}a unique${i}b unique${i}c unique${i}d")).toDF("doc_id", "text")
    assert(DedupOps.containmentPairs(docs).count() === 0)
  }
}
