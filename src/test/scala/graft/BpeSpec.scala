package graft

import graft.queries.TextOps
import org.scalacheck.Gen

/** BPE merge-round properties the oracle can't see (r14):
  *
  *  - the wrapped-symbol string replace the engine (and oracle) use
  *    for the merge is EXACTLY BPE's greedy left-to-right
  *    non-overlapping pass — proven against a direct list-fold
  *    reference implementation on random symbol arrays, including
  *    the overlap cases ("a a a" → "aa a", "a a a a" → "aa aa") a
  *    single-space wrapping would get wrong;
  *  - the winning pair's count is monotone non-increasing across
  *    rounds (each new-symbol pair occurrence consumes one merged
  *    occurrence, and old pairs only lose occurrences) — the merge
  *    monotonicity a tokenizer build relies on for early stopping.
  */
class BpeSpec extends SparkSpec {

  // the PropertySpec deterministic-sampling convention (no
  // scalatestplus bridge in the offline cache)
  private def forAll[A](gen: Gen[A], n: Int = 200)(f: A => Unit): Unit = {
    val seed = org.scalacheck.rng.Seed(20260815L)
    Iterator.iterate(seed)(_.next).take(n).foreach { s =>
      gen.apply(Gen.Parameters.default, s).foreach(f)
    }
  }

  /** Reference BPE merge: one greedy left-to-right pass, skipping the
    * right symbol of every match (Sennrich et al. 2016 semantics). */
  private def mergeRef(syms: List[String], a: String, b: String): List[String] = {
    val out = List.newBuilder[String]
    var rest = syms
    while (rest.nonEmpty) rest match {
      case x :: y :: tail if x == a && y == b => out += (a + b); rest = tail
      case x :: tail => out += x; rest = tail
      case Nil => ()
    }
    out.result()
  }

  private def wrap(syms: Seq[String]): String = syms.map(s => s" $s ").mkString

  /** The engine's merge spelling, on a plain string (same expression
    * qBpeMerges evaluates per row). */
  private def mergeViaReplace(syms: Seq[String], a: String, b: String): List[String] = {
    val merged = wrap(syms).replace(s" $a  $b ", s" ${a + b} ")
    merged.trim.split("  ").toList.filter(_.nonEmpty)
  }

  test("wrapped replace ≡ greedy fold on the overlap corner cases") {
    val cases = Seq(
      (List("a", "a", "a"), "a", "a"),          // overlap: one merge only
      (List("a", "a", "a", "a"), "a", "a"),     // adjacent merges both fire
      (List("a", "b", "a", "b"), "a", "b"),     // disjoint matches
      (List("a", "ab", "b"), "a", "ab"),        // multi-char symbols
      (List("x"), "a", "b"),                    // no pair at all
      (List("a", "b", "b"), "b", "b"))          // match not at position 0
    cases.foreach { case (syms, a, b) =>
      assert(mergeViaReplace(syms, a, b) === mergeRef(syms, a, b),
        s"mismatch on $syms merging ($a,$b)")
    }
  }

  test("wrapped replace ≡ greedy fold on random symbol sequences") {
    val sym = Gen.oneOf("a", "b", "c", "ab", "bc")
    val gen = for {
      syms <- Gen.listOfN(12, sym)
      a <- sym
      b <- sym
    } yield (syms, a, b)
    forAll(gen) { case (syms, a, b) =>
      assert(mergeViaReplace(syms, a, b) === mergeRef(syms, a, b),
        s"mismatch on $syms merging ($a,$b)")
    }
  }

  test("batched learner with batch = 1 IS the greedy learner (r15)") {
    // the anti-chain degenerates to rank-1 only; the fold degenerates
    // to the single replace — merge sequence and final vocabulary
    // must both be bit-identical to bpeLearn's
    val r = TextOps.BpeMergeRounds
    val (gm, gv) = TextOps.bpeLearn(spark, sf, r)
    val (bm, bv) = TextOps.bpeLearnBatched(spark, sf, r, batch = 1)
    val greedy = gm.reduce(_.unionAll(_))
      .select("round", "a", "b", "cnt")
    val batched = bm.reduce(_.unionAll(_))
      .select("round", "a", "b", "cnt")
    assert(batched.exceptAll(greedy).isEmpty && greedy.exceptAll(batched).isEmpty,
      "batch=1 merge sequence diverged from greedy")
    assert(bv.exceptAll(gv).isEmpty && gv.exceptAll(bv).isEmpty,
      "batch=1 final vocabulary diverged from greedy")
  }

  test("batched rounds: selections are mutually symbol-disjoint, rank 1 always kept (r15)") {
    val rows = TextOps.qBpeMergesBatched(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getString(2), r.getString(3)))
    assert(rows.nonEmpty)
    rows.groupBy(_._1).foreach { case (round, sel) =>
      assert(sel.exists(_._2 == 1), s"round $round lost its rank-1 pair")
      val syms = sel.flatMap(p => Seq(p._3, p._4))
      assert(syms.distinct.length === syms.length,
        s"round $round selected overlapping pairs: ${sel.mkString(",")}")
    }
    // batching does strictly more work per round than greedy on this
    // fixture (the measured reason the variant exists)
    assert(rows.length > TextOps.BpeBatchRounds,
      "batched selection degenerated to one merge per round on the fixture")
  }

  test("exhaustion semantics: early stop keeps the vocabulary; dry seed yields zero rows (r15 review)") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    // partial exhaustion: every word is "ab" — one merge, then dry.
    // The engine early-returns with the merged vocabulary; the greedy
    // oracle's guarded round CTE (mb$i, r15) is the identity on dry
    // rounds rather than zeroing the vocabulary via an empty CROSS
    // JOIN — this pins the engine half of that contract.
    val dir = java.nio.file.Files.createTempDirectory("bpe-exh").toString
    Seq((1L, "ab ab ab"), (2L, "ab ab")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val merges = TextOps.qBpeMerges(spark, dir).collect()
    assert(merges.length === 1 &&
      merges.head.getString(1) === "a" && merges.head.getString(2) === "b")
    val toks = TextOps.qBpeTokenize(spark, dir).collect()
    assert(toks.length === 1 && toks.head.getString(0) === "ab" &&
      toks.head.getLong(1) === 5L, toks.mkString(","))
    assert(TextOps.qBpeMergesBatched(spark, dir).count() === 1L)
    // pre-exhausted: single-symbol words, no pair anywhere — merge
    // keys return EMPTY (not empty.reduce), tokenize reports the
    // unmerged symbol with its corpus frequency
    val dir2 = java.nio.file.Files.createTempDirectory("bpe-exh2").toString
    Seq((1L, "a a a")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir2/documents.parquet")
    assert(TextOps.qBpeMerges(spark, dir2).count() === 0L)
    assert(TextOps.qBpeMergesBatched(spark, dir2).count() === 0L)
    val t2 = TextOps.qBpeTokenize(spark, dir2).collect()
    assert(t2.length === 1 && t2.head.getString(0) === "a" &&
      t2.head.getLong(1) === 3L, t2.mkString(","))
  }

  test("bpeEncode(word) reproduces the stored spelling for EVERY trained word (r17)") {
    // the production encode (min-rank iteration over the merge table)
    // must be the learner's own rank-ordered replace-all fold — so
    // applying it to each training word must reproduce that word's
    // final vocabulary spelling exactly. Batched learner (the
    // production shape); global rank = round-major, rk-minor.
    val (merges, v) = TextOps.bpeLearnBatched(spark, sf,
      TextOps.BpeBatchRounds, TextOps.BpeBatchSize)
    val ranks = merges.flatMap(_.collect()).map { r =>
      (r.getString(2), r.getString(3)) ->
        (r.getInt(0) * 1000000 + r.getInt(1))
    }.toMap
    val vocab = v.collect().map(_.getString(0))
    assert(vocab.nonEmpty && ranks.nonEmpty)
    vocab.foreach { s =>
      val spelled = s.trim.split("  ").toVector
      val word = s.replace(" ", "")
      assert(TextOps.bpeEncode(word, ranks) === spelled,
        s"encode('$word') diverged from the learned spelling")
    }
    // unseen text: symbols the table never saw stay single chars,
    // while trained subunits inside them still merge
    assert(TextOps.bpeEncode("", ranks) === Vector.empty[String])
    val novel = TextOps.bpeEncode("zq" + vocab.head.replace(" ", ""), ranks)
    assert(novel.nonEmpty && novel.mkString === "zq" + vocab.head.replace(" ", ""))
  }

  test("stored merge table ≡ a fresh in-session learn, table for table (r18)") {
    // the consuming keys (q_bpe_encode, q_bpe_tokenize) read the
    // PUBLISHED artifact; the oracle recomputes the deterministic
    // unrolled learn — so the stored tables must be value-identical
    // to a fresh learn or the cross-engine hashes would drift
    def sorted(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val stored = TextOps.bpeStored(spark, sf, batched = true)
    val (fm, fv) = TextOps.bpeLearnBatched(spark, sf,
      TextOps.BpeBatchRounds, TextOps.BpeBatchSize)
    assert(sorted(stored("merges")) === sorted(fm.reduce(_.unionAll(_))),
      "stored batched merges diverged from a fresh learn")
    assert(sorted(stored("vocab")) === sorted(fv),
      "stored batched vocabulary diverged from a fresh learn")
    val storedG = TextOps.bpeStored(spark, sf, batched = false)
    val (gm, gv) = TextOps.bpeLearn(spark, sf)
    assert(sorted(storedG("merges")) === sorted(gm.reduce(_.unionAll(_))),
      "stored greedy merges diverged from a fresh learn")
    assert(sorted(storedG("vocab")) === sorted(gv),
      "stored greedy vocabulary diverged from a fresh learn")
    // warm load serves the artifact without re-learning: the second
    // call's frames read the same published files
    val again = TextOps.bpeStored(spark, sf, batched = true)
    assert(sorted(again("merges")) === sorted(stored("merges")))
  }

  test("declared key: merge counts are monotone non-increasing; survivors are bounded") {
    val rows = TextOps.qBpeMerges(spark, sf).collect()
    val merges = rows.filter(_.getInt(0) <= TextOps.BpeMergeRounds)
      .sortBy(_.getInt(0)).map(_.getLong(3))
    assert(merges.length === TextOps.BpeMergeRounds)
    assert(merges.sliding(2).forall { case Array(x, y) => y <= x },
      s"merge counts must not increase: ${merges.mkString(",")}")
    // every surviving pair counts no more than the last merge winner
    val lastMerge = merges.last
    val survivors = rows.filter(_.getInt(0) == TextOps.BpeMergeRounds + 1)
      .map(_.getLong(3))
    assert(survivors.forall(_ <= lastMerge),
      "a surviving pair outranks the last merge winner")
  }
}
