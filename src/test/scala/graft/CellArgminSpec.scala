package graft

import org.apache.spark.sql.functions._
import graft.catalyst.GraftFunctions

/** [[graft.catalyst.CellArgmin]] (`graft_cell_argmin`) ≡ the
  * interpreted `array_min(transform(...))` min-struct spelling it
  * replaced ([[graft.api.GraftOps.cellColumn]]'s r10 rewrite), plus
  * the edges the fixture can't hit: exact distance ties (smaller cell
  * wins), empty model (null), float vs double probe equality. */
class CellArgminSpec extends SparkSpec {

  // the OLD interpreted spelling, verbatim from the r9 cellColumn
  private def oldSpelling(vec: String) =
    expr(
      s"""array_min(transform(__cs, c -> struct(
         |  round(c.__cn - 2.0d * graft_num_dot($vec, c.__c), 6) AS __d,
         |  c.__cell AS __cell))).__cell""".stripMargin)

  test("codegen argmin equals the interpreted min-struct spelling on the fixture corpus") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val (cent, _) =
      graft.api.GraftOps.kmeansModel(emb, "vec_id", "embedding", 5, 2)
    val scored = emb
      .crossJoin(broadcast(graft.api.GraftOps.centroidArray(cent)))
      .select(
        col("vec_id"),
        graft.api.GraftOps.cellColumn("embedding").as("new_cell"),
        oldSpelling("transform(embedding, x -> cast(x as double))").as("old_cell"),
        // float probe ≡ pre-cast double probe (widening is exact)
        oldSpelling("embedding").as("old_cell_float"))
    assert(scored.filter(col("new_cell") =!= col("old_cell")).count() === 0)
    assert(scored.filter(col("new_cell") =!= col("old_cell_float")).count() === 0)
    assert(scored.select(countDistinct(col("new_cell"))).first().getLong(0) === 5L)
  }

  test("exact distance tie goes to the smaller cell id, matching min-struct order") {
    GraftFunctions.ensureRegistered(spark)
    // two centroids symmetric about the probe: d = ‖c‖² − 2 v·c is
    // identical for both → the struct ordering (then cell id) decides
    val df = spark.sql(
      """SELECT graft_cell_argmin(
        |  array(cast(1.0 as double), cast(0.0 as double)),
        |  array(struct(7 AS __cell, array(0.0d, 1.0d) AS __c, 1.0d AS __cn),
        |        struct(3 AS __cell, array(0.0d, -1.0d) AS __c, 1.0d AS __cn))) AS cell""".stripMargin)
    assert(df.first().getInt(0) === 3)
  }

  test("empty and all-null models yield null, like array_min of an empty array") {
    GraftFunctions.ensureRegistered(spark)
    val r = spark.sql(
      """SELECT
        |  graft_cell_argmin(array(1.0d),
        |    cast(array() as array<struct<__cell:int, __c:array<double>, __cn:double>>)) AS a,
        |  graft_cell_argmin(array(1.0d),
        |    cast(array(null) as array<struct<__cell:int, __c:array<double>, __cn:double>>)) AS b""".stripMargin)
      .first()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }

  test("cell_topp element 0 equals cell_argmin; elements are distinct and ordered") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    val (cent, _) =
      graft.api.GraftOps.kmeansModel(emb, "vec_id", "embedding", 5, 2)
    val t = emb
      .crossJoin(broadcast(graft.api.GraftOps.centroidArray(cent)))
      .select(
        expr("graft_cell_topp(embedding, __cs, 2)").as("top2"),
        expr("graft_cell_argmin(embedding, __cs)").as("best"))
    assert(t.filter(col("top2")(0) =!= col("best")).count() === 0)
    assert(t.filter(size(col("top2")) =!= 2).count() === 0)
    assert(t.filter(col("top2")(0) === col("top2")(1)).count() === 0)
    // p >= live cells returns all of them, argmin first
    val all = emb.limit(1)
      .crossJoin(broadcast(graft.api.GraftOps.centroidArray(cent)))
      .select(expr("graft_cell_topp(embedding, __cs, 16)").as("t"),
        expr("graft_cell_argmin(embedding, __cs)").as("best")).first()
    assert(all.getSeq[Int](0).size === 5)
    assert(all.getSeq[Int](0).head === all.getInt(1))
  }

  test("multi-probe pairs are a strict superset of single-assignment pairs, emitted exactly once") {
    GraftFunctions.ensureRegistered(spark)
    val emb = Tables.embeddings(spark, sf)
    def pairs(p: Int) = graft.api.GraftOps
      .semanticNearDups(emb, "vec_id", "embedding", 0.0, k = 5, probes = p)
      .select(col("id_a"), col("id_b"))
    val p1 = pairs(1).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val p2rows = pairs(2).collect().map(r => (r.getLong(0), r.getLong(1)))
    val p2 = p2rows.toSet
    assert(p2rows.length === p2.size, "a pair was emitted more than once")
    assert(p1.subsetOf(p2), "probes=2 must contain every probes=1 pair")
    assert(p2.size > p1.size, "fixture boundary pairs should appear at probes=2")
  }

  test("r12 review: a corpus collapsing to fewer live cells than probes does not throw under ANSI") {
    // Identical vectors make every Lloyd-round assignment tie to cell
    // 0, so the post-update model holds ONE live centroid while
    // probes = 2 — CellTopP then returns a 1-element array, and the
    // allocation-free smallest-shared predicate must size-guard its
    // __ca[1] access or GetArrayItem throws under Spark 4's default
    // ANSI mode (the pre-guard spelling crashed exactly here; the
    // old array_intersect spelling had returned all 6 pairs).
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = (1L to 4L).map(i => (i, Seq(1.0f, 0.0f))).toDF("id", "vec")
    val pairs = graft.api.GraftOps
      .semanticNearDups(df, "id", "vec", 0.5, k = 2, probes = 2)
      .collect()
    assert(pairs.length === 6, "4 identical vectors form C(4,2)=6 pairs at cos 1.0")
  }

  test("integer and long probe vectors are accepted, matching the double spelling (r10 review)") {
    // GraftOps.kmeans historically cast ANY numeric array to double;
    // the CellArgmin rewrite briefly narrowed that to float/double —
    // this pins the restored contract end to end through kmeans.
    GraftFunctions.ensureRegistered(spark)
    import spark.implicits._
    val df = Seq(
      (1L, Seq(10, 0)), (2L, Seq(9, 1)), (3L, Seq(0, 10)), (4L, Seq(1, 9)))
      .toDF("id", "vec")
    val intCells = graft.api.GraftOps.kmeans(df, "id", "vec", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val dblCells = graft.api.GraftOps.kmeans(
      df.select(col("id"), expr("transform(vec, x -> cast(x as double))").as("vec")),
      "id", "vec", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(intCells === dblCells)
    assert(intCells.values.toSet.size === 2)
    val longCells = graft.api.GraftOps.kmeans(
      df.select(col("id"), expr("transform(vec, x -> cast(x as bigint))").as("vec")),
      "id", "vec", 2, 2)
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(longCells === dblCells)
  }

  test("r11 ADVICE: NaN/Inf distances neither crash nor win — matching the old spelling on dirty data") {
    // Pre-r11 the BigDecimal.valueOf path threw NumberFormatException
    // on any non-finite distance (one NaN element in one embedding
    // killed kmeans assignment); the old interpreted round() passed
    // NaN/Inf through and min-struct order deprioritized them. Pin ≡
    // on a dirty corpus: NaN probe elements, an all-NaN probe, a NaN
    // centroid, and a -Inf distance (which SHOULD win, as before).
    GraftFunctions.ensureRegistered(spark)
    val dirty = spark.sql(
      """SELECT * FROM VALUES
        |  (1L, array(double('NaN'), 1.0d)),
        |  (2L, array(double('NaN'), double('NaN'))),
        |  (3L, array(1.0d, 2.0d)),
        |  (4L, array(double('Infinity'), 1.0d)),
        |  (5L, array(-double('Infinity'), 1.0d))
        |AS t(id, vec)""".stripMargin)
    val cells =
      """array(struct(1 AS __cell, array(0.5d, 0.5d) AS __c, 0.5d AS __cn),
        |      struct(2 AS __cell, array(double('NaN'), 1.0d) AS __c, 1.0d AS __cn),
        |      struct(3 AS __cell, array(1.0d, 1.0d) AS __c, 2.0d AS __cn))""".stripMargin
    val scored = dirty
      .withColumn("__cs", expr(cells))
      .select(col("id"),
        graft.api.GraftOps.cellColumn("vec").as("new_cell"),
        oldSpelling("vec").as("old_cell"),
        expr("graft_cell_topp(vec, __cs, 3)").as("top3"))
      .collect().sortBy(_.getLong(0))
    scored.foreach { r =>
      assert(r.getInt(1) === r.getInt(2),
        s"id=${r.getLong(0)}: codegen ${r.getInt(1)} != interpreted ${r.getInt(2)}")
      assert(r.getSeq[Int](3).head === r.getInt(1),
        s"id=${r.getLong(0)}: topp head disagrees with argmin")
      assert(r.getSeq[Int](3).size === 3)
    }
    // clean probe (row 3): the NaN-distance centroid (cell 2) never wins
    assert(scored(2).getInt(1) !== 2)
    // +Inf probe (row 4): cells 1 and 3 reach d = −Inf (cn − 2·(+Inf)),
    // tie → smaller cell; the NaN distance (cell 2) is deprioritized
    assert(scored(3).getInt(1) === 1)
    // −Inf probe (row 5): finite cells read d = +Inf, still beating
    // the NaN distance under the total order → tie on +Inf → cell 1
    assert(scored(4).getInt(1) === 1)
  }

  test("rounding at 6 dp is decisive: a 1e-7 separation is a tie, 1e-5 is not") {
    GraftFunctions.ensureRegistered(spark)
    // cell 9 is truly nearer by 1e-7 — invisible at 6 dp, so the tie
    // rule sends the probe to cell 2; at 1e-5 the separation survives
    // rounding and cell 9 wins despite the larger id.
    def probe(eps: String) = spark.sql(
      s"""SELECT graft_cell_argmin(array(1.0d),
         |  array(struct(9 AS __cell, array(0.5d) AS __c, cast(1.0d - $eps as double) AS __cn),
         |        struct(2 AS __cell, array(0.5d) AS __c, 1.0d AS __cn))) AS cell""".stripMargin)
      .first().getInt(0)
    assert(probe("1.0e-7") === 2)
    assert(probe("1.0e-5") === 9)
  }
}
