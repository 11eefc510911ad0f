package graft

import org.apache.spark.sql.functions._

/** Unit-level invariants for the round-6 warehouse/curation operators
  * (queries.WarehouseOps + the round-6 Layout/TextOps/VectorOps keys).
  * The DuckDB oracle proves cross-engine value equality; these pin the
  * SEMANTIC properties the oracle can't express — version-chain
  * integrity, sweep-line conservation, Morton locality, quantizer
  * bounds.
  */
class WarehouseSpec extends SparkSpec {

  test("q_dq_audit: the fixture passes every declared quality check") {
    val rows = queries.WarehouseOps.qDqAudit(spark, sf).collect()
    assert(rows.length == 6)
    rows.foreach { r =>
      assert(r.getAs[Boolean]("passed"),
        s"${r.getAs[String]("check_name")} has ${r.getAs[Long]("violations")} violations")
    }
  }

  test("q_scd2: version chains are gapless, intervals abut, exactly one current row per customer") {
    val rows = queries.WarehouseOps.qScd2(spark, sf)
      .collect().groupBy(_.getAs[Long]("o_custkey"))
    assert(rows.nonEmpty)
    rows.foreach { case (ck, vs) =>
      val sorted = vs.sortBy(_.getAs[Int]("version"))
      assert(sorted.map(_.getAs[Int]("version")).toSeq == (1 to vs.length),
        s"customer $ck version chain has gaps")
      // consecutive versions: status actually changed, valid_to abuts next valid_from
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[String]("status") != b.getAs[String]("status"),
            s"customer $ck kept an unchanged version")
          assert(a.getAs[Any]("valid_to") == b.getAs[Any]("valid_from"),
            s"customer $ck intervals do not abut")
        case _ => ()
      }
      assert(vs.count(_.getAs[Boolean]("is_current")) == 1,
        s"customer $ck must have exactly one open version")
      assert(sorted.last.getAs[Any]("valid_to") == null)
    }
  }

  test("q_interval_overlap: peak is within [1, n_orders] and order mass is conserved") {
    val df = queries.WarehouseOps.qIntervalOverlap(spark, sf)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val peak = r.getAs[Long]("peak_concurrent")
      val n = r.getAs[Long]("n_orders")
      assert(peak >= 1L && peak <= n, s"${r.getAs[String]("n_name")}: peak=$peak n=$n")
    }
    // every order lands in exactly one nation's sweep
    val total = rows.map(_.getAs[Long]("n_orders")).sum
    val expected = Tables.orders(spark, sf).count()
    assert(total == expected, s"sweep saw $total orders, table has $expected")
  }

  test("sweep-line recovers the hand-computed peak on a known interval set") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    // intervals [0,10) [5,15) [9,12) [20,30): peak 3 (at t=9), and the
    // [10,20) touch point must NOT count as overlap (half-open: end
    // sorts before start at t=20 via delta asc)
    val spans = Seq((1L, 0L, 10L), (2L, 5L, 15L), (3L, 9L, 12L), (4L, 20L, 30L))
      .toDF("id", "t0", "t1")
    val pts = spans.select($"t0".as("t"), lit(1).as("delta"), $"id")
      .union(spans.select($"t1".as("t"), lit(-1).as("delta"), $"id"))
    val w = Window.orderBy($"t", $"delta", $"id")
    val peak = pts.withColumn("open", sum($"delta").over(w))
      .agg(max($"open")).head.getLong(0)
    assert(peak == 3L)
  }

  test("q_zorder_layout: every Z-bucket is confined to one 16x16 tile in (x, y)") {
    val rows = queries.WarehouseOps.qZorderLayout(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // dropping the low 8 bits of z freezes the high 4 bits of both
      // dims — the file-skipping locality the layout exists to create
      assert(r.getAs[Long]("x_min") / 16 == r.getAs[Long]("x_max") / 16,
        s"zbucket ${r.getAs[Long]("zbucket")} x-range crosses a tile")
      assert(r.getAs[Long]("y_min") / 16 == r.getAs[Long]("y_max") / 16,
        s"zbucket ${r.getAs[Long]("zbucket")} y-range crosses a tile")
    }
  }

  test("z-sorted files skip I/O for BOTH dimensions; a 1-D sort only helps its own") {
    // the measured version of the z-order claim: write orders 8-ways
    // range-partitioned by z vs by xb alone, then read back with a
    // yb-range predicate and compare the rows the parquet scans
    // actually EMIT (row-group min/max skipping, numOutputRows metric)
    import graft.api.GraftOps
    import org.apache.spark.sql.Column
    import org.apache.spark.sql.execution.FileSourceScanExec
    val base = Tables.orders(spark, sf).select(
      (col("o_custkey") % 256).cast("long").as("xb"),
      pmod(datediff(col("o_orderdate"), lit("1995-01-01").cast("date")), lit(256))
        .cast("long").as("yb"),
      col("o_orderkey"))
      .withColumn("z", GraftOps.zorderKey("xb", "yb"))
    val dirZ = java.nio.file.Files.createTempDirectory("zlay").toString
    val dirX = java.nio.file.Files.createTempDirectory("xlay").toString
    // 16 files ≈ one 64×64 z-tile each — the unit the min/max stats
    // confine; fewer files would mix tiles and blunt the skip
    base.repartitionByRange(16, col("z")).sortWithinPartitions("z")
      .write.mode("overwrite").parquet(dirZ)
    base.repartitionByRange(16, col("xb")).sortWithinPartitions("xb")
      .write.mode("overwrite").parquet(dirX)
    def scanned(dir: String, pred: Column): Long = {
      val df = spark.read.parquet(dir).filter(pred)
      df.collect() // execute THIS plan so its scan metric is populated
      df.queryExecution.executedPlan.collect {
        case f: FileSourceScanExec => f.metrics("numOutputRows").value
      }.sum
    }
    val total = base.count()
    // xb predicate: both layouts confine xb per file → both skip
    // (xb<32 ⊂ the xb∈[0,64) tile band = ~4 of 16 z files; quantile
    // smear at file edges keeps this approximate)
    assert(scanned(dirZ, col("xb") < 32) < total * 6 / 10)
    assert(scanned(dirX, col("xb") < 32) < total / 2)
    // yb predicate: THE z claim — the z layout still skips (each z
    // file sits inside one 64×64 tile, so its yb min/max is a narrow
    // band); the xb-sorted layout has every yb in every file and must
    // emit ~everything
    val zy = scanned(dirZ, col("yb") < 32)
    val xy = scanned(dirX, col("yb") < 32)
    assert(zy * 2 < xy, s"z layout emitted $zy vs 1-D layout $xy — no 2-D skipping")
  }

  test("q_emb_quantize: codes bounded by ±127 and energy tracks 127² for unit vectors") {
    val rows = queries.VectorOps.qEmbQuantize(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("code_min") >= -127L && r.getAs[Long]("code_max") <= 127L)
      val meanEnergy = r.getAs[Long]("code_energy").toDouble / r.getAs[Long]("n_vecs")
      // ‖q‖² = 127²·‖v‖² ± quantization error (≤ 127·Σ|v| + d/4 ≈ 1k)
      assert(meanEnergy > 14000 && meanEnergy < 18500,
        s"label ${r.getAs[Int]("label")}: mean ‖q‖² = $meanEnergy")
    }
  }

  test("triangleStats counts a hand-built graph exactly") {
    import spark.implicits._
    // K4 on {1,2,3,4} (4 triangles, 12 wedges) + pendant edge 4-5
    val edges = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L),
      (3L, 4L), (4L, 5L)).toDF("a", "b")
    val r = api.GraftOps.triangleStats(edges, "a", "b").head
    assert(r.getAs[Long]("n_nodes") == 5L)
    assert(r.getAs[Long]("n_edges") == 7L)
    // degrees 3,3,3,4,1 → 3+3+3+6+0 = 15 wedges
    assert(r.getAs[Long]("n_wedges") == 15L)
    assert(r.getAs[Long]("n_triangles") == 4L)
  }

  test("q_quantile_hist brackets the exact percentile within one bucket") {
    val rows = queries.WarehouseOps.qQuantileHist(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("p")).toSeq == Seq(50L, 90L, 99L))
    val exact = Tables.orders(spark, sf)
      .selectExpr("percentile(o_totalprice, array(0.5, 0.9, 0.99)) AS p")
      .head.getSeq[Double](0)
    rows.zip(exact).foreach { case (r, x) =>
      assert(r.getAs[Double]("lo") <= x && x <= r.getAs[Double]("hi"),
        s"p${r.getAs[Long]("p")}: exact $x outside [${r.getAs[Double]("lo")}, ${r.getAs[Double]("hi")}]")
    }
  }

  test("q_text_zipf: rank 1 holds 10000 bp and shares never increase with rank") {
    val rows = queries.TextOps.qTextZipf(spark, sf).collect()
    assert(rows.head.getAs[Int]("rnk") == 1)
    assert(rows.head.getAs[Long]("share_bp") == 10000L)
    val shares = rows.map(_.getAs[Long]("share_bp")).toSeq
    assert(shares == shares.sorted.reverse, "share_bp must be non-increasing in rank")
  }
}
