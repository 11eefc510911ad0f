package graft

import graft.hgt.HgtCodec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** DSv2 `hgt` source (SURVEY.md §2.1 R1 upgrade path, §7.4): proves
  * (a) the source decodes identically to the binaryFile+flatMap path,
  * (b) lat/lng filters prune whole tiles at PLANNING time,
  * (c) sub-tile windowing + void pushdown never change results
  *     (generous boundaries; Spark re-applies all filters), and
  * (d) column pruning reaches the reader.
  *
  * Fixture: a 2×2-degree neighborhood of four 3×3 tiles with distinct
  * value ranges per tile, plus one void sample.
  */
class HgtDsv2Spec extends SparkSpec {

  private def tileBytes(base: Short): Array[Byte] = {
    val vals: Array[Short] =
      Array(base, (base + 1).toShort, (base + 2).toShort,
        (base + 3).toShort, if (base == 100) HgtCodec.Void else (base + 4).toShort,
        (base + 5).toShort, (base + 6).toShort, (base + 7).toShort, (base + 8).toShort)
    val out = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = ((v >> 8) & 0xff).toByte
      out(2 * i + 1) = (v & 0xff).toByte
    }
    out
  }

  private lazy val dir: String = {
    val d = java.nio.file.Files.createTempDirectory("hgt-dsv2").toFile
    val tiles = Seq(("N40E010.hgt", 100), ("N40E011.hgt", 200),
      ("N41E010.hgt", 300), ("N41E011.hgt", 400))
    tiles.foreach { case (name, base) =>
      java.nio.file.Files.write(new java.io.File(d, name).toPath, tileBytes(base.toShort))
    }
    // a non-tile file the source must ignore
    java.nio.file.Files.write(new java.io.File(d, "README.txt").toPath, "x".getBytes)
    d.getAbsolutePath
  }

  private def hgt: DataFrame = spark.read.format("hgt").load(dir)

  private def scannedTiles(df: DataFrame): Int =
    df.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }.sum

  test("full read equals the binaryFile+flatMap decoder") {
    val viaDsv2 = hgt.filter(col("alt") =!= HgtCodec.Void)
      .orderBy("lat", "lng", "alt").collect().toSeq
    val viaFlatMap = HgtCodec.points(spark, dir).toDF()
      .orderBy("lat", "lng", "alt").collect().toSeq
    assert(viaDsv2.nonEmpty && viaDsv2 === viaFlatMap)
    // 4 tiles → 4 partitions, no pruning without filters
    assert(scannedTiles(hgt) === 4)
  }

  test("lat/lng range filters prune tiles at planning time") {
    // lat in (41.2, 41.8): only the two swLat=41 tiles intersect
    val north = hgt.filter(col("lat") > 41.2 && col("lat") < 41.8)
    assert(scannedTiles(north) === 2)
    // + lng <= 10.4: single tile
    val one = north.filter(col("lng") <= 10.4)
    assert(scannedTiles(one) === 1)
    // results still exactly the unpruned-path answer
    val expected = HgtCodec.points(spark, dir).toDF()
      .filter(col("lat") > 41.2 && col("lat") < 41.8 && col("lng") <= 10.4)
      .orderBy("lat", "lng").collect().toSeq
    assert(one.filter(col("alt") =!= HgtCodec.Void)
      .orderBy("lat", "lng").collect().toSeq === expected)
    // disjoint box → zero partitions, zero rows, no error
    val none = hgt.filter(col("lat") > 80.0)
    assert(scannedTiles(none) === 0 && none.count() === 0)
  }

  test("sub-tile window + void pushdown preserve exact results") {
    // a 0.4°×0.4° box inside tile N40E010 (3×3 grid, step 0.5) — only
    // the center/corner samples in range; void filter pushed to decode
    val boxed = hgt.filter(
      col("lat") >= 40.4 && col("lat") <= 40.6 &&
        col("lng") >= 10.4 && col("lng") <= 10.6 &&
        col("alt") =!= HgtCodec.Void)
    assert(scannedTiles(boxed) === 1)
    // N40E010's center sample IS the void → box keeps nothing
    assert(boxed.count() === 0)
    // same box one tile east keeps exactly the center sample 204
    val east = hgt.filter(
      col("lat") >= 40.4 && col("lat") <= 40.6 &&
        col("lng") >= 11.4 && col("lng") <= 11.6 &&
        col("alt") =!= HgtCodec.Void)
    val rows = east.collect()
    assert(rows.length === 1 && rows.head.getShort(2) === 204)
  }

  test("sub-tile windowing SKIPS rows, not just filters them (scan metric)") {
    // a 101×101 tile (20 402 bytes): without windowing the scan emits
    // 10 201 rows; a 0.1°×0.1° box must emit only the ~11×11 index
    // window (plus generous boundary rows), i.e. orders of magnitude
    // fewer rows LEAVING THE SCAN — proven via the scan's own
    // numOutputRows metric, not the post-filter count
    val d = java.nio.file.Files.createTempDirectory("hgt-big").toFile
    val n = 101
    val big = new Array[Byte](n * n * 2)
    (0 until n * n).foreach { i =>
      val v = (i % 1000).toShort
      big(2 * i) = ((v >> 8) & 0xff).toByte; big(2 * i + 1) = (v & 0xff).toByte
    }
    java.nio.file.Files.write(new java.io.File(d, "N10E020.hgt").toPath, big)
    val df = spark.read.format("hgt").load(d.getAbsolutePath)
      .filter(col("lat") >= 10.4 && col("lat") <= 10.5 &&
        col("lng") >= 20.4 && col("lng") <= 20.5)
    // collect() through df's OWN queryExecution so the scan metric
    // below reads the executed plan (count() would build a new one)
    val rows = df.collect().length.toLong
    // ~11×11 index window (float rounding may shave a boundary line);
    // exact row set must equal the unpruned decoder under the same
    // predicate regardless
    assert(rows >= 100 && rows <= 121, s"~11×11 index window expected, got $rows")
    val expected = HgtCodec.points(spark, d.getAbsolutePath).toDF()
      .filter(col("lat") >= 10.4 && col("lat") <= 10.5 &&
        col("lng") >= 20.4 && col("lng") <= 20.5).count()
    assert(rows === expected)
    val scanRows = df.queryExecution.executedPlan.collectLeaves().collect {
      case b: BatchScanExec => b.metrics("numOutputRows").value
    }.sum
    assert(scanRows <= 200, s"scan emitted $scanRows rows — sub-tile window not applied")
    assert(scanRows >= rows, "scan must emit at least the surviving rows")
  }

  test("property: random (box, tile-set) pairs — result ≡ codec decode, partitions = tile cover (100 cases)") {
    // VERDICT r7 #5. Oracle: the PURE codec kernel (HgtCodec.decode +
    // a driver-side filter) — the same kernel the binaryFile+flatMap
    // path wraps, whose Spark-plumbing equality with DSv2 is pinned by
    // "full read equals the binaryFile+flatMap decoder" above; using
    // the kernel directly keeps 100 cases fast. Each case: random
    // tile set (1-5 tiles, 3-6 grid, values spanning the full int16
    // range incl. occasional natural voids), random 0-2° box at 0.1°
    // grain (edges can coincide with tile edges), random void-drop.
    // Asserts: (a) DSv2 rows ≡ kernel rows exactly; (b) surviving
    // partitions == the box's tile cover over the available tiles —
    // no under-pruning (cover bound) and no over-pruning (equality).
    import org.scalacheck.Gen
    val allCoords = for { la <- 40 to 41; lo <- 10 to 12 } yield (la, lo)
    val caseGen = for {
      k <- Gen.choose(1, 5)
      coords <- Gen.pick(k, allCoords)
      sizes <- Gen.listOfN(k, Gen.choose(3, 6))
      latMinT <- Gen.choose(395, 425)
      latSpanT <- Gen.choose(0, 20)
      lngMinT <- Gen.choose(95, 135)
      lngSpanT <- Gen.choose(0, 20)
      dropVoid <- Gen.oneOf(true, false)
      seed <- Gen.choose(0, Int.MaxValue)
    } yield (coords.toSeq.zip(sizes), (latMinT / 10.0, (latMinT + latSpanT) / 10.0,
      lngMinT / 10.0, (lngMinT + lngSpanT) / 10.0), dropVoid, seed)

    var sc = org.scalacheck.rng.Seed(20260813L)
    (0 until 100).foreach { i =>
      val (tiles, (latLo, latHi, lngLo, lngHi), dropVoid, seed) =
        caseGen.pureApply(Gen.Parameters.default, sc, retries = 1000)
      sc = sc.next
      val d = java.nio.file.Files.createTempDirectory(s"hgt-prop$i").toFile
      val rng = new scala.util.Random(seed)
      val kernelRows = tiles.flatMap { case ((swLat, swLng), n) =>
        val vals = Array.fill(n * n)(rng.nextInt(65536) - 32768)
        if (dropVoid) vals(0) = HgtCodec.Void.toInt // make the void filter live
        val bytes = new Array[Byte](vals.length * 2)
        vals.zipWithIndex.foreach { case (v, j) =>
          bytes(2 * j) = ((v >> 8) & 0xff).toByte
          bytes(2 * j + 1) = (v & 0xff).toByte
        }
        val name = f"N$swLat%02dE$swLng%03d.hgt"
        java.nio.file.Files.write(new java.io.File(d, name).toPath, bytes)
        HgtCodec.decode(bytes, swLat, swLng)
      }.filter(p => p.lat >= latLo && p.lat <= latHi &&
        p.lng >= lngLo && p.lng <= lngHi &&
        (!dropVoid || p.alt != HgtCodec.Void))
        .map(p => (p.lat, p.lng, p.alt)).sorted

      var q = spark.read.format("hgt").load(d.getAbsolutePath)
        .filter(col("lat") >= latLo && col("lat") <= latHi &&
          col("lng") >= lngLo && col("lng") <= lngHi)
      if (dropVoid) q = q.filter(col("alt") =!= HgtCodec.Void)
      val got = q.collect().map(r => (r.getDouble(0), r.getDouble(1), r.getShort(2)))
        .toSeq.sorted
      val ctx = s"case $i: tiles=${tiles.map(_._1)} box=($latLo,$latHi,$lngLo,$lngHi) void=$dropVoid"
      assert(got === kernelRows, s"$ctx — DSv2 result diverged from the codec kernel")

      val cover = tiles.count { case ((swLat, swLng), _) =>
        latLo <= swLat + 1 && latHi >= swLat && lngLo <= swLng + 1 && lngHi >= swLng }
      assert(scannedTiles(q) === cover,
        s"$ctx — expected $cover surviving partitions")
    }
  }

  test("a corrupt (non-square) tile fails loudly, never silently mis-decodes") {
    val d = java.nio.file.Files.createTempDirectory("hgt-bad").toFile
    java.nio.file.Files.write(new java.io.File(d, "N10E020.hgt").toPath,
      new Array[Byte](100)) // 50 samples — not a square grid
    val e = intercept[org.apache.spark.SparkException] {
      spark.read.format("hgt").load(d.getAbsolutePath).count()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("not a square int16 grid")),
      s"expected the codec's shape error, got: ${messages(e)}")
  }

  test("column pruning reaches the reader; aggregates work") {
    val agg = hgt.filter(col("alt") =!= HgtCodec.Void)
      .agg(sum(col("alt").cast("long")).as("s"), count(lit(1)).as("n"))
      .collect().head
    // 4 tiles × 9 samples − 1 void; sum over bases 100/200/300/400
    assert(agg.getLong(1) === 35)
    val expectedSum = Seq(100, 200, 300, 400).flatMap { b =>
      (0 to 8).map(b + _)
    }.filterNot(v => v == 104).map(_.toLong).sum
    assert(agg.getLong(0) === expectedSum)
    // the scan's readSchema shrank to alt only
    val pruned = hgt.select(col("alt")).queryExecution.executedPlan
      .collectLeaves().collect { case b: BatchScanExec => b.schema.fieldNames.toSeq }
    assert(pruned === Seq(Seq("alt")))
  }
}
