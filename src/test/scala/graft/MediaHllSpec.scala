package graft

import graft.multimodal.MediaOps
import graft.multimodal.MediaOps.MediaRow
import org.apache.spark.sql.functions._

/** Multimodal plumbing (stubbed codec, real Spark plumbing) and the
  * HLL sketch aggregator. */
class MediaHllSpec extends SparkSpec {

  private def mkMedia(n: Int): Seq[MediaRow] =
    (0 until n).map { i =>
      val body = Array.tabulate[Byte](120)(j => ((i * 7 + j) % 251).toByte)
      MediaRow(i.toLong, if (i % 2 == 0) "image" else "video",
        MediaOps.syntheticPayload(64 + i, 48 + i, 16000, 6, body))
    }

  test("probe extracts typed metadata per row via mapPartitions") {
    import spark.implicits._
    val meta = MediaOps.probeAll(mkMedia(10).toDS()).collect().sortBy(_.media_id)
    assert(meta.length === 10)
    assert(meta.head.width === 64 && meta.head.height === 48)
    assert(meta(9).width === 73)
    assert(meta.forall(_.n_frames === 6))
    assert(meta.forall(_.n_bytes === 20 + 120))
  }

  test("frame sampling emits every stride-th frame with payload slices") {
    import spark.implicits._
    val frames = MediaOps.sampleFrames(mkMedia(4).toDS(), stride = 2).collect()
    // 6 frames, stride 2 → frames 0,2,4 per media row
    assert(frames.length === 4 * 3)
    assert(frames.map(_.frame_idx).distinct.sorted.toSeq === Seq(0, 2, 4))
    assert(frames.forall(_.frame.length === 20)) // 120 bytes / 6 frames
  }

  test("feature extraction yields L2-normalized fixed-dim vectors, deterministic") {
    import spark.implicits._
    val f1 = MediaOps.extractFeatures(mkMedia(8).toDS(), dim = 32).collect().sortBy(_.media_id)
    val f2 = MediaOps.extractFeatures(mkMedia(8).toDS(), dim = 32).collect().sortBy(_.media_id)
    assert(f1.forall(_.feature.length === 32))
    assert(f1.zip(f2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    f1.foreach { f =>
      val norm = math.sqrt(f.feature.map(x => x.toDouble * x).sum)
      assert(math.abs(norm - 1.0) < 1e-5)
    }
  }

  test("metadata-only read prunes the binary column at the parquet scan") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("media").toFile.getAbsolutePath
    mkMedia(20).toDS().write.mode("overwrite").parquet(dir)
    val df = MediaOps.metaOnly(spark, dir)
    val scanSchema = df.queryExecution.executedPlan.toString
    assert(scanSchema.contains("ReadSchema: struct<media_id:bigint,kind:string>"), scanSchema)
  }

  test("PNG probe parses a REAL ImageIO-written PNG — JVM codec and SQL expressions agree") {
    // a genuine PNG, not the synthetic header: 23×17 RGBA written by
    // the JDK's own encoder
    val img = new java.awt.image.BufferedImage(23, 17,
      java.awt.image.BufferedImage.TYPE_INT_ARGB)
    (0 until 17).foreach(y => (0 until 23).foreach(x => img.setRGB(x, y, x * 31 + y)))
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", bos))
    val bytes = bos.toByteArray
    // JVM-side codec
    val (w, h, depth, colorType) = MediaOps.PngCodec.probe(bytes)
    assert((w, h, depth) === ((23, 17, 8)))
    assert(colorType === 6 || colorType === 2, s"RGBA/RGB expected, got $colorType")
    intercept[IllegalArgumentException](MediaOps.PngCodec.probe("GRFT0000".getBytes))
    // the SAME Catalyst expressions the declared key uses
    import spark.implicits._
    val row = MediaOps.pngMeta(Seq(Tuple1(bytes)).toDF("payload"), "payload")
      .select("is_png", "width", "height", "bit_depth", "color_type").collect().head
    assert(row.getBoolean(0) && row.getLong(1) === 23L && row.getLong(2) === 17L)
    assert(row.getInt(3) === depth && row.getInt(4) === colorType)
  }

  test("RealCodec (r15): decodes ImageIO-written PNGs through the SAME Spark plumbing") {
    import spark.implicits._
    // genuine PNGs of varying size with a known deterministic raster
    def argbAt(i: Int, x: Int, y: Int): Int =
      0xff000000 | ((x * 31 + y * 7 + i * 13) & 0xffffff)
    val rows = (0 until 6).map { i =>
      val w = 9 + i; val h = 7 + i
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_INT_ARGB)
      (0 until h).foreach(y => (0 until w).foreach(x => img.setRGB(x, y, argbAt(i, x, y))))
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, "png", bos))
      MediaRow(i.toLong, "image", bos.toByteArray)
    }
    // probe: header-only IHDR dims, single frame, through mapPartitions
    val meta = MediaOps.probeAll(rows.toDS(), MediaOps.RealCodec)
      .collect().sortBy(_.media_id)
    assert(meta.map(m => (m.width, m.height, m.n_frames)).toSeq ===
      (0 until 6).map(i => (9 + i, 7 + i, 1)))
    // frame decode: PNG lossless round-trip — RGBA bytes equal the
    // raster we drew, pixel for pixel
    val frames = MediaOps.sampleFrames(rows.toDS(), stride = 1, MediaOps.RealCodec)
      .collect().sortBy(_.media_id)
    assert(frames.length === 6 && frames.forall(_.frame_idx === 0))
    frames.foreach { f =>
      val i = f.media_id.toInt; val w = 9 + i; val h = 7 + i
      assert(f.frame.length === w * h * 4)
      (0 until h).foreach { y => (0 until w).foreach { x =>
        val a = argbAt(i, x, y); val o = (y * w + x) * 4
        assert(f.frame(o) === ((a >> 16) & 0xff).toByte &&
          f.frame(o + 1) === ((a >> 8) & 0xff).toByte &&
          f.frame(o + 2) === (a & 0xff).toByte &&
          f.frame(o + 3) === 0xff.toByte, s"pixel ($x,$y) of media $i")
      }}
    }
    // embed: L2-normalized, deterministic, dim respected
    val e1 = MediaOps.extractFeatures(rows.toDS(), dim = 16, MediaOps.RealCodec)
      .collect().sortBy(_.media_id)
    val e2 = MediaOps.extractFeatures(rows.toDS(), dim = 16, MediaOps.RealCodec)
      .collect().sortBy(_.media_id)
    assert(e1.forall(_.feature.length === 16))
    assert(e1.zip(e2).forall { case (a, b) => a.feature.sameElements(b.feature) })
    e1.foreach { f =>
      val n = math.sqrt(f.feature.map(v => v.toDouble * v).sum)
      assert(math.abs(n - 1.0) < 1e-5)
    }
    // non-image bytes fail loudly, frame index out of range fails
    intercept[IllegalArgumentException](
      MediaOps.RealCodec.probe("GRFT not a png".getBytes))
    intercept[IllegalArgumentException](
      MediaOps.RealCodec.decodeFrame(rows.head.payload, 1))
  }

  test("HLL sketch distinct within 5% of exact on fixture keys") {
    import spark.implicits._
    val hll = udaf(new graft.agg.HllDistinct())
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    val est = o.select(col("o_custkey")).as[Long]
      .agg(hll(col("o_custkey")).as("e")).head().getLong(0)
    val exact = o.select(countDistinct(col("o_custkey"))).head().getLong(0)
    val err = math.abs(est.toDouble - exact) / exact
    assert(err < 0.05, s"est=$est exact=$exact err=$err")
  }

  test("HLL merge associativity: sketch over repartitioned data gives the same estimate") {
    import spark.implicits._
    val hll = udaf(new graft.agg.HllDistinct())
    val ds = spark.range(0, 50000).select((col("id") % 9173).as("k"))
    val e1 = ds.repartition(2).agg(hll(col("k"))).head().getLong(0)
    val e2 = ds.repartition(16).agg(hll(col("k"))).head().getLong(0)
    assert(e1 === e2, "register-max merge must be partition-count invariant")
    assert(math.abs(e1.toDouble - 9173) / 9173 < 0.05)
  }

  test("TypedImperativeAggregate SQL function ≡ Aggregator bit-exactly, grouped and global") {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val hll = udaf(new graft.agg.HllDistinct())
    val o = Tables.orders(spark, "/root/testdata/sf0.01")
    // global: identical estimate from both surfaces (shared HllCore)
    val viaAggregator = o.agg(hll(col("o_custkey"))).head().getLong(0)
    val viaSql = o.agg(expr("graft_hll_distinct(o_custkey)")).head().getLong(0)
    assert(viaSql === viaAggregator, s"sql=$viaSql aggregator=$viaAggregator")
    // grouped through SQL — the partial/merge/serialize path per group
    val grouped = o.groupBy(col("o_orderpriority"))
      .agg(expr("graft_hll_distinct(o_custkey)").as("e"),
           countDistinct(col("o_custkey")).as("x"))
      .collect()
    assert(grouped.length === 5)
    grouped.foreach { r =>
      val (e, x) = (r.getLong(1), r.getLong(2))
      assert(math.abs(e.toDouble - x) / x < 0.05, s"group ${r.getString(0)}: est=$e exact=$x")
    }
  }

  test("TypedImperativeAggregate merge path is partition-count invariant too") {
    graft.catalyst.GraftFunctions.ensureRegistered(spark)
    val ds = spark.range(0, 50000).select((col("id") % 9173).as("k"))
    val e1 = ds.repartition(2).agg(expr("graft_hll_distinct(k)")).head().getLong(0)
    val e2 = ds.repartition(16).agg(expr("graft_hll_distinct(k)")).head().getLong(0)
    assert(e1 === e2)
    assert(math.abs(e1.toDouble - 9173) / 9173 < 0.05)
  }
}
