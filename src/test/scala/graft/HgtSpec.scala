package graft

import graft.hgt.{HgtCodec, Sinks}
import graft.hgt.HgtCodec.ElevationPoint

/** HGT codec + sink golden tests (SURVEY.md §2.1 R1/R2/R4/R5-R7,
  * §5.2): tiles are synthesized in-test — 3×3 big-endian int16 grids
  * including a −32768 void — no fixture files needed.
  */
class HgtSpec extends SparkSpec {

  /** 3×3 tile, values row-major from NW: 10..80 and one void. */
  private def tileBytes: Array[Byte] = {
    val vals: Array[Short] = Array(10, 20, 30, 40, HgtCodec.Void, 60, 70, 80, 90)
    val out = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = ((v >> 8) & 0xff).toByte
      out(2 * i + 1) = (v & 0xff).toByte
    }
    out
  }

  test("tile name parsing: all four hemisphere quadrants") {
    assert(HgtCodec.parseTileName("N47E006.hgt") === (47, 6))
    assert(HgtCodec.parseTileName("S09W072.hgt") === (-9, -72))
    assert(HgtCodec.parseTileName("n00e000.hgt") === (0, 0))
    intercept[IllegalArgumentException](HgtCodec.parseTileName("garbage.txt"))
  }

  test("decode geometry: corners, row direction, void retention") {
    val pts = HgtCodec.decode(tileBytes, swLat = 47, swLng = 6).toSeq
    assert(pts.size === 9)
    // first sample is the NW corner (lat = swLat+1, lng = swLng)
    assert(pts.head === ElevationPoint(48.0, 6.0, 10))
    // last sample is the SE corner
    assert(pts.last === ElevationPoint(47.0, 7.0, 90))
    // center cell carries the void
    assert(pts(4).alt === HgtCodec.Void)
    // keepVoid=false drops exactly that one
    assert(HgtCodec.decode(tileBytes, 47, 6, keepVoid = false).size === 8)
  }

  test("grid size inference rejects non-square payloads") {
    assert(HgtCodec.gridSize(1201L * 1201 * 2) === 1201)
    assert(HgtCodec.gridSize(3601L * 3601 * 2) === 3601)
    intercept[IllegalArgumentException](HgtCodec.gridSize(100))
  }

  test("point lookup hits the nearest grid sample") {
    assert(HgtCodec.lookup(tileBytes, 47, 6, lat = 48.0, lng = 6.0) === 10)
    assert(HgtCodec.lookup(tileBytes, 47, 6, lat = 47.0, lng = 7.0) === 90)
    assert(HgtCodec.lookup(tileBytes, 47, 6, lat = 47.5, lng = 6.5) === HgtCodec.Void)
    // nearest rounding: slightly off-center still snaps to the center
    assert(HgtCodec.lookup(tileBytes, 47, 6, lat = 47.51, lng = 6.49) === HgtCodec.Void)
  }

  test("distributed decode + window sampling end to end") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("hgt").toFile
    java.nio.file.Files.write(new java.io.File(dir, "N47E006.hgt").toPath, tileBytes)
    val pts = HgtCodec.points(spark, dir.getAbsolutePath)
    assert(pts.count() === 8) // void dropped
    val windows = HgtCodec.sampleWindows(pts, sxDeg = 1.0, syDeg = 1.0).collect()
    // 3×3 tile spans lat [47,48], lng [6,7] → 1°-windows split the edges
    assert(windows.map(_.getLong(2)).sum === 8)
  }

  test("windowed CLI load routes through the pruning DSv2 source") {
    val dir = java.nio.file.Files.createTempDirectory("hgt-win").toFile
    java.nio.file.Files.write(new java.io.File(dir, "N47E006.hgt").toPath, tileBytes)
    val out = java.nio.file.Files.createTempDirectory("hgt-win-out").toFile.getAbsolutePath
    // the tile's south edge row: lat 47.0, all three columns, no void
    val n = graft.cli.HgtLoad.loadParquetWindow(spark, dir.getAbsolutePath, out,
      latMin = 46.9, latMax = 47.1, lngMin = 5.0, lngMax = 8.0)
    assert(n === 3)
    val vals = spark.read.parquet(out).orderBy("lng")
      .collect().map(_.getShort(2)).toSeq
    assert(vals === Seq(70, 80, 90))
  }

  test("hgt_points Generator UDTF explodes a tile inside SQL") {
    import spark.implicits._
    graft.hgt.HgtPoints.register(spark)
    val df = Seq((tileBytes, 47, 6)).toDF("content", "la", "lo")
    df.createOrReplaceTempView("tiles")
    val rows = spark.sql(
      "SELECT p.lat, p.lng, p.alt FROM tiles LATERAL VIEW hgt_points(content, la, lo) p AS lat, lng, alt")
      .collect()
    assert(rows.length === 8) // void dropped
    // matches the flatMap decoder exactly
    val expect = HgtCodec.decode(tileBytes, 47, 6, keepVoid = false)
      .map(p => (p.lat, p.lng, p.alt.toInt)).toSet
    assert(rows.map(r => (r.getDouble(0), r.getDouble(1), r.getInt(2))).toSet === expect)
  }

  test("value-mode SQL generation (golden)") {
    val ddl = Sinks.valueTableDdl("elev")
    assert(ddl.contains("CREATE TABLE IF NOT EXISTS elev"))
    assert(ddl.contains("alt SMALLINT"))
    val ins = Sinks.valueInsertSql("elev",
      Seq(ElevationPoint(48.0, 6.0, 10), ElevationPoint(47.0, 7.0, 90)), batchSize = 10)
    assert(ins === Seq("INSERT INTO elev (lat, lng, alt) VALUES (48.0, 6.0, 10), (47.0, 7.0, 90)"))
    assert(Sinks.pointWkt(48.0, 6.5) === "POINT(6.5 48.0)")
  }

  test("raster WKB golden bytes: header fields and band samples round-trip") {
    val wkb = Sinks.rasterWkb(6.0, 48.0, 1.0 / 2, 2, 2, Array[Short](10, 20, 30, 40))
    val buf = java.nio.ByteBuffer.wrap(wkb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    assert(buf.get() === 1)           // NDR
    assert(buf.getShort === 0)        // version
    assert(buf.getShort === 1)        // 1 band
    assert(buf.getDouble === 0.5)     // scaleX
    assert(buf.getDouble === -0.5)    // scaleY
    assert(buf.getDouble === 6.0)     // ipX
    assert(buf.getDouble === 48.0)    // ipY
    buf.getDouble; buf.getDouble      // skews
    assert(buf.getInt === 4326)       // srid
    assert(buf.getShort === 2)        // width
    assert(buf.getShort === 2)        // height
    assert((buf.get() & 0x0f) === 5)  // 16BSI
    assert(buf.getShort === HgtCodec.Void) // nodata
    assert(Seq(buf.getShort, buf.getShort, buf.getShort, buf.getShort) === Seq(10, 20, 30, 40))
    // stable hex golden for the insert path
    val hex = Sinks.rasterWkbHex(6.0, 48.0, 0.5, 1, 1, Array[Short](7))
    assert(Sinks.rasterInsertSql("rast_t", hex) ===
      s"INSERT INTO rast_t (rast) VALUES ('$hex'::raster)")
  }

  test("value-mode import drives DDL + batched inserts through the executor interface") {
    import spark.implicits._
    // singleton holder: task closures deserialize to the same module,
    // so executor-side writes land in the driver-visible queue
    HgtSpecState.seen.clear()
    val pts = HgtCodec.decode(tileBytes, 47, 6, keepVoid = false).toSeq.toDS()
    Sinks.importValues(pts, "elev",
      () => (sql: String) => { HgtSpecState.seen.add(sql); () }, batchSize = 3)
    val sqls = HgtSpecState.seen.toArray(new Array[String](0)).toSeq
    assert(sqls.exists(_.startsWith("CREATE TABLE")))
    val inserts = sqls.filter(_.startsWith("INSERT"))
    assert(inserts.nonEmpty)
    // every sample value appears in some insert
    Seq("10", "20", "30", "60", "70", "80", "90").foreach { v =>
      assert(inserts.exists(_.contains(s", $v)")), s"missing alt $v in $inserts")
    }
  }
}

object HgtSpecState {
  val seen = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}

/** CLI facades over the codec/sinks — the reference's console-command
  * surface (hgtread / hgtget unzip stage / hgtload). */
class HgtCliSpec extends SparkSpec {

  private def tileBytes: Array[Byte] = {
    val vals: Array[Short] = Array(10, 20, 30, 40, graft.hgt.HgtCodec.Void, 60, 70, 80, 90)
    val out = new Array[Byte](vals.length * 2)
    vals.zipWithIndex.foreach { case (v, i) =>
      out(2 * i) = ((v >> 8) & 0xff).toByte
      out(2 * i + 1) = (v & 0xff).toByte
    }
    out
  }

  test("hgtread: point read from a tile file, void reported as None") {
    val dir = java.nio.file.Files.createTempDirectory("cli").toFile
    val f = new java.io.File(dir, "N47E006.hgt")
    java.nio.file.Files.write(f.toPath, tileBytes)
    assert(graft.cli.HgtRead.read(48.0, 6.0, f.getAbsolutePath) === Some(10.toShort))
    assert(graft.cli.HgtRead.read(47.5, 6.5, f.getAbsolutePath) === None) // void
  }

  test("hgtget: extracts hgt entries from zips, skips already-present files") {
    val dir = java.nio.file.Files.createTempDirectory("cliget").toFile
    val zipPath = new java.io.File(dir, "tiles.zip")
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(zipPath))
    zos.putNextEntry(new java.util.zip.ZipEntry("N47E006.hgt")); zos.write(tileBytes)
    zos.closeEntry()
    zos.putNextEntry(new java.util.zip.ZipEntry("readme.txt")); zos.write("x".getBytes)
    zos.closeEntry(); zos.close()
    val work = new java.io.File(dir, "work").getAbsolutePath
    val first = graft.cli.HgtGet.extract(Seq(zipPath.getAbsolutePath), work)
    assert(first === Seq("N47E006.hgt"))
    // idempotent second run: skip logic (reference R8)
    val second = graft.cli.HgtGet.extract(Seq(zipPath.getAbsolutePath), work)
    assert(second.isEmpty)
  }

  test("hgtload value mode writes the decoded point table as parquet") {
    val in = java.nio.file.Files.createTempDirectory("cliload").toFile
    java.nio.file.Files.write(new java.io.File(in, "N47E006.hgt").toPath, tileBytes)
    val out = java.nio.file.Files.createTempDirectory("cliout").toFile.getAbsolutePath
    val n = graft.cli.HgtLoad.loadParquet(spark, in.getAbsolutePath, out)
    assert(n === 8) // void dropped
    assert(spark.read.parquet(out).columns.sorted.toSeq === Seq("alt", "lat", "lng"))
  }

  test("hgtload raster mode emits one INSERT per window with decodable WKB") {
    val sqls = graft.cli.HgtLoad.rasterSql(tileBytes, 47, 6, sampleEvery = 2, table = "rast")
    assert(sqls.size === 4) // 3x3 grid, stride 2 → 2x2 windows
    assert(sqls.forall(_.startsWith("INSERT INTO rast (rast) VALUES ('01")))
  }

  test("hgtget fetch: manifest → plan with existence-derived skip state (R3+R8)") {
    import graft.hgt.Fetch
    val work = java.nio.file.Files.createTempDirectory("clifetch").toFile
    // pre-existing target → planned as skip
    java.nio.file.Files.write(new java.io.File(work, "N47E006.zip").toPath, Array[Byte](1))
    val manifest = Seq(
      "# srtm3 manifest excerpt",
      "",
      "https://example.invalid/srtm3/N47E006.zip",
      "https://example.invalid/srtm3/N47E007.zip",
      "https://example.invalid/srtm3/N48E006.zip")
    val tasks = Fetch.plan(manifest, work.getAbsolutePath)
    assert(tasks.map(t => new java.io.File(t.target).getName) ===
      Seq("N47E006.zip", "N47E007.zip", "N48E006.zip"))
    assert(tasks.map(_.skip) === Seq(true, false, false))
  }

  test("hgtget fetch: worker-pool run emits plan-order golden bookkeeping; FAIL is isolated") {
    import graft.hgt.Fetch
    val work = java.nio.file.Files.createTempDirectory("clifetch2").toFile
    java.nio.file.Files.write(new java.io.File(work, "a.zip").toPath, Array[Byte](1))
    val tasks = Fetch.plan(Seq(
      "https://example.invalid/d/a.zip",
      "https://example.invalid/d/b.zip",
      "https://example.invalid/d/broken.zip",
      "https://example.invalid/d/c.zip"), work.getAbsolutePath)
    val touched = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val fake: Fetch.Fetcher = (url, target) => {
      touched.add(url)
      if (url.contains("broken")) sys.error("boom")
      java.nio.file.Files.write(target, url.getBytes)
    }
    val log = Fetch.run(tasks, fake, parallelism = 3)
    val w = work.getAbsolutePath
    assert(log === Seq(
      s"SKIP $w/a.zip",
      s"OK https://example.invalid/d/b.zip -> $w/b.zip",
      "FAIL https://example.invalid/d/broken.zip: boom",
      s"OK https://example.invalid/d/c.zip -> $w/c.zip"))
    assert(!touched.contains("https://example.invalid/d/a.zip"),
      "skipped task must never reach the fetcher")
    // idempotent re-plan: succeeded targets now skip, the failure retries
    val replan = Fetch.plan(tasks.map(_.url), w)
    assert(replan.map(_.skip) === Seq(true, true, false, true))
  }

  test("hgtget fetch: the real network fetcher is env-gated") {
    assume(!sys.env.get("SPARK_GRAFT_ALLOW_NETWORK").contains("1"))
    intercept[IllegalArgumentException](graft.hgt.Fetch.urlFetcher())
  }

  // ── flag surface (VERDICT r7 #6): Appendix B option parity ──────────

  test("hgtload parse: full reconstructed flag set lands in the config") {
    val cfg = graft.cli.HgtLoad.parse(Seq(
      "-r", "-s", "25", "30", "-c", "8", "--host", "db1", "--port", "5433",
      "--user", "gmalt", "--db", "tiles", "--table", "elev", "/data/hgt")).toOption.get
    assert(cfg.raster && cfg.sampleLng === 25 && cfg.sampleLat === 30)
    assert(cfg.concurrency === 8 && cfg.host === "db1" && cfg.port === 5433)
    assert(cfg.user === "gmalt" && cfg.db === "tiles" && cfg.table === "elev")
    assert(cfg.inDir === "/data/hgt" && cfg.out.isEmpty && cfg.window.isEmpty)
  }

  test("hgtload parse: defaults, aliases, window box, negative coords stay positional") {
    val d = graft.cli.HgtLoad.parse(Seq("dir")).toOption.get
    assert(!d.raster && d.sampleLng === 50 && d.sampleLat === 50 &&
      d.concurrency === 4 && d.host === "localhost" && d.port === 5432 &&
      d.table === "elevation")
    val w = graft.cli.HgtLoad.parse(Seq(
      "--sample", "10", "10", "--out", "/tmp/o",
      "--window", "-12.5", "-11.5", "6.0", "7.0", "dir")).toOption.get
    assert(w.sampleLng === 10 && w.window === Some((-12.5, -11.5, 6.0, 7.0)))
    assert(w.out === Some("/tmp/o"))
  }

  test("hgtload/hgtget parse: violations are Left, usage strings are golden") {
    assert(graft.cli.HgtLoad.parse(Seq("-x", "dir")) === Left("unknown option -x"))
    assert(graft.cli.HgtLoad.parse(Seq("-s", "5", "dir")).isLeft) // arity 2 eats 5,dir
    assert(graft.cli.HgtLoad.parse(Seq("a", "b")) === Left("expected exactly one DIR, got 2"))
    assert(graft.cli.HgtGet.parse(Seq()) === Left("expected MANIFEST [DIR]"))
    assert(graft.cli.HgtGet.parse(Seq("m", "d", "-c", "9")) ===
      Right(graft.cli.HgtGet.Config("m", "d", 9)))
    // golden usage: the console contract a gmalt user reads
    assert(graft.cli.HgtLoad.usage.startsWith(
      "usage: HgtLoad [-r] [-s LNG LAT] [-c N] [--host H] [--port P]"))
    assert(graft.cli.HgtLoad.usage.contains("--window"))
    assert(graft.cli.HgtGet.usage.startsWith("usage: HgtGet MANIFEST [DIR] [-c N]"))
  }

  test("hgtload raster -s LNG LAT: rectangular windows tile the grid exactly") {
    // 3x3 grid, 2-wide x 3-tall windows → 2 column bands x 1 row band
    val sqls = graft.cli.HgtLoad.rasterSql(tileBytes, 47, 6,
      sampleLng = 2, sampleLat = 3, table = "rast")
    assert(sqls.size === 2)
    // and the directory-level import streams every INSERT through the executor
    val dir = java.nio.file.Files.createTempDirectory("clirast").toFile
    java.nio.file.Files.write(new java.io.File(dir, "N47E006.hgt").toPath, tileBytes)
    val seen = scala.collection.mutable.ArrayBuffer[String]()
    val n = graft.cli.HgtLoad.importRaster(dir.getAbsolutePath, 2, 3, "rast",
      (sql: String) => seen += sql)
    assert(n === 2 && seen.toSeq === sqls)
  }
}
