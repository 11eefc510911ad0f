package graft.cli

import graft.hgt.{HgtCodec, Sinks}
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
import java.util.zip.ZipInputStream

/** CLI facades mirroring the reference's three console commands
  * (SURVEY.md Appendix B), so a gmalt/cli user can switch 1:1:
  *
  *   gmalt-hgtread LAT LNG FILE  → [[HgtRead]]
  *   gmalt-hgtget  DATASET DIR   → [[HgtGet]] (the unzip/verify stage;
  *                                  network fetch is env-gated here —
  *                                  the manifest lists local zips)
  *   gmalt-hgtload DIR           → [[HgtLoad]] (value mode → parquet
  *                                  or SQL text; raster mode → WKB SQL)
  *
  * Each main is a thin wrapper over a pure, spec-tested core.
  */
object HgtRead {
  /** Elevation at (lat, lng) from one tile file; None for void. */
  def read(lat: Double, lng: Double, file: String): Option[Short] = {
    val bytes = Files.readAllBytes(Paths.get(file))
    val name = Paths.get(file).getFileName.toString
    val (swLat, swLng) = HgtCodec.parseTileName(name)
    val alt = HgtCodec.lookup(bytes, swLat, swLng, lat, lng)
    if (alt == HgtCodec.Void) None else Some(alt)
  }

  def main(args: Array[String]): Unit = {
    val Array(lat, lng, file) = args
    read(lat.toDouble, lng.toDouble, file) match {
      case Some(alt) => println(s"elevation: $alt")
      case None      => println("elevation: void")
    }
  }
}

object HgtGet {
  /** Extract every *.hgt entry from the listed zip archives into
    * workDir, skipping files that already exist (reference R8 skip
    * logic). Returns extracted file names. */
  def extract(zips: Seq[String], workDir: String): Seq[String] = {
    Files.createDirectories(Paths.get(workDir))
    zips.flatMap { zip =>
      val in = new ZipInputStream(Files.newInputStream(Paths.get(zip)))
      try {
        Iterator.continually(in.getNextEntry).takeWhile(_ != null)
          .filter(_.getName.toLowerCase.endsWith(".hgt"))
          .flatMap { entry =>
            val target = Paths.get(workDir, Paths.get(entry.getName).getFileName.toString)
            if (Files.exists(target)) None // skip already-downloaded
            else {
              Files.copy(in, target)
              Some(target.getFileName.toString)
            }
          }.toList
      } finally in.close()
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(manifest, workDir) = args
    // manifest: one entry per line — http(s) URLs are downloaded into
    // workDir through the worker-pool Fetch stage (network env-gated,
    // see Fetch.urlFetcher), local zip paths are extracted directly.
    val lines = Files.readAllLines(Paths.get(manifest))
      .toArray.map(_.toString).filter(_.nonEmpty)
    val (urls, locals) = lines.toSeq.partition(
      l => l.startsWith("http://") || l.startsWith("https://"))
    val fetched = if (urls.isEmpty) Seq.empty[String] else {
      Files.createDirectories(Paths.get(workDir))
      val tasks = graft.hgt.Fetch.plan(urls, workDir)
      val log = graft.hgt.Fetch.run(tasks, graft.hgt.Fetch.urlFetcher())
      log.foreach(println)
      // failed downloads are reported, not extracted
      tasks.zip(log).collect { case (t, o) if !o.startsWith("FAIL") => t.target }
    }
    val got = extract(locals ++ fetched, workDir)
    println(s"extracted ${got.size} tiles: ${got.mkString(", ")}")
  }
}

object HgtLoad {
  /** Value-mode load: decode every tile under inDir, write the point
    * table as parquet at outDir (the cluster-era "SQL import" — a
    * warehouse-format table instead of row-at-a-time INSERTs). */
  def loadParquet(spark: SparkSession, inDir: String, outDir: String): Long = {
    val pts = HgtCodec.points(spark, inDir)
    pts.write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Windowed value-mode load through the DSv2 `hgt` source: tiles
    * outside the box are pruned at PLANNING time (never opened) and
    * surviving tiles decode only the box's index window — the load
    * path for "give me this region of the planet set". Void samples
    * are dropped during decode (pushed `alt != -32768`). */
  def loadParquetWindow(spark: SparkSession, inDir: String, outDir: String,
                        latMin: Double, latMax: Double,
                        lngMin: Double, lngMax: Double): Long = {
    import org.apache.spark.sql.functions.col
    spark.read.format("hgt").load(inDir)
      .filter(col("lat") >= latMin && col("lat") <= latMax &&
        col("lng") >= lngMin && col("lng") <= lngMax &&
        col("alt") =!= HgtCodec.Void)
      .write.mode("overwrite").parquet(outDir)
    spark.read.parquet(outDir).count()
  }

  /** Raster-mode load: sample windows of sampleDeg and emit PostGIS
    * raster INSERT statements (golden-testable; a JDBC executor would
    * consume the same strings). */
  def rasterSql(bytes: Array[Byte], swLat: Int, swLng: Int,
                sampleEvery: Int, table: String): Seq[String] = {
    val n = HgtCodec.gridSize(bytes.length)
    val step = 1.0 / (n - 1)
    (0 until n by sampleEvery).flatMap { r0 =>
      (0 until n by sampleEvery).map { c0 =>
        val h = math.min(sampleEvery, n - r0)
        val w = math.min(sampleEvery, n - c0)
        val samples = Array.tabulate(h * w) { i =>
          val r = r0 + i / w
          val c = c0 + i % w
          (((bytes(2 * (r * n + c)) & 0xff) << 8) | (bytes(2 * (r * n + c) + 1) & 0xff)).toShort
        }
        val hex = Sinks.rasterWkbHex(swLng + c0 * step, swLat + 1 - r0 * step, step, w, h, samples)
        Sinks.rasterInsertSql(table, hex)
      }
    }
  }

  /** `HgtLoad IN OUT` → full load; `HgtLoad IN OUT latMin latMax
    * lngMin lngMax` → windowed load via the pruning DSv2 source. */
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master(
      s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val n = args match {
        case Array(inDir, outDir) => loadParquet(spark, inDir, outDir)
        case Array(inDir, outDir, a, b, c, d) =>
          loadParquetWindow(spark, inDir, outDir, a.toDouble, b.toDouble, c.toDouble, d.toDouble)
        case _ => sys.error("usage: HgtLoad IN OUT [latMin latMax lngMin lngMax]")
      }
      println(s"loaded $n points -> ${args(1)}")
    } finally spark.stop()
  }
}
