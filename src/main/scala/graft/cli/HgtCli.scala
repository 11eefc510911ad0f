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
  * Each main is a thin wrapper over a pure, spec-tested core. The
  * OPTION surface (VERDICT r7 #6) matches the reconstructed gmalt
  * flag set [R-med, Appendix B]: `-r` raster mode, `-s/--sample LNG
  * LAT` window sampling, `-c N` concurrency, and
  * `--host/--port/--user/--db/--table` connection flags — parsed by
  * [[CliArgs]] into spec-tested configs with golden usage strings.
  */

/** Minimal argparse-style option parser: declared flags with fixed
  * arities, everything else positional. Pure — `Left(message)` on any
  * violation so each command can append its golden usage text. */
private[cli] object CliArgs {
  case class Parsed(positional: Seq[String], flags: Map[String, Seq[String]])

  /** `arity` maps every accepted flag (including aliases) to its value
    * count; aliases are canonicalized by `alias`. */
  def parse(args: Seq[String], arity: Map[String, Int],
            alias: Map[String, String] = Map.empty): Either[String, Parsed] = {
    val pos = Seq.newBuilder[String]
    val flags = scala.collection.mutable.LinkedHashMap[String, Seq[String]]()
    var rest = args.toList
    while (rest.nonEmpty) {
      val tok = rest.head
      rest = rest.tail
      if (tok.startsWith("-") && tok != "-" &&
          !tok.drop(1).headOption.exists(c => c.isDigit || c == '.')) {
        val name = alias.getOrElse(tok, tok)
        arity.get(name) match {
          case None => return Left(s"unknown option $tok")
          case Some(k) =>
            if (rest.size < k) return Left(s"option $tok expects $k value(s)")
            val (vals, tail) = rest.splitAt(k)
            flags(name) = vals
            rest = tail
        }
      } else pos += tok
    }
    Right(Parsed(pos.result(), flags.toMap))
  }
}
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

  /** Parsed command line: `HgtGet MANIFEST [DIR] [-c N]` (Appendix B:
    * `gmalt-hgtget DATASET [DIR]`, concurrent workers via `-c`). */
  case class Config(manifest: String, workDir: String, concurrency: Int)

  val usage: String =
    "usage: HgtGet MANIFEST [DIR] [-c N]\n" +
      "  MANIFEST  dataset manifest: one zip URL or local path per line\n" +
      "  DIR       work directory (default .)\n" +
      "  -c N      download worker-pool width (default 4)"

  def parse(args: Seq[String]): Either[String, Config] =
    CliArgs.parse(args, Map("-c" -> 1), Map("--concurrency" -> "-c")).flatMap {
      case CliArgs.Parsed(Seq(manifest), f) =>
        Right(Config(manifest, ".", conc(f)))
      case CliArgs.Parsed(Seq(manifest, dir), f) =>
        Right(Config(manifest, dir, conc(f)))
      case _ => Left("expected MANIFEST [DIR]")
    }

  private def conc(f: Map[String, Seq[String]]): Int =
    f.get("-c").map(_.head.toInt).getOrElse(4)

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toSeq) match {
      case Right(c) => c
      case Left(err) => sys.error(s"$err\n$usage")
    }
    // manifest: one entry per line — http(s) URLs are downloaded into
    // workDir through the worker-pool Fetch stage (network env-gated,
    // see Fetch.urlFetcher), local zip paths are extracted directly.
    val lines = Files.readAllLines(Paths.get(cfg.manifest))
      .toArray.map(_.toString).filter(_.nonEmpty)
    val (urls, locals) = lines.toSeq.partition(
      l => l.startsWith("http://") || l.startsWith("https://"))
    val fetched = if (urls.isEmpty) Seq.empty[String] else {
      Files.createDirectories(Paths.get(cfg.workDir))
      val tasks = graft.hgt.Fetch.plan(urls, cfg.workDir)
      val log = graft.hgt.Fetch.run(tasks, graft.hgt.Fetch.urlFetcher(),
        parallelism = cfg.concurrency)
      log.foreach(println)
      // failed downloads are reported, not extracted
      tasks.zip(log).collect { case (t, o) if !o.startsWith("FAIL") => t.target }
    }
    val got = extract(locals ++ fetched, cfg.workDir)
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

  /** Raster-mode load: sample windows of `sampleLng`×`sampleLat`
    * cells (the reference's `-s LNG LAT` pair [R-med]) and emit
    * PostGIS raster INSERT statements (golden-testable; a JDBC
    * executor would consume the same strings). */
  def rasterSql(bytes: Array[Byte], swLat: Int, swLng: Int,
                sampleLng: Int, sampleLat: Int, table: String): Seq[String] = {
    val n = HgtCodec.gridSize(bytes.length)
    val step = 1.0 / (n - 1)
    (0 until n by sampleLat).flatMap { r0 =>
      (0 until n by sampleLng).map { c0 =>
        val h = math.min(sampleLat, n - r0)
        val w = math.min(sampleLng, n - c0)
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

  /** Square-window raster load (the common `-s N N` case). */
  def rasterSql(bytes: Array[Byte], swLat: Int, swLng: Int,
                sampleEvery: Int, table: String): Seq[String] =
    rasterSql(bytes, swLat, swLng, sampleEvery, sampleEvery, table)

  /** Raster-mode import of every tile under `inDir` through a
    * [[Sinks.SqlExecutor]] — the reference's `-r` path: DDL-free here
    * (PostGIS raster tables are created with AddRasterConstraints
    * outside the insert stream), one INSERT per sampled window.
    * Returns the number of INSERTs issued. */
  def importRaster(inDir: String, sampleLng: Int, sampleLat: Int,
                   table: String, executor: Sinks.SqlExecutor): Int = {
    val stream = Files.list(Paths.get(inDir))
    val tiles = try {
      val b = Seq.newBuilder[java.nio.file.Path]
      stream.forEach(p => if (p.getFileName.toString.toLowerCase.endsWith(".hgt")) b += p)
      b.result().sortBy(_.getFileName.toString)
    } finally stream.close()
    var n = 0
    tiles.foreach { p =>
      val (swLat, swLng) = HgtCodec.parseTileName(p.getFileName.toString)
      rasterSql(Files.readAllBytes(p), swLat, swLng, sampleLng, sampleLat, table)
        .foreach { sql => executor.execute(sql); n += 1 }
    }
    n
  }

  /** Parsed command line — the reconstructed gmalt-hgtload option
    * surface (Appendix B [R-med]): `-r` raster mode, `-s LNG LAT`
    * sampling, `-c N` concurrency, --host/--port/--user/--db/--table
    * connection flags; `--out`/`--window` are this engine's
    * warehouse-native value-mode targets. */
  case class Config(inDir: String, raster: Boolean,
                    sampleLng: Int, sampleLat: Int, concurrency: Int,
                    host: String, port: Int, user: String, db: String,
                    table: String, out: Option[String],
                    window: Option[(Double, Double, Double, Double)])

  val usage: String =
    "usage: HgtLoad [-r] [-s LNG LAT] [-c N] [--host H] [--port P]\n" +
      "               [--user U] [--db D] [--table T] [--out PATH]\n" +
      "               [--window LATMIN LATMAX LNGMIN LNGMAX] DIR\n" +
      "  DIR        directory of .hgt tiles to import\n" +
      "  -r         PostGIS raster mode (default: value mode)\n" +
      "  -s LNG LAT raster window size in samples (default 50 50)\n" +
      "  -c N       import concurrency (default 4)\n" +
      "  --host/--port/--user/--db/--table  SQL connection (table default elevation)\n" +
      "  --out PATH value mode: write the point table as parquet here\n" +
      "  --window   value mode: load only this box via the pruning hgt source"

  def parse(args: Seq[String]): Either[String, Config] =
    CliArgs.parse(args,
      Map("-r" -> 0, "-s" -> 2, "-c" -> 1, "--host" -> 1, "--port" -> 1,
        "--user" -> 1, "--db" -> 1, "--table" -> 1, "--out" -> 1,
        "--window" -> 4),
      Map("--sample" -> "-s", "--concurrency" -> "-c")).flatMap {
      case CliArgs.Parsed(Seq(inDir), f) =>
        try {
          val s = f.get("-s").map(v => (v(0).toInt, v(1).toInt)).getOrElse((50, 50))
          Right(Config(inDir,
            raster = f.contains("-r"),
            sampleLng = s._1, sampleLat = s._2,
            concurrency = f.get("-c").map(_.head.toInt).getOrElse(4),
            host = f.get("--host").map(_.head).getOrElse("localhost"),
            port = f.get("--port").map(_.head.toInt).getOrElse(5432),
            user = f.get("--user").map(_.head).getOrElse("postgres"),
            db = f.get("--db").map(_.head).getOrElse("gmalt"),
            table = f.get("--table").map(_.head).getOrElse("elevation"),
            out = f.get("--out").map(_.head),
            window = f.get("--window").map(v =>
              (v(0).toDouble, v(1).toDouble, v(2).toDouble, v(3).toDouble))))
        } catch { case e: NumberFormatException => Left(s"bad numeric option: ${e.getMessage}") }
      case CliArgs.Parsed(pos, _) => Left(s"expected exactly one DIR, got ${pos.size}")
    }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toSeq) match {
      case Right(c) => c
      case Left(err) => sys.error(s"$err\n$usage")
    }
    if (cfg.raster) {
      // raster mode never needs a SparkSession: tiles stream through
      // the window sampler into INSERT text (stdout here; a JDBC
      // executor consumes the same strings — Sinks scaladoc)
      val n = importRaster(cfg.inDir, cfg.sampleLng, cfg.sampleLat, cfg.table,
        (sql: String) => println(sql))
      System.err.println(s"raster mode: $n INSERTs for ${cfg.table}")
      return
    }
    val spark = SparkSession.builder().master(s"local[${cfg.concurrency}]")
      .config("spark.ui.enabled", "false").getOrCreate()
    try {
      val n = (cfg.out, cfg.window) match {
        case (Some(out), None) => loadParquet(spark, cfg.inDir, out)
        case (Some(out), Some((a, b, c, d))) =>
          loadParquetWindow(spark, cfg.inDir, out, a, b, c, d)
        case (None, _) =>
          // SQL value mode: DDL + batched inserts through the executor
          // interface (printed here; env-gated JDBC in production)
          val pts = HgtCodec.points(spark, cfg.inDir)
          System.err.println(
            s"value mode -> ${cfg.user}@${cfg.host}:${cfg.port}/${cfg.db}.${cfg.table}")
          Sinks.importValues(pts, cfg.table, () => (sql: String) => println(sql))
          pts.count()
      }
      println(s"loaded $n points")
    } finally spark.stop()
  }
}
