package graft.hgt

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** SRTM HGT tile codec — the reference's own data surface re-expressed
  * Spark-first (SURVEY.md §2.1 R1/R2/R4/R5; HGT format facts are the
  * public SRTM spec: 1°×1° tiles, filename = SW corner, big-endian
  * int16, row-major from the NW corner, 1201² (SRTM3) or 3601²
  * (SRTM1) samples, void = −32768).
  *
  * Ingestion path: `spark.read.format("binaryFile")` gives one row per
  * tile (path, content) → `flatMap` decodes to a typed point stream.
  * Each tile decodes independently, so parallelism = #tiles and the
  * decode is embarrassingly parallel at any scale; a DSv2 FileFormat
  * with tile-level pruning is the upgrade path only if per-tile
  * sub-selection matters (SURVEY.md §7.4).
  */
object HgtCodec {

  case class ElevationPoint(lat: Double, lng: Double, alt: Short)

  val Void: Short = -32768

  /** Parse a tile file name like "N47E006.hgt" → SW corner (lat, lng).
    * S and W are negative. */
  def parseTileName(name: String): (Int, Int) = {
    val base = name.toUpperCase.stripSuffix(".HGT")
    val m = "([NS])(\\d{2})([EW])(\\d{3})".r.findFirstMatchIn(base)
      .getOrElse(throw new IllegalArgumentException(s"not an HGT tile name: $name"))
    val lat = m.group(2).toInt * (if (m.group(1) == "N") 1 else -1)
    val lng = m.group(4).toInt * (if (m.group(3) == "E") 1 else -1)
    (lat, lng)
  }

  /** Grid side length from the byte count (shape is inferred from file
    * size — the format has no header). */
  def gridSize(byteLen: Long): Int = {
    val n = math.sqrt(byteLen / 2.0)
    val ni = math.round(n).toInt
    require(ni.toLong * ni * 2 == byteLen, s"not a square int16 grid: $byteLen bytes")
    ni
  }

  /** Big-endian int16 at sample index i. */
  @inline private def sampleAt(bytes: Array[Byte], i: Int): Short =
    (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort

  /** Decode a tile to its full point stream. Row 0 is the NORTH edge
    * (lat = swLat + 1); rows advance southward. keepVoid=false drops
    * −32768 samples (reference R4 void filtering). */
  def decode(bytes: Array[Byte], swLat: Int, swLng: Int,
             keepVoid: Boolean = true): Iterator[ElevationPoint] = {
    val n = gridSize(bytes.length)
    val step = 1.0 / (n - 1)
    Iterator.range(0, n * n).flatMap { i =>
      val alt = sampleAt(bytes, i)
      if (!keepVoid && alt == Void) Iterator.empty
      else {
        val row = i / n
        val col = i % n
        Iterator.single(ElevationPoint(
          lat = swLat + 1 - row * step,
          lng = swLng + col * step,
          alt = alt))
      }
    }
  }

  /** Point lookup (reference R2, `gmalt-hgtread LAT LNG FILE`): nearest
    * grid sample for a coordinate inside the tile. */
  def lookup(bytes: Array[Byte], swLat: Int, swLng: Int,
             lat: Double, lng: Double): Short = {
    val n = gridSize(bytes.length)
    require(lat >= swLat && lat <= swLat + 1 && lng >= swLng && lng <= swLng + 1,
      s"($lat,$lng) outside tile ($swLat,$swLng)")
    val row = math.round((swLat + 1 - lat) * (n - 1)).toInt
    val col = math.round((lng - swLng) * (n - 1)).toInt
    sampleAt(bytes, row * n + col)
  }

  /** Distributed decode of a directory of .hgt files into a typed
    * point Dataset. Void samples are dropped (R4). */
  def points(spark: SparkSession, dir: String): Dataset[ElevationPoint] = {
    import spark.implicits._
    spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.hgt")
      .load(dir)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (path, content) =>
        val name = path.substring(path.lastIndexOf('/') + 1)
        val (swLat, swLng) = parseTileName(name)
        decode(content, swLat, swLng, keepVoid = false)
      }
  }

  /** Area sampling (reference R5, `--sample LNG LAT`): partition points
    * into sx×sy-degree windows and aggregate each window. The groupBy
    * keys are the window's SW corner — one shuffle, any scale. */
  def sampleWindows(points: Dataset[ElevationPoint],
                    sxDeg: Double, syDeg: Double): DataFrame =
    points.toDF()
      .groupBy(
        (floor(col("lng") / sxDeg) * sxDeg).as("win_lng"),
        (floor(col("lat") / syDeg) * syDeg).as("win_lat"))
      .agg(
        count(lit(1)).as("n"),
        min(col("alt")).as("min_alt"),
        max(col("alt")).as("max_alt"),
        round(avg(col("alt")), 2).as("avg_alt"))
      .orderBy(col("win_lat"), col("win_lng"))
}
