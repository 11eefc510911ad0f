package graft.hgt

import org.apache.spark.sql.{DataFrame, Dataset}
import java.nio.{ByteBuffer, ByteOrder}

/** SQL-import sinks mirroring the reference's `gmalt-hgtload` surface
  * (SURVEY.md §2.1 R6/R7): value mode (one row per sample) and PostGIS
  * raster mode. This environment has no database and no network, so
  * the JDBC path is behind an interface and everything testable is the
  * *generated* SQL/WKB — golden-file checked (SURVEY.md §5.2-4).
  *
  * At scale the real write is `df.write.jdbc(url, table, props)` with
  * `batchsize`/`numPartitions` tuning — each partition opens one
  * connection and streams batched inserts; no driver bottleneck.
  */
object Sinks {

  /** Value-mode DDL (reference creates the table if absent). */
  def valueTableDdl(table: String): String =
    s"""CREATE TABLE IF NOT EXISTS $table (
       |  lat DOUBLE PRECISION NOT NULL,
       |  lng DOUBLE PRECISION NOT NULL,
       |  alt SMALLINT
       |)""".stripMargin

  /** Batched multi-row INSERT text for one partition's worth of
    * points — what each executor would send over JDBC. */
  def valueInsertSql(table: String, points: Seq[HgtCodec.ElevationPoint],
                     batchSize: Int = 1000): Seq[String] =
    points.grouped(batchSize).map { batch =>
      val rows = batch.map(p => s"(${p.lat}, ${p.lng}, ${p.alt})").mkString(", ")
      s"INSERT INTO $table (lat, lng, alt) VALUES $rows"
    }.toSeq

  /** Geometry-mode point literal (PostGIS WKT). */
  def pointWkt(lat: Double, lng: Double): String = s"POINT($lng $lat)"

  /** Minimal PostGIS raster WKB for one rectangular window of int16
    * samples: header (version 0, 1 band, scale/skew/origin, srid,
    * width, height) + one in-db 16BSI band. Layout follows the
    * published PostGIS raster WKB format; little-endian. */
  def rasterWkb(originLng: Double, originLat: Double,
                pxSizeDeg: Double, width: Int, height: Int,
                samples: Array[Short], srid: Int = 4326,
                nodata: Short = HgtCodec.Void): Array[Byte] = {
    require(samples.length == width * height, "samples must fill the grid")
    val buf = ByteBuffer.allocate(1 + 2 + 2 + 8 * 6 + 4 + 2 + 2 + (1 + 2) + 2 * samples.length)
      .order(ByteOrder.LITTLE_ENDIAN)
    buf.put(1.toByte)            // endianness: 1 = NDR (little)
    buf.putShort(0.toShort)      // version
    buf.putShort(1.toShort)      // nBands
    buf.putDouble(pxSizeDeg)     // scaleX
    buf.putDouble(-pxSizeDeg)    // scaleY (north-up rasters are negative)
    buf.putDouble(originLng)     // ipX
    buf.putDouble(originLat)     // ipY
    buf.putDouble(0.0)           // skewX
    buf.putDouble(0.0)           // skewY
    buf.putInt(srid)
    buf.putShort(width.toShort)
    buf.putShort(height.toShort)
    // band header: pixel type 5 = 16BSI, flags: hasNodata(bit6)
    buf.put((5 | 0x40).toByte)
    buf.putShort(nodata)         // nodata value, same pixel type
    samples.foreach(buf.putShort)
    buf.array()
  }

  def rasterWkbHex(originLng: Double, originLat: Double, pxSizeDeg: Double,
                   width: Int, height: Int, samples: Array[Short]): String =
    rasterWkb(originLng, originLat, pxSizeDeg, width, height, samples)
      .map(b => f"${b & 0xff}%02x").mkString

  /** Raster-mode INSERT text for one window. */
  def rasterInsertSql(table: String, wkbHex: String): String =
    s"INSERT INTO $table (rast) VALUES ('$wkbHex'::raster)"

  /** The JDBC write the reference's import reduces to, behind an
    * interface so tests can capture SQL instead of a socket. */
  trait SqlExecutor { def execute(sql: String): Unit }

  /** Drive a full value-mode import through an executor: DDL once,
    * then per-partition batched inserts. With a real JDBC executor
    * this runs distributed via foreachPartition. */
  def importValues(points: Dataset[HgtCodec.ElevationPoint], table: String,
                   executorFactory: () => SqlExecutor, batchSize: Int = 1000): Unit = {
    executorFactory().execute(valueTableDdl(table))
    points.foreachPartition { it: Iterator[HgtCodec.ElevationPoint] =>
      val exec = executorFactory()
      it.grouped(batchSize).foreach { batch =>
        valueInsertSql(table, batch.toSeq, batchSize).foreach(exec.execute)
      }
    }
  }
}
