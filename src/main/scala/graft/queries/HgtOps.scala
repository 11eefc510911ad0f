package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's OWN data path (SURVEY.md §2.1 R1/R2/R4) as an
  * oracle-declared key (r19, VERDICT r18 next #6). Through r18 the
  * HGT surface carried unit/golden/property coverage only — honest
  * (the fixtures ship no HGT tiles and this box has no network), but
  * the one §2 family without a green CORRECTNESS row. The closure:
  * the tile CONTENT is a pure arithmetic function of (tile seed, grid
  * row, grid col), so the engine can synthesize real binary tiles
  * once (under the versioned staging discipline), decode them through
  * the REAL DSv2 `hgt` source — filename-box pruning, pushed lat/lng
  * bounds, big-endian int16 decode, void filtering, the exact
  * production path — while DuckDB regenerates the same grid from
  * `range()` and the same formulas, never touching a byte of binary.
  * A decode bug, an endianness slip, a row-orientation flip, or a
  * lost void all hash-mismatch.
  *
  * Float-exactness by construction (SURVEY.md §2.2 discipline): the
  * grid is n = 65 samples per tile edge, so the sample step is
  * 1/64 — a POWER-OF-TWO reciprocal, exactly representable in an IEEE
  * double. Every lat/lng the decoder emits (swCorner + k·(1/64)) is a
  * dyadic rational both engines compute bit-identically from integer
  * inputs; no rounding is needed anywhere in the key. Elevations are
  * exact small integers. (Real SRTM3 tiles are 1201×1201 — step
  * 1/1200, NOT dyadic; a production oracle would compare integer
  * row/col indexes instead. The 65-grid is the same decode logic —
  * [[graft.hgt.HgtCodec.gridSize]] derives n from the byte length
  * either way.)
  */
object HgtOps {

  /** (seed, SW lat, SW lng) of the synthetic tile set — two adjacent
    * 1°×1° tiles sharing the lat=45 edge, so the key also pins that
    * tile-boundary samples from BOTH tiles survive (the classic
    * off-by-one of grid decoders). */
  private[graft] val Tiles = Seq((0, 45, 6), (1, 44, 6))

  /** Samples per tile edge: n−1 = 64 ⇒ dyadic sample step (above). */
  private[graft] val N = 65

  /** Elevation at (seed, row, col) — row 0 = the tile's NORTH edge,
    * matching the HGT row order. ~1% of samples are voids (−32768),
    * the SRTM no-data value the R4 filter drops. Mirrored verbatim in
    * the DuckDB oracle; all operands stay non-negative so the two
    * engines' `%` agree. */
  private[graft] def altAt(seed: Int, row: Int, col: Int): Int =
    if ((row * 13 + col * 7 + seed) % 101 == 0) -32768
    else (row * 31 + col * 17 + seed * 7) % 4000 - 500

  private def tileName(swLat: Int, swLng: Int): String =
    f"${if (swLat >= 0) "N" else "S"}${math.abs(swLat)}%02d" +
      f"${if (swLng >= 0) "E" else "W"}${math.abs(swLng)}%03d.hgt"

  /** Synthesize the tile set once under the layout root (versioned
    * publish — a formula re-dial bumps the sentinel and republishes;
    * readers of the old version keep valid paths). Returns the
    * published dir the DSv2 source reads. SF-independent: the HGT
    * surface is a decoder, not a scaler — its scale story is
    * one-partition-per-tile planning, already pinned in HgtDsv2Spec. */
  private[graft] def ensureTiles(): java.io.File = {
    val fam = new java.io.File(s"${Layout.layoutRoot}/hgt_tiles")
    val sentinel = s"hgt synthetic v1 n=$N tiles=${Tiles.mkString(";")} " +
      "alt=(r*31+c*17+s*7)%4000-500 void=(r*13+c*7+s)%101==0"
    graft.api.StagedArtifact.publishDir(fam, sentinel) { tmp =>
      Tiles.foreach { case (seed, la, lo) =>
        val bytes = new Array[Byte](N * N * 2)
        var row = 0
        while (row < N) {
          var col = 0
          while (col < N) {
            val a = altAt(seed, row, col)
            val i = (row * N + col) * 2
            bytes(i) = ((a >> 8) & 0xff).toByte // big-endian int16
            bytes(i + 1) = (a & 0xff).toByte
            col += 1
          }
          row += 1
        }
        java.nio.file.Files.write(
          new java.io.File(tmp, tileName(la, lo)).toPath, bytes)
      }
    }
  }

  /** DECLARED: point extraction over the DSv2 `hgt` source — decode
    * both tiles, drop voids (R4), clip to a lat/lng box whose bounds
    * are pushed into the scan (HgtScanBuilder absorbs them into the
    * per-tile row/col window — `PushedFilters` in the explain), and
    * emit the (lat, lng, alt) points. The bbox keeps both tiles in
    * play (it straddles their shared edge) while exercising the
    * pushdown with a non-trivial clip. `dir` is unused by design —
    * the source is the engine's own staged tile set. */
  def qHgtPoints(spark: SparkSession, dir: String): DataFrame = {
    val tiles = ensureTiles()
    spark.read.format("hgt").load(tiles.getPath)
      .filter(col("alt") =!= lit(graft.hgt.HgtCodec.Void))
      .filter(col("lat") >= 44.25 && col("lng") < 6.75)
      .select(col("lat"), col("lng"), col("alt").cast("int").as("alt"))
      .orderBy(col("lat"), col("lng"), col("alt"))
  }

  /** The DuckDB oracle: regenerate the grid arithmetically —
    * `range(0,65) × range(0,65)` per tile, same alt/void formulas,
    * same dyadic lat/lng spellings, same clip — and never parse a
    * binary byte. */
  private[graft] val OracleSql: String =
    s"""WITH tiles(seed, swlat, swlng) AS (VALUES ${
         Tiles.map { case (s, la, lo) => s"($s, $la, $lo)" }.mkString(", ")}),
       |g AS (
       |  SELECT seed, swlat, swlng, tr.range AS row, tc.range AS col
       |  FROM tiles, range(0, $N) tr, range(0, $N) tc),
       |pts AS (
       |  SELECT swlat + 1 - row * (1.0/${N - 1}) AS lat,
       |         swlng + col * (1.0/${N - 1}) AS lng,
       |         CASE WHEN (row*13 + col*7 + seed) % 101 = 0 THEN -32768
       |              ELSE CAST((row*31 + col*17 + seed*7) % 4000 - 500 AS INT)
       |         END AS alt
       |  FROM g)
       |SELECT lat, lng, alt FROM pts
       |WHERE alt <> -32768 AND lat >= 44.25 AND lng < 6.75
       |ORDER BY lat, lng, alt""".stripMargin
}
