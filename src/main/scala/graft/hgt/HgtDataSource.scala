package graft.hgt

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 `hgt` format — SRTM tiles as a first-class Spark
  * source with TILE-LEVEL PARTITION PRUNING and SUB-TILE WINDOWING
  * (SURVEY.md §2.1 R1 "custom DSv2 FileFormat" upgrade path, §7.4).
  *
  * `spark.read.format("hgt").load(dir)` → schema (lat, lng, alt).
  *
  * Why this beats the `binaryFile`+flatMap path at scale (SCALE.md):
  *  - **Tile pruning.** Each 1°×1° tile's bounding box is encoded in
  *    its FILENAME (public SRTM convention), so lat/lng range filters
  *    prune whole files at PLANNING time — a global query with a
  *    0.5°-window predicate reads 1-4 tiles of a 14k-tile planet, not
  *    all of them. `binaryFile` must open every file.
  *  - **Sub-tile windowing.** The residual lat/lng bounds convert to a
  *    row/col index window inside each surviving tile (the grid is
  *    affine in the index), so a reader decodes ~(Δlat·Δlng·n²)
  *    samples, not n². Boundary rows are included generously — Spark
  *    re-evaluates every filter post-scan, so pruning here can only
  *    skip rows a filter would drop anyway, never change results.
  *  - **Void-filter pushdown.** `alt != -32768` (reference R4) is
  *    detected and applied during decode, before rows materialize.
  *  - **Column pruning.** An `avg(alt)` query decodes int16s without
  *    computing lat/lng doubles per sample.
  *
  * One InputPartition per tile: decode stays embarrassingly parallel
  * (parallelism = surviving tiles), no shuffle, and a 1000-executor
  * cluster schedules tiles like any file-based scan. Readers re-open
  * the file with the SESSION Hadoop conf captured at planning time
  * and shipped via [[SerializableHadoopConf]], so `spark.hadoop.*`
  * overrides (S3A credentials, alternate defaultFS) resolve the same
  * on executors as on the driver — parity with built-in file sources.
  *
  * Registered in META-INF/services as `hgt`; equality with the
  * binaryFile+flatMap decoder and the pruning behavior are asserted
  * in HgtDsv2Spec.
  */
class HgtDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hgt"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HgtDataSource.Schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException("hgt source requires a path"))
    new HgtTable(path)
  }
}

object HgtDataSource {
  val Schema: StructType = StructType(Seq(
    StructField("lat", DoubleType, nullable = false),
    StructField("lng", DoubleType, nullable = false),
    StructField("alt", ShortType, nullable = false)))

  /** Conjunctive lat/lng bounds harvested from pushed filters; absent
    * side = unbounded. `dropVoid` carries the R4 pushdown. */
  case class Bounds(latMin: Double = Double.NegativeInfinity,
                    latMax: Double = Double.PositiveInfinity,
                    lngMin: Double = Double.NegativeInfinity,
                    lngMax: Double = Double.PositiveInfinity,
                    dropVoid: Boolean = false) {
    def intersectsTile(swLat: Int, swLng: Int): Boolean =
      latMin <= swLat + 1 && latMax >= swLat &&
        lngMin <= swLng + 1 && lngMax >= swLng
  }
}

private[hgt] class HgtTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"hgt:$path"
  override def schema(): StructType = HgtDataSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HgtScanBuilder(path)
}

private[hgt] class HgtScanBuilder(path: String)
    extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  import HgtDataSource._

  private var bounds = Bounds()
  private var accepted = Array.empty[Filter]
  private var required: StructType = Schema

  /** Tighten `bounds` from one conjunct; true if the filter was
    * usable. Strict `<`/`>` tighten like `<=`/`>=` (still sound: the
    * window only has to be a superset — Spark re-applies the exact
    * predicate post-scan). */
  private def absorb(f: Filter): Boolean = f match {
    case And(l, r) => absorb(l) & absorb(r) // eval both; either may tighten
    case GreaterThan("lat", v: Number)        => bounds = bounds.copy(latMin = math.max(bounds.latMin, v.doubleValue())); true
    case GreaterThanOrEqual("lat", v: Number) => bounds = bounds.copy(latMin = math.max(bounds.latMin, v.doubleValue())); true
    case LessThan("lat", v: Number)           => bounds = bounds.copy(latMax = math.min(bounds.latMax, v.doubleValue())); true
    case LessThanOrEqual("lat", v: Number)    => bounds = bounds.copy(latMax = math.min(bounds.latMax, v.doubleValue())); true
    case EqualTo("lat", v: Number)            => bounds = bounds.copy(latMin = math.max(bounds.latMin, v.doubleValue()), latMax = math.min(bounds.latMax, v.doubleValue())); true
    case GreaterThan("lng", v: Number)        => bounds = bounds.copy(lngMin = math.max(bounds.lngMin, v.doubleValue())); true
    case GreaterThanOrEqual("lng", v: Number) => bounds = bounds.copy(lngMin = math.max(bounds.lngMin, v.doubleValue())); true
    case LessThan("lng", v: Number)           => bounds = bounds.copy(lngMax = math.min(bounds.lngMax, v.doubleValue())); true
    case LessThanOrEqual("lng", v: Number)    => bounds = bounds.copy(lngMax = math.min(bounds.lngMax, v.doubleValue())); true
    case EqualTo("lng", v: Number)            => bounds = bounds.copy(lngMin = math.max(bounds.lngMin, v.doubleValue()), lngMax = math.min(bounds.lngMax, v.doubleValue())); true
    case Not(EqualTo("alt", v: Number)) if v.shortValue() == HgtCodec.Void =>
      bounds = bounds.copy(dropVoid = true); true
    case GreaterThan("alt", v: Number) if v.shortValue() >= HgtCodec.Void =>
      bounds = bounds.copy(dropVoid = true); true
    case _ => false
  }

  /** Every filter is returned as residual — Spark re-evaluates them
    * all post-scan, so the scan's pruning is a pure optimization that
    * can never change results (HgtDsv2Spec proves equality). */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    accepted = filters.filter(absorb)
    filters
  }

  override def pushedFilters(): Array[Filter] = accepted

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new HgtScan(path, bounds, required)
}

private[hgt] class HgtScan(path: String, bounds: HgtDataSource.Bounds,
                           required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"hgt $path bounds=$bounds columns=${required.fieldNames.mkString(",")}"

  /** Driver-side planning: list *.hgt files, prune by the filename-
    * encoded tile box. One partition per surviving tile. */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = SparkSession.active.sessionState.newHadoopConf()
    val root = new HPath(path)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root).iterator
      .filter(s => s.isFile && s.getPath.getName.toLowerCase.endsWith(".hgt"))
      .flatMap { s =>
        val (swLat, swLng) = HgtCodec.parseTileName(s.getPath.getName)
        if (bounds.intersectsTile(swLat, swLng))
          Some(HgtInputPartition(s.getPath.toString, swLat, swLng): InputPartition)
        else None
      }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    HgtReaderFactory(bounds, required.fieldNames,
      new SerializableHadoopConf(SparkSession.active.sessionState.newHadoopConf()))
}

private[hgt] case class HgtInputPartition(path: String, swLat: Int, swLng: Int)
  extends InputPartition

/** Ships the DRIVER's Hadoop conf (including `spark.hadoop.*` session
  * overrides — S3A credentials, alternate defaultFS) to executors.
  * `Configuration` itself is `Writable` but not `Serializable`, so the
  * holder round-trips it through its own Writable form (ADVICE r7:
  * readers previously built `new Configuration()` executor-side and
  * silently dropped session settings the planner had resolved with). */
private[hgt] class SerializableHadoopConf(@transient var value: Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new Configuration(false)
    value.readFields(in)
  }
}

private[hgt] case class HgtReaderFactory(bounds: HgtDataSource.Bounds,
                                         columns: Array[String],
                                         hconf: SerializableHadoopConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    new HgtPartitionReader(partition.asInstanceOf[HgtInputPartition], bounds, columns,
      hconf.value)
}

/** Decodes one tile, restricted to the row/col window implied by the
  * pushed lat/lng bounds. Window edges round OUTWARD (floor/ceil) so
  * boundary samples are never lost to float rounding. */
private[hgt] class HgtPartitionReader(p: HgtInputPartition,
                                      bounds: HgtDataSource.Bounds,
                                      columns: Array[String],
                                      conf: Configuration)
    extends PartitionReader[InternalRow] {

  private val bytes: Array[Byte] = {
    val hp = new HPath(p.path)
    val fs = hp.getFileSystem(conf)
    val len = fs.getFileStatus(hp).getLen.toInt
    val out = new Array[Byte](len)
    val in = fs.open(hp)
    try in.readFully(0, out) finally in.close()
    out
  }
  private val n = HgtCodec.gridSize(bytes.length)
  private val step = 1.0 / (n - 1)

  // lat = swLat + 1 - row*step decreases with row: latMax → first row.
  private val rowFrom = clamp(math.floor((p.swLat + 1 - bounds.latMax) * (n - 1)).toInt)
  private val rowTo = clamp(math.ceil((p.swLat + 1 - bounds.latMin) * (n - 1)).toInt)
  private val colFrom = clamp(math.floor((bounds.lngMin - p.swLng) * (n - 1)).toInt)
  private val colTo = clamp(math.ceil((bounds.lngMax - p.swLng) * (n - 1)).toInt)
  private def clamp(i: Int): Int = math.max(0, math.min(n - 1, i))

  private var row = rowFrom
  private var col = colFrom
  private var current: InternalRow = _

  override def next(): Boolean = {
    while (row <= rowTo) {
      while (col <= colTo) {
        val i = row * n + col
        val alt = (((bytes(2 * i) & 0xff) << 8) | (bytes(2 * i + 1) & 0xff)).toShort
        val c = col; col += 1
        if (!(bounds.dropVoid && alt == HgtCodec.Void)) {
          // explicit Any array: a mapped Array would weak-lub the
          // Short alt into Double and corrupt the ShortType column
          val vals = new Array[Any](columns.length)
          var k = 0
          while (k < columns.length) {
            vals(k) = columns(k) match {
              case "lat" => p.swLat + 1 - row * step
              case "lng" => p.swLng + c * step
              case "alt" => alt
            }
            k += 1
          }
          current = new GenericInternalRow(vals)
          return true
        }
      }
      row += 1; col = colFrom
    }
    false
  }

  override def get(): InternalRow = current
  override def close(): Unit = ()
}
