package graft.sources

import java.util

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.{Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

import scala.jdk.CollectionConverters._

/** A1 as a real DataSourceV2: `spark.read.format("graft.sources.RasterSource")`
  * — the "custom raster source" SURVEY §2 A1 plans for. This instance
  * serves the deterministic synthetic DEM (the A7 generator) straight
  * from executors, but the interesting part is the *connector shape*,
  * which is exactly what a GeoTIFF/COG reader would use:
  *
  *  - one `InputPartition` per raster TILE (the GDAL block model) —
  *    reads parallelize over the tile grid;
  *  - `SupportsPushDownFilters` accepts px/py range predicates and
  *    PRUNES whole tile partitions at planning time — the B2 crop
  *    never touches out-of-window tiles (R3 pushdown, all the way
  *    into the source);
  *  - `SupportsPushDownRequiredColumns` projects at the reader.
  *
  * Options: `w`, `h` (raster size), `ts` (tile size, default 256),
  * `ndv` (default −32768).
  */
class RasterSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RasterSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new RasterTable(
      properties.getOrDefault("w", "256").toInt,
      properties.getOrDefault("h", "256").toInt,
      properties.getOrDefault("ts", "256").toInt,
      properties.getOrDefault("ndv", "-32768").toDouble)
}

object RasterSource {
  val schema: StructType = StructType(Seq(
    StructField("rid", IntegerType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("px", IntegerType, nullable = false),
    StructField("py", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false)))

  /** The A7 synthetic formula (must match PixelFrame.dem). */
  def value(px: Int, py: Int, ndv: Double): Double =
    if ((px * 31 + py * 17) % 101 == 0) ndv
    else ((px * 7 + py * 13) % 997).toDouble
}

class RasterTable(w: Int, h: Int, ts: Int, ndv: Double) extends Table with SupportsRead {
  override def name(): String = s"graft_raster_${w}x$h"
  override def schema(): StructType = RasterSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RasterScanBuilder(w, h, ts, ndv)
}

/** Tile-pruning scan builder: px/py bounds from pushed filters shrink
  * the planned tile grid.
  */
class RasterScanBuilder(w: Int, h: Int, ts: Int, ndv: Double)
  extends ScanBuilder with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var minPx = 0; private var maxPx = w - 1
  private var minPy = 0; private var maxPy = h - 1
  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = RasterSource.schema

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition {
      case GreaterThan("px", _: Int) | GreaterThanOrEqual("px", _: Int)
           | LessThan("px", _: Int) | LessThanOrEqual("px", _: Int)
           | GreaterThan("py", _: Int) | GreaterThanOrEqual("py", _: Int)
           | LessThan("py", _: Int) | LessThanOrEqual("py", _: Int) => true
      case _ => false
    }
    accepted.foreach {
      case GreaterThan("px", v: Int)        => minPx = math.max(minPx, v + 1)
      case GreaterThanOrEqual("px", v: Int) => minPx = math.max(minPx, v)
      case LessThan("px", v: Int)           => maxPx = math.min(maxPx, v - 1)
      case LessThanOrEqual("px", v: Int)    => maxPx = math.min(maxPx, v)
      case GreaterThan("py", v: Int)        => minPy = math.max(minPy, v + 1)
      case GreaterThanOrEqual("py", v: Int) => minPy = math.max(minPy, v)
      case LessThan("py", v: Int)           => maxPy = math.min(maxPy, v - 1)
      case LessThanOrEqual("py", v: Int)    => maxPy = math.min(maxPy, v)
      case _ => ()
    }
    pushed = accepted
    rejected // Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan =
    new RasterScan(minPx, maxPx, minPy, maxPy, ts, ndv, required)
}

class RasterScan(minPx: Int, maxPx: Int, minPy: Int, maxPy: Int,
                 ts: Int, ndv: Double, required: StructType)
  extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    if (minPx > maxPx || minPy > maxPy) return Array.empty
    val parts = for {
      ty <- (minPy / ts) to (maxPy / ts)
      tx <- (minPx / ts) to (maxPx / ts)
    } yield RasterTilePartition(
      math.max(tx * ts, minPx), math.min(tx * ts + ts - 1, maxPx),
      math.max(ty * ts, minPy), math.min(ty * ts + ts - 1, maxPy)): InputPartition
    parts.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RasterReaderFactory(ndv, required.fieldNames)
}

case class RasterTilePartition(x0: Int, x1: Int, y0: Int, y1: Int) extends InputPartition

class RasterReaderFactory(ndv: Double, cols: Array[String])
  extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val t = p.asInstanceOf[RasterTilePartition]
    new PartitionReader[InternalRow] {
      private var px = t.x0 - 1; private var py = t.y0
      override def next(): Boolean = {
        px += 1
        if (px > t.x1) { px = t.x0; py += 1 }
        py <= t.y1
      }
      override def get(): InternalRow = {
        InternalRow.fromSeq(cols.toSeq.map {
          case "rid" => 0
          case "band" => 1
          case "px" => px
          case "py" => py
          case "v" => RasterSource.value(px, py, ndv)
        })
      }
      override def close(): Unit = ()
    }
  }
}
