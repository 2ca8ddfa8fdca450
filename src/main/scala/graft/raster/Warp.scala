package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.GeoTransform

/** Cross-SRS / cross-grid gather-warp (the reference's `gdal.Warp`
  * dispatch, `gdalos_trans.py:842-858`) and the E1 arbitrary-ratio
  * resampling path: for every TARGET pixel, inverse-project its center
  * into source grid coordinates, gather the kernel's source
  * neighborhood by equi-join on pixel keys, and reduce with
  * nodata-renormalized kernel weights.
  *
  * Plan shape (the one that scales): target-grid `range` → codegen'd
  * inverse projection (native Catalyst expressions, no UDFs) →
  * bounded tap fan-out (taps² rows/pixel) → ONE equi-join against the
  * source pixels → ONE aggregation keyed by target pixel. Both
  * shuffles key on pixel coordinates; at 100 TB the same plan holds
  * with tile-quantized join keys (join a tap to its source TILE, then
  * match within) — the join volume is identical, only the key
  * granularity changes. No driver-side pixel work.
  *
  * Determinism: each tap occupies a fixed slot in a conditional
  * aggregation (`max(when(tap = i, …))` — at most one row per slot),
  * and slots fold in a fixed left-associated order, so results are
  * bit-reproducible across partitionings and engines (the DuckDB
  * oracle mirrors the same chain).
  */
object Warp {

  /** Per-axis resampling kernel: support radius (taps = 2·radius per
    * axis) and the weight at fractional distance d ≥ 0.
    */
  sealed abstract class Kernel(val radius: Int) {
    def weight(d: Column): Column
  }

  /** Triangle kernel — GDAL `bilinear` (`gdalos_types.py:40-41`). */
  case object Bilinear extends Kernel(1) {
    def weight(d: Column): Column = greatest(lit(1.0) - d, lit(0.0))
  }

  /** Catmull-Rom cubic (a = −1/2) — GDAL `cubic`
    * (`gdalos_types.py:42-43`). Reproduces linear ramps exactly.
    */
  case object Cubic extends Kernel(2) {
    def weight(d: Column): Column =
      when(d < 1, ((lit(1.5) * d - lit(2.5)) * d) * d + lit(1.0))
        .when(d < 2, ((lit(-0.5) * d + lit(2.5)) * d - lit(4.0)) * d + lit(2.0))
        .otherwise(lit(0.0))
  }

  /** Cubic B-spline — GDAL `cubicspline` (`gdalos_types.py:44-45`):
    * smoothing kernel, everywhere-positive weights.
    */
  case object CubicSpline extends Kernel(2) {
    def weight(d: Column): Column =
      when(d < 1, lit(2.0 / 3) - d * d + d * d * d / lit(2.0))
        .when(d < 2, pow(lit(2.0) - d, lit(3.0)) / lit(6.0))
        .otherwise(lit(0.0))
  }

  /** Lanczos-3 windowed sinc — GDAL `lanczos` (`gdalos_types.py:46-47`). */
  case object Lanczos extends Kernel(3) {
    private def sinc(x: Column): Column = {
      val px = x * math.Pi
      when(x === 0, lit(1.0)).otherwise(sin(px) / px)
    }
    def weight(d: Column): Column =
      when(d < 3, sinc(d) * sinc(d / lit(3.0))).otherwise(lit(0.0))
  }

  /** Warp `src` (a rid/band/px/py/v pixel frame on grid `srcGt`) onto
    * the target grid (`dstGt`, dstW×dstH). `invMap` maps target-CRS
    * geo coordinates (columns) to SOURCE-CRS geo coordinates — iff
    * the grids share a CRS this is identity and the operator is a
    * pure regrid/rescale (the E1 arbitrary-ratio case). Source pixels
    * equal to `ndv` (and taps off the source raster) drop out of the
    * weighted sum; their weight renormalizes away (GDAL edge
    * semantics). All-invalid neighborhoods emit `ndv`.
    */
  def warp(src: DataFrame, srcGt: GeoTransform,
           dstGt: GeoTransform, dstW: Int, dstH: Int,
           invMap: (Column, Column) => (Column, Column),
           ndv: Double, kernel: Kernel = Bilinear,
           knownPlanes: Option[Seq[(Int, Int)]] = None): DataFrame = {
    require(srcGt.isNorthUp && dstGt.isNorthUp, "warp supports north-up grids")
    val spark = src.sparkSession
    // one target grid per (rid, band) of the source — a multi-raster/
    // multi-band frame warps each plane independently. At cluster
    // scale the caller passes this tiny universe from the raster
    // catalog (`knownPlanes`) so no scan of the data is needed; the
    // distinct fallback keeps the API closed when no catalog exists
    val planes = broadcast(planesFrame(spark, src, knownPlanes))
    val grid = planes.crossJoin(spark.range(dstW.toLong * dstH).select(
      (col("id") % dstW).cast("int").as("px"),
      (col("id") / dstW).cast("int").as("py")))

    // target pixel center → target geo → source geo → fractional
    // source pixel coords (pixel-center convention: center of source
    // pixel k is at fractional coordinate k)
    val gx = lit(dstGt.c0) + (col("px") + lit(0.5)) * lit(dstGt.c1)
    val gy = lit(dstGt.c3) + (col("py") + lit(0.5)) * lit(dstGt.c5)
    val (sx, sy) = invMap(gx, gy)
    val fx = (sx - lit(srcGt.c0)) / lit(srcGt.c1) - lit(0.5)
    val fy = (sy - lit(srcGt.c3)) / lit(srcGt.c5) - lit(0.5)
    val anchored = grid.select(col("rid"), col("band"), col("px"), col("py"),
      floor(fx).cast("int").as("ax"), floor(fy).cast("int").as("ay"),
      (fx - floor(fx)).as("ox"), (fy - floor(fy)).as("oy"))

    // tap offsets per axis: -radius+1 .. radius around the anchor
    val offs = (-kernel.radius + 1) to kernel.radius
    val tapList = for { dy <- offs; dx <- offs } yield (dx, dy)
    val taps = anchored.select(col("rid"), col("band"), col("px"), col("py"),
        col("ax"), col("ay"), col("ox"), col("oy"),
        posexplode(array(tapList.map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy"))
        }: _*)).as(Seq("tap", "t")))
      .select(col("rid"), col("band"), col("px"), col("py"), col("tap"),
        (col("ax") + col("t.dx")).as("jx"), (col("ay") + col("t.dy")).as("jy"),
        (kernel.weight(abs(col("t.dx") - col("ox"))) *
          kernel.weight(abs(col("t.dy") - col("oy")))).as("w"))

    val srcPix = src.select(col("rid"), col("band"),
      col("px").as("jx"), col("py").as("jy"), col("v").as("sv"))
    val joined = taps.join(srcPix, Seq("rid", "band", "jx", "jy"), "left")
      .withColumn("valid", col("sv").isNotNull && col("sv") =!= ndv)

    // fixed-slot pivot + left-associated fold → bit-deterministic
    def slotAgg(body: Column, i: Int): Column =
      coalesce(max(when(col("tap") === i && col("valid"), body)), lit(0.0))
    val slotCols = tapList.indices.flatMap(i =>
      Seq(slotAgg(col("w"), i).as(s"w$i"), slotAgg(col("w") * col("sv"), i).as(s"wv$i")))
    val wSum = tapList.indices.map(i => col(s"w$i")).reduceLeft(_ + _)
    val wvSum = tapList.indices.map(i => col(s"wv$i")).reduceLeft(_ + _)
    joined.groupBy("rid", "band", "px", "py")
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col("rid"), col("band"), col("px"), col("py"),
        when(wSum > 0, wvSum / wSum).otherwise(lit(ndv)).as("v"))
  }

  /** Plane universe for the target grid: a literal frame when the
    * caller knows it (catalog-driven — zero data scans), else a
    * distinct over the source.
    */
  private def planesFrame(spark: org.apache.spark.sql.SparkSession,
                          src: DataFrame,
                          known: Option[Seq[(Int, Int)]]): DataFrame =
    known match {
      case Some(ps) =>
        require(ps.nonEmpty, "knownPlanes must be non-empty")
        import spark.implicits._
        ps.toDF("rid", "band")
      case None => src.select("rid", "band").distinct()
    }

  /** The packed-tile form of [[warp]] — the 100 TB shape. Source is
    * the A8/A3 tile table `(rid, band, tx, ty, data: array)` (ts×ts
    * row-major, ndv-padded edges): taps join on the TILE key and the
    * tap value is extracted from the tile array by offset, so the
    * source side of the shuffle is ts² × smaller (tile rows, never
    * exploded pixels) and stays the storage layout parquet already
    * has. Slot algebra and fold order are identical to [[warp]], so
    * results are bit-equal (asserted in WarpSpec).
    */
  def warpPacked(tiles: DataFrame, ts: Int, srcGt: GeoTransform,
                 dstGt: GeoTransform, dstW: Int, dstH: Int,
                 invMap: (Column, Column) => (Column, Column),
                 ndv: Double, kernel: Kernel = Bilinear,
                 knownPlanes: Option[Seq[(Int, Int)]] = None): DataFrame = {
    require(srcGt.isNorthUp && dstGt.isNorthUp, "warp supports north-up grids")
    val spark = tiles.sparkSession
    val planes = broadcast(planesFrame(spark, tiles, knownPlanes))
    val grid = planes.crossJoin(spark.range(dstW.toLong * dstH).select(
      (col("id") % dstW).cast("int").as("px"),
      (col("id") / dstW).cast("int").as("py")))

    val gx = lit(dstGt.c0) + (col("px") + lit(0.5)) * lit(dstGt.c1)
    val gy = lit(dstGt.c3) + (col("py") + lit(0.5)) * lit(dstGt.c5)
    val (sx, sy) = invMap(gx, gy)
    val fx = (sx - lit(srcGt.c0)) / lit(srcGt.c1) - lit(0.5)
    val fy = (sy - lit(srcGt.c3)) / lit(srcGt.c5) - lit(0.5)
    val anchored = grid.select(col("rid"), col("band"), col("px"), col("py"),
      floor(fx).cast("int").as("ax"), floor(fy).cast("int").as("ay"),
      (fx - floor(fx)).as("ox"), (fy - floor(fy)).as("oy"))

    val offs = (-kernel.radius + 1) to kernel.radius
    val tapList = for { dy <- offs; dx <- offs } yield (dx, dy)
    val taps = anchored.select(col("rid"), col("band"), col("px"), col("py"),
        col("ax"), col("ay"), col("ox"), col("oy"),
        posexplode(array(tapList.map { case (dx, dy) =>
          struct(lit(dx).as("dx"), lit(dy).as("dy"))
        }: _*)).as(Seq("tap", "t")))
      .select(col("rid"), col("band"), col("px"), col("py"), col("tap"),
        (col("ax") + col("t.dx")).as("jx"), (col("ay") + col("t.dy")).as("jy"),
        (kernel.weight(abs(col("t.dx") - col("ox"))) *
          kernel.weight(abs(col("t.dy") - col("oy")))).as("w"))
      // tile key + in-tile offset (floor division — taps can be negative)
      .withColumn("jtx", floor(col("jx").cast("double") / ts).cast("int"))
      .withColumn("jty", floor(col("jy").cast("double") / ts).cast("int"))
      .withColumn("joff",
        ((col("jy") - col("jty") * ts) * ts + (col("jx") - col("jtx") * ts) + 1).cast("int"))

    val tileSide = tiles.select(col("rid"), col("band"),
      col("tx").as("jtx"), col("ty").as("jty"), col("data"))
    val joined = taps.join(tileSide, Seq("rid", "band", "jtx", "jty"), "left")
      .withColumn("sv", element_at(col("data"), col("joff")))
      .withColumn("valid", col("sv").isNotNull && col("sv") =!= ndv)

    def slotAgg(body: Column, i: Int): Column =
      coalesce(max(when(col("tap") === i && col("valid"), body)), lit(0.0))
    val slotCols = tapList.indices.flatMap(i =>
      Seq(slotAgg(col("w"), i).as(s"w$i"), slotAgg(col("w") * col("sv"), i).as(s"wv$i")))
    val wSum = tapList.indices.map(i => col(s"w$i")).reduceLeft(_ + _)
    val wvSum = tapList.indices.map(i => col(s"wv$i")).reduceLeft(_ + _)
    joined.groupBy("rid", "band", "px", "py")
      .agg(slotCols.head, slotCols.tail: _*)
      .select(col("rid"), col("band"), col("px"), col("py"),
        when(wSum > 0, wvSum / wSum).otherwise(lit(ndv)).as("v"))
  }
}
