package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The raster data model (SURVEY §1.4).
  *
  * Canonical long form — the "pixel frame": one row per pixel,
  * `(rid INT, band INT, px INT, py INT, v DOUBLE)`. Spatial metadata
  * (geotransform, SRS, nodata, kind) lives driver-side in
  * [[graft.core.GeoTransform]] / a catalog DataFrame, mirroring the
  * reference's dataset-header schema (`gdalos_trans.py:374-382`).
  *
  * A packed tile form — `(rid, band, ovr, tx, ty, data ARRAY<DOUBLE>)`
  * with `ts×ts` row-major tiles — mirrors GDAL's block model
  * (`gdalos_trans.py:788-801`) and is the 100 TB storage layout: ~ts²
  * fewer rows to shuffle, and per-tile expressions stay inside
  * whole-stage codegen via higher-order array functions. `pack` /
  * `explode` convert between the two; operators are written against
  * the pixel frame and hold for both via explode-at-the-edges.
  *
  * All generators are `spark.range`-based: generation itself is
  * distributed (no driver-side materialization), so a 10⁹-pixel
  * synthetic raster costs the executors, not the driver.
  */
object PixelFrame {

  /** Deterministic synthetic DEM (A7 analogue of
    * `test_data_generator.py:9-32`, made value-varying so crop/stats
    * are non-trivial): v = (7·px + 13·py) mod 997, with nodata holes
    * where (31·px + 17·py) mod 101 == 0. Integer-valued doubles, so
    * every aggregate over them is order-independent and bit-exact in
    * any engine.
    */
  def dem(s: SparkSession, w: Int, h: Int, ndv: Double = Dem.Ndv): DataFrame = {
    val px = (col("id") % w).cast("int")
    val py = floor(col("id") / w).cast("int")
    s.range(w.toLong * h)
      .select(px.as("px"), py.as("py"))
      .select(lit(0).as("rid"), lit(1).as("band"), col("px"), col("py"),
        when((col("px") * 31 + col("py") * 17) % 101 === 0, lit(ndv))
          .otherwise(((col("px") * 7 + col("py") * 13) % 997).cast("double")).as("v"))
  }

  object Dem {
    /** DTM default nodata (reference `gdalos_trans.py:60`). */
    val Ndv: Double = -32768.0
  }

  /** A stack of n aligned viewshed-style rasters with values in the
    * reference's state alphabet 0..5 (`viewshed_params.py:13-26`):
    * v(rid) = (px·(3+rid) + py·(5+2·rid) + 11·rid) mod 6. Used by the
    * D1–D4 combine operators; rid is the raster index.
    */
  def vsStack(s: SparkSession, n: Int, w: Int, h: Int): DataFrame = {
    val wh = w.toLong * h
    val rid = floor(col("id") / wh).cast("int")
    val rem = (col("id") % wh).cast("long")
    s.range(wh * n)
      .select(rid.as("rid"), (rem % w).cast("int").as("px"),
        floor(rem / w).cast("int").as("py"))
      .select(col("rid"), lit(1).as("band"), col("px"), col("py"),
        ((col("px") * (col("rid") + 3) + col("py") * (col("rid") * 2 + 5)
          + col("rid") * 11) % 6).cast("double").as("v"))
  }

  /** A6 empty-raster generator (`empty_raster.py:9-49`): constant fill
    * over an extent-sized grid.
    */
  def constant(s: SparkSession, w: Int, h: Int, value: Double,
               rid: Int = 0, band: Int = 1): DataFrame =
    s.range(w.toLong * h).select(
      lit(rid).as("rid"), lit(band).as("band"),
      (col("id") % w).cast("int").as("px"),
      floor(col("id") / w).cast("int").as("py"),
      lit(value).as("v"))

  /** A7 synthetic pyramid (`test_data_generator.py:9-32`): level i is a
    * constant-i raster of size (w≫i)×(h≫i), tagged in an `ovr` column
    * per the numbering contract `gdalos_trans.py:72-79`.
    */
  def pyramid(s: SparkSession, w: Int, h: Int, levels: Int): DataFrame = {
    val dfs = (0 until levels).map { i =>
      constant(s, math.max(w >> i, 1), math.max(h >> i, 1), i.toDouble)
        .withColumn("ovr", lit(i))
    }
    dfs.reduce(_ unionByName _)
  }

  /** Pack the pixel frame into ts×ts row-major tiles (A8/A3 layout;
    * GDAL `TILED/BLOCKXSIZE/BLOCKYSIZE`, `gdalos_trans.py:788-801`).
    * Absent pixels inside a tile become `ndv` so `data` is dense:
    * offsets are made explicit and the array is rebuilt by offset.
    */
  def pack(df: DataFrame, ts: Int, ndv: Double,
           extraKeys: Seq[String] = Nil): DataFrame = {
    val off = (col("py") % ts) * ts + (col("px") % ts)
    df.groupBy(Seq(col("rid"), col("band")) ++ extraKeys.map(col) ++ Seq(
        floor(col("px") / ts).cast("int").as("tx"),
        floor(col("py") / ts).cast("int").as("ty")): _*)
      .agg(map_from_entries(collect_list(struct(off.cast("int"), col("v")))).as("m"))
      .select(Seq(col("rid"), col("band")) ++ extraKeys.map(col) ++ Seq(
        col("tx"), col("ty"),
        transform(sequence(lit(0), lit(ts * ts - 1)),
          i => coalesce(element_at(col("m"), i), lit(ndv))).as("data")): _*)
  }

  /** Explode packed tiles back to the pixel frame. */
  def explodeTiles(df: DataFrame, ts: Int): DataFrame =
    df.select(col("rid"), col("band"), col("tx"), col("ty"),
        posexplode(col("data")).as(Seq("off", "v")))
      .select(col("rid"), col("band"),
        (col("tx") * ts + col("off") % ts).cast("int").as("px"),
        (col("ty") * ts + floor(col("off") / ts)).cast("int").as("py"),
        col("v"))

  /** Per-tile map of a scalar pixel function over the packed form —
    * stays inside whole-stage codegen (higher-order `transform`), the
    * Spark analogue of the reference's whole-array numpy execution
    * (`calc/scale_raster.py:28-43`).
    */
  def mapTiles(df: DataFrame, f: Column => Column): DataFrame =
    df.withColumn("data", transform(col("data"), f))

  /** SURVEY §7.4 BinaryType payload variant: the packed tile's
    * `ARRAY<DOUBLE>` (8 bytes/pixel at rest regardless of source
    * dtype) becomes a dtype-tagged `BINARY` of little-endian samples —
    * an Int16 DEM stored at its native width is 4× smaller on disk and
    * on the shuffle wire. `dtypeCode` = sample bit width (8 Byte
    * unsigned, 16 Int16, 32 Float32, 64 Float64 — 64 is bit-exact);
    * the code travels in a `dtype` column so readers self-describe.
    */
  def packBinary(df: DataFrame, dtypeCode: Int): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("data", call_function("tile_pack", col("data"), lit(dtypeCode)))
      .withColumn("dtype", lit(dtypeCode))
  }

  /** Inverse of [[packBinary]]: back to the `ARRAY<DOUBLE>` form the
    * expression layer computes on.
    */
  def unpackBinary(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.withColumn("data", call_function("tile_unpack", col("data"), col("dtype")))
      .drop("dtype")
  }
}
