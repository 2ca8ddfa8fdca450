package graft.raster

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** D1–D5 viewshed combine aggregates — exact ports of
  * `calc/gdalos_combine.py:13-81` per-pixel semantics, re-expressed as
  * hash aggregations over the pixel frame: `groupBy(band,px,py)` gets
  * map-side partial aggregation and shuffles only one row per pixel
  * regardless of stack depth N (the reference caps N at 254/1000,
  * `viewshed_calc.py:245-247`; this formulation has no such cap).
  *
  * State alphabet and sentinels from `viewshed_params.py:13-26`:
  * threshold 4 (st_hidbut), in-ndv 0 (st_nodata), combine-ndv 255,
  * multi-value 254.
  */
object Combine {
  val Threshold = 4.0
  val InNdv = 0.0
  val CombNdv = 255.0
  val MultiVal = 254.0

  private def perPixel(df: DataFrame, aggs: Seq[Column]): DataFrame =
    df.groupBy("band", "px", "py").agg(aggs.head, aggs.tail: _*)

  /** D1 `vs_max` (`gdalos_combine.py:13-19`). */
  def vsMax(df: DataFrame): DataFrame =
    perPixel(df, Seq(max("v").as("v")))

  /** D1 `vs_min` (`gdalos_combine.py:22-28`). */
  def vsMin(df: DataFrame): DataFrame =
    perPixel(df, Seq(min("v").as("v")))

  /** D2 `vs_count` (`gdalos_combine.py:31-39`): per-pixel count of
    * rasters with value > threshold.
    */
  def vsCount(df: DataFrame, threshold: Double = Threshold): DataFrame =
    perPixel(df, Seq(
      sum(when(col("v") > threshold, 1L).otherwise(0L)).cast("double").as("v")))

  /** D3 `vs_count_z` (`gdalos_combine.py:42-55`): like vsCount, but a
    * pixel whose every input equals inNdv yields outNdv.
    */
  def vsCountZ(df: DataFrame, threshold: Double = Threshold,
               inNdv: Double = InNdv, outNdv: Double = CombNdv): DataFrame =
    perPixel(df, Seq(
      sum(when(col("v") > threshold, 1L).otherwise(0L)).as("cnt"),
      sum(when(col("v") =!= inNdv, 1L).otherwise(0L)).as("nonNdv")))
      .select(col("band"), col("px"), col("py"),
        when(col("nonNdv") === 0, lit(outNdv))
          .otherwise(col("cnt").cast("double")).as("v"))

  /** D4 `vs_unique` (`gdalos_combine.py:58-69`): the index of the
    * single covering raster; multiVal if more than one covers, allZero
    * if none does. "Covers" = value > threshold.
    */
  def vsUnique(df: DataFrame, threshold: Double = Threshold,
               multiVal: Double = MultiVal, allZero: Double = CombNdv): DataFrame =
    perPixel(df, Seq(
      sum(when(col("v") > threshold, 1L).otherwise(0L)).as("nz"),
      max(when(col("v") > threshold, col("rid"))).as("uniq")))
      .select(col("band"), col("px"), col("py"),
        when(col("nz") === 0, lit(allZero))
          .when(col("nz") > 1, lit(multiVal))
          .otherwise(col("uniq").cast("double")).as("v"))

  /** D5 LOS matrix reduce (`los_operation`,
    * `viewshed_calc.py:1008-1021`): obs×tar visibility rows reduced
    * per target — count of seeing observers, or the unique observer
    * index with the same 254/255 sentinels.
    */
  def losMatrixCount(df: DataFrame, targetCol: String, visibleCol: String): DataFrame =
    df.groupBy(targetCol)
      .agg(sum(when(col(visibleCol), 1L).otherwise(0L)).as("seen_by"))

  def losMatrixUnique(df: DataFrame, targetCol: String, obsCol: String,
                      visibleCol: String): DataFrame =
    df.groupBy(targetCol)
      .agg(sum(when(col(visibleCol), 1L).otherwise(0L)).as("nz"),
        max(when(col(visibleCol), col(obsCol))).as("uniq"))
      .select(col(targetCol),
        when(col("nz") === 0, lit(CombNdv))
          .when(col("nz") > 1, lit(MultiVal))
          .otherwise(col("uniq").cast("double")).as("v"))

  /** The reference's own differential check (D10 /
    * `gdalos_comb_tests.py:97-140`): the same combine computed by a
    * second, independent plan — pivot the stack to one column per rid
    * and reduce with array functions. Used by the test suite to verify
    * the aggregate path; N must be small (pivot widens the row).
    */
  def vsMaxViaPivot(df: DataFrame, n: Int): DataFrame = {
    val pivoted = df.groupBy("band", "px", "py")
      .pivot("rid", 0 until n map (i => i: Any)).agg(first("v"))
    val cols = (0 until n).map(i => col(i.toString))
    pivoted.select(col("band"), col("px"), col("py"), greatest(cols: _*).as("v"))
  }
}
