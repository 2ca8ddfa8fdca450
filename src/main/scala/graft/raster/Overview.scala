package graft.raster

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.core.ResamplingAlg

/** D7 overview/pyramid build + E1 decimation kernels (reference
  * `add_ovr`/`gdalos_ovr`, `gdalos_trans.py:1067-1217`; kernel enum
  * `gdalos_types.py:33-49`; numbering contract `gdalos_trans.py:72-79`:
  * level k is a 2^k downsample).
  *
  * Each level halves both axes: parent pixel (px,py) aggregates the
  * 2×2 child block (2px..2px+1, 2py..2py+1).
  *
  * Scale notes: `average`/`mode` are one shuffle per level on the
  * halved key (row count drops 4× per level, so the whole pyramid
  * costs < 4/3 of one pass over the base). `nearest` is shuffle-FREE —
  * a pushed-down filter on even coordinates plus a projection.
  */
object Overview {

  /** One decimation level with the given kernel. Nodata-aware:
    * `average` averages the valid (non-ndv) children and yields ndv
    * only when all four are ndv (GDAL average-of-non-NODATA semantics,
    * `gdalos_types.py:36-39`); `mode` takes the most frequent valid
    * value, ties to the smallest (GDAL picks an arbitrary modal value;
    * we pin the tie for determinism); `nearest` samples the top-left
    * child.
    */
  def buildLevel(df: DataFrame, alg: ResamplingAlg, ndv: Double): DataFrame = alg match {
    case ResamplingAlg.Nearest =>
      df.filter(col("px") % 2 === 0 && col("py") % 2 === 0)
        .select(col("rid"), col("band"),
          (col("px") / 2).cast("int").as("px"),
          (col("py") / 2).cast("int").as("py"), col("v"))

    case ResamplingAlg.Average =>
      val valid = when(col("v") =!= ndv, col("v"))
      df.groupBy(col("rid"), col("band"),
          floor(col("px") / 2).cast("int").as("px"),
          floor(col("py") / 2).cast("int").as("py"))
        .agg(sum(valid).as("s"), count(valid).as("c"))
        .select(col("rid"), col("band"), col("px"), col("py"),
          when(col("c") === 0, lit(ndv)).otherwise(col("s") / col("c")).as("v"))

    case ResamplingAlg.Mode =>
      // two-stage: count each (pixel,value), then argmax with a
      // deterministic (count desc, value asc) tie-break — no
      // TypedImperativeAggregate buffer, so no per-group memory bound.
      df.filter(col("v") =!= ndv)
        .groupBy(col("rid"), col("band"),
          floor(col("px") / 2).cast("int").as("px"),
          floor(col("py") / 2).cast("int").as("py"), col("v"))
        .agg(count(lit(1)).as("c"))
        .groupBy("rid", "band", "px", "py")
        .agg(max_by(col("v"), struct(col("c"), -col("v"))).as("v"))

    case other =>
      throw new IllegalArgumentException(
        s"decimation kernel $other needs the halo-join stencil path (E1 interpolating kernels)")
  }

  /** Full pyramid: levels 1..n stacked with an `ovr` column (level 0 =
    * the input), iterating [[buildLevel]] log₂ times
    * (`gdalos_trans.py:1183-1188`: ovr_levels = 2^(i+1)).
    */
  def buildPyramid(df: DataFrame, levels: Int, alg: ResamplingAlg, ndv: Double): DataFrame = {
    var acc = df.withColumn("ovr", lit(0))
    var cur = df
    for (k <- 1 to levels) {
      cur = buildLevel(cur, alg, ndv)
      acc = acc.unionByName(cur.withColumn("ovr", lit(k)))
    }
    acc
  }

  /** E1 bilinear upsample 2× (the interpolating-kernel direction,
    * `gdalos_types.py:40-41`): each fine pixel is the weighted mean of
    * its ≤4 coarse neighbors. Expressed as explode-to-contributions +
    * re-aggregate — the gather-style stencil from SURVEY §2 E1; the
    * fan-out is bounded (4 rows per source pixel) and the aggregation
    * key is the fine pixel, so it shuffles once.
    */
  def bilinearUp2(df: DataFrame, ndv: Double): DataFrame = {
    // fine pixel f = 2c + {0,1} on each axis; weight 3/4 for the near
    // coarse neighbor, 1/4 for the far one → contributions per axis.
    val contrib = df.filter(col("v") =!= ndv).select(col("rid"), col("band"),
      col("px"), col("py"), col("v"),
      explode(array(
        struct((col("px") * 2).as("fx"), lit(0.75).as("wx")),
        struct((col("px") * 2 + 1).as("fx"), lit(0.75).as("wx")),
        struct((col("px") * 2 - 1).as("fx"), lit(0.25).as("wx")),
        struct((col("px") * 2 + 2).as("fx"), lit(0.25).as("wx")))).as("cx"))
      .select(col("rid"), col("band"), col("py"), col("v"),
        col("cx.fx").as("fx"), col("cx.wx").as("wx"))
      .select(col("rid"), col("band"), col("fx"), col("wx"), col("py"), col("v"),
        explode(array(
          struct((col("py") * 2).as("fy"), lit(0.75).as("wy")),
          struct((col("py") * 2 + 1).as("fy"), lit(0.75).as("wy")),
          struct((col("py") * 2 - 1).as("fy"), lit(0.25).as("wy")),
          struct((col("py") * 2 + 2).as("fy"), lit(0.25).as("wy")))).as("cy"))
    contrib
      .select(col("rid"), col("band"), col("fx").as("px"),
        col("cy.fy").as("py"), (col("wx") * col("cy.wy")).as("w"), col("v"))
      .filter(col("px") >= 0 && col("py") >= 0)
      .groupBy("rid", "band", "px", "py")
      .agg((sum(col("w") * col("v")) / sum(col("w"))).as("v"))
  }
}
