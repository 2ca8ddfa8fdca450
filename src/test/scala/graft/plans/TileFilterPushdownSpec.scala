package graft.plans

import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Generate}

import graft.SparkSpec
import graft.raster.PixelFrame

class TileFilterPushdownSpec extends SparkSpec {

  private def cropped(w: Int, h: Int, ts: Int) =
    PixelFrame.explodeTiles(
        PixelFrame.pack(PixelFrame.dem(spark, w, h), ts, PixelFrame.Dem.Ndv), ts)
      .filter(col("px") >= 20 && col("px") < 40 && col("py") < 16)
      .filter(col("px") < w && col("py") < h) // drop edge-tile padding

  test("rule derives tile bounds below the Generate; results unchanged") {
    val before = cropped(64, 64, 16).collect().map(_.toSeq).toSet
    TileFilterPushdown.install(spark)
    try {
      val df = cropped(64, 64, 16)
      // plan shape: a Filter BELOW the Generate referencing tx/ty
      val optimized = df.queryExecution.optimizedPlan
      val below = optimized.collect {
        case g @ Generate(_, _, _, _, _, f: Filter) => f.condition.sql
      }
      assert(below.nonEmpty, s"no tile-level filter below Generate:\n$optimized")
      assert(below.exists(c => c.contains("tx") && c.contains("ty")), below.mkString("; "))
      // correctness: identical rows with and without the rule
      assert(df.collect().map(_.toSeq).toSet == before)
      // pruning: only tiles tx ∈ {1,2}, ty = 0 survive to the explode
      val survivors = PixelFrame.pack(PixelFrame.dem(spark, 64, 64), 16, PixelFrame.Dem.Ndv)
        .filter(col("tx") >= 1 && col("tx") <= 2 && col("ty") <= 0 && col("ty") >= 0)
        .count()
      assert(survivors == 2) // 2 tiles instead of 16
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TileFilterPushdown)
    }
  }

  test("rule is idempotent and ignores non-tile predicates") {
    TileFilterPushdown.install(spark)
    TileFilterPushdown.install(spark) // second install is a no-op
    try {
      assert(spark.experimental.extraOptimizations.count(_ == TileFilterPushdown) == 1)
      val df = cropped(64, 64, 16).filter(col("v") > 10.0) // v predicate: untouched
      val optimized = df.queryExecution.optimizedPlan
      // exactly ONE tile-level filter injected (fixed-point safe)
      val belowGen = optimized.collect {
        case Generate(_, _, _, _, _, f: Filter) => f
      }
      assert(belowGen.size == 1)
      assert(!belowGen.head.condition.sql.contains("`v`"))
      assert(df.count() > 0)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TileFilterPushdown)
    }
  }
}
