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

  test("floor-form lower bound prunes via the runtime size guard; results unchanged") {
    // py >= a compiles to ty*ts + floor(off/ts) >= a — the lower bound
    // needs residual < ts, which the rule may not assume statically;
    // it must still prune below-window tiles through the size(arr) guard
    def q() = PixelFrame.explodeTiles(
        PixelFrame.pack(PixelFrame.dem(spark, 64, 64), 16, PixelFrame.Dem.Ndv), 16)
      .filter(col("py") >= 40 && col("py") < 64 && col("px") < 64)
    val before = q().collect().map(_.toSeq).toSet
    TileFilterPushdown.install(spark)
    try {
      val df = q()
      val below = df.queryExecution.optimizedPlan.collect {
        case Generate(_, _, _, _, _, f: Filter) => f.condition.sql
      }
      assert(below.nonEmpty, "no tile filter injected for the floor form")
      assert(below.exists(_.contains("size")), below.mkString("; "))
      assert(df.collect().map(_.toSeq).toSet == before)
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ == TileFilterPushdown)
    }
  }

  test("soundness: same shape over a NON-tile array is never over-pruned") {
    import spark.implicits._
    TileFilterPushdown.install(spark)
    try {
      // (a) array longer than ts²: floor(pos/ts) exceeds ts-1, so a
      // naive static lower bound would wrongly prune base=0 rows
      val long = Seq((0, (0 until 600).map(_.toDouble).toArray)).toDF("base", "arr")
        .select(col("base"), posexplode(col("arr")).as(Seq("off", "x")))
        .filter(col("base") * 16 + floor(col("off") / 16) >= lit(20))
      // rows with floor(off/16) in [20, 37] survive: off in [320, 600)
      assert(long.count() == 280)

      // (b) residual built from the exploded ELEMENT (can be negative):
      // must not be matched at all
      val neg = Seq((1, Array(-5.0, -1.0, 3.0))).toDF("base", "arr")
        .select(col("base"), posexplode(col("arr")).as(Seq("off", "x")))
        .filter(col("base") * 16 + col("x").cast("int") % 16 >= lit(12))
      // base*16 + (-5 % 16 = -5) = 11 fails; -1 → 15 ok; 3 → 19 ok
      assert(neg.count() == 2)
      val belowNeg = neg.queryExecution.optimizedPlan.collect {
        case Generate(_, _, _, _, _, f: Filter) => f
      }
      assert(belowNeg.isEmpty, "element-residual shape must not inject tile bounds")
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
