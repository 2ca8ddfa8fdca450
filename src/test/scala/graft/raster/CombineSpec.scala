package graft.raster

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CombineSpec extends SparkSpec {
  import spark.implicits._

  // stack of 3 rasters over 2 pixels, hand-checkable.
  // pixel A(0,0): values 5, 3, 0   → max 5, min 0, count(>4) 1, unique rid 0
  // pixel B(1,0): values 0, 0, 0   → all ndv(0) → count_z 255, unique 255
  private def stack = Seq(
    (0, 0, 0, 5.0), (1, 0, 0, 3.0), (2, 0, 0, 0.0),
    (0, 1, 0, 0.0), (1, 1, 0, 0.0), (2, 1, 0, 0.0))
    .toDF("rid", "px", "py", "v").withColumn("band", lit(1))

  private def vAt(df: org.apache.spark.sql.DataFrame, px: Int): Double =
    df.filter($"px" === px).select("v").as[Double].head()

  test("vsMax/vsMin match gdalos_combine.py:13-28") {
    assert(vAt(Combine.vsMax(stack), 0) == 5.0 && vAt(Combine.vsMax(stack), 1) == 0.0)
    assert(vAt(Combine.vsMin(stack), 0) == 0.0)
  }

  test("vsCount counts values above threshold 4 (gdalos_combine.py:31-39)") {
    assert(vAt(Combine.vsCount(stack), 0) == 1.0)
    assert(vAt(Combine.vsCount(stack), 1) == 0.0)
  }

  test("vsCountZ: all-ndv pixel → 255 (gdalos_combine.py:42-55)") {
    assert(vAt(Combine.vsCountZ(stack), 0) == 1.0)
    assert(vAt(Combine.vsCountZ(stack), 1) == 255.0)
  }

  test("vsUnique sentinels 254/255 + the covering index (gdalos_combine.py:58-69)") {
    assert(vAt(Combine.vsUnique(stack), 0) == 0.0)   // single coverer: rid 0
    assert(vAt(Combine.vsUnique(stack), 1) == 255.0) // none
    // two coverers → 254
    val multi = stack.withColumn("v", when($"rid" === 1 && $"px" === 0, 5.0).otherwise($"v"))
    assert(vAt(Combine.vsUnique(multi), 0) == 254.0)
  }

  test("differential: aggregate plan ≡ pivot plan (the reference's own check, gdalos_comb_tests.py:97-140)") {
    val big = PixelFrame.vsStack(spark, n = 4, w = 16, h = 16)
    val viaAgg = Combine.vsMax(big)
    val viaPivot = Combine.vsMaxViaPivot(big, 4)
    assert(viaAgg.except(viaPivot).count() == 0 && viaPivot.except(viaAgg).count() == 0)
  }

  test("losMatrix reductions (D5, viewshed_calc.py:1008-1021)") {
    val m = Seq((0, 0, true), (1, 0, true), (0, 1, false), (1, 1, false), (0, 2, true))
      .toDF("obs", "tar", "vis")
    val cnt = Combine.losMatrixCount(m, "tar", "vis")
      .orderBy("tar").select("seen_by").as[Long].collect()
    assert(cnt.toSeq == Seq(2L, 0L, 1L))
    val unique = Combine.losMatrixUnique(m, "tar", "obs", "vis")
      .orderBy("tar").select("v").as[Double].collect()
    assert(unique.toSeq == Seq(254.0, 255.0, 0.0))
  }
}
