package graft.core

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.{PropCheck, SparkSpec}

class GeometrySpec extends SparkSpec with PropCheck {
  import spark.implicits._

  private val diamond = Seq((5.0, 10.0), (10.0, 5.0), (5.0, 0.0), (0.0, 5.0))

  test("parseWktPolygonRing handles closed rings and whitespace") {
    val ring = Geometry.parseWktPolygonRing(
      "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    assert(ring == Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0)))
    assert(Geometry.ringBBox(ring) == GeoRectangle(0, 0, 10, 10))
  }

  test("driver PIP: diamond membership") {
    assert(Geometry.pointInPolygon(5, 5, diamond))
    assert(Geometry.pointInPolygon(3, 5, diamond))
    assert(!Geometry.pointInPolygon(0.5, 0.5, diamond)) // corner outside
    assert(!Geometry.pointInPolygon(11, 5, diamond))
  }

  test("column PIP agrees with driver PIP on random points (codegen path)") {
    val pts = Gen.zip(Gen.chooseNum(-2.0, 12.0), Gen.chooseNum(-2.0, 12.0))
    val sample = (0 until 300).map { i =>
      var s = org.scalacheck.rng.Seed(i.toLong)
      pts.pureApply(Gen.Parameters.default, s)
    }
    val df = sample.toDF("x", "y")
      .withColumn("in", Geometry.pointInPolygonCol(col("x"), col("y"), diamond))
    val got = df.select("x", "y", "in").as[(Double, Double, Boolean)].collect()
    for ((x, y, in) <- got)
      assert(in == Geometry.pointInPolygon(x, y, diamond), s"($x,$y)")
  }

  test("SQL PIP string mirrors the column expression (oracle generator)") {
    val sql = Geometry.pointInPolygonSql("x", "y", diamond)
    assert(sql.contains("<>") && !sql.toLowerCase.contains("infinity"))
    // horizontal edges are skipped identically in both generators
    val withHoriz = Seq((0.0, 0.0), (10.0, 0.0), (10.0, 10.0), (0.0, 10.0))
    val sql2 = Geometry.pointInPolygonSql("x", "y", withHoriz)
    assert(!sql2.toLowerCase.contains("infinity"))
  }

  test("RasterOps.cutline keeps exactly the in-ring pixels (B3)") {
    import graft.raster.{PixelFrame, RasterOps}
    val gt = GeoTransform(0, 1, 0, 12, 0, -1) // unit pixels, y flips
    val dem = PixelFrame.dem(spark, 12, 12)
    val ringGeo = Seq((5.0, 10.0), (10.0, 5.0), (5.0, 0.0), (0.0, 5.0))
    val out = RasterOps.cutline(dem, gt, 12, 12, ringGeo)
      .select("px", "py").as[(Int, Int)].collect().toSet
    val expected = (for {
      px <- 0 until 12; py <- 0 until 12
      cx = 0 + (px + 0.5) * 1.0; cy = 12 + (py + 0.5) * -1.0
      if Geometry.pointInPolygon(cx, cy, ringGeo)
    } yield (px, py)).toSet
    assert(out == expected && out.nonEmpty)
  }

  test("sectorRing ports PolygonizeSector (talos/geom_arc.py:9-36)") {
    // 180° sector facing east (math y-up): arc from -90° (0,-1)
    // through 0° (1,0) to +90° (0,1); first vertex is the center.
    val ring = Geometry.sectorRing(0, 0, 1, 1, directionDeg = 90, apertureDeg = 180)
    assert(ring.length == 50) // center + pointCount-1 arc vertices
    assert(ring.head == ((0.0, 0.0)))
    def close(p: (Double, Double), q: (Double, Double)) =
      math.abs(p._1 - q._1) < 1e-12 && math.abs(p._2 - q._2) < 1e-12
    assert(close(ring(1), (0.0, -1.0)))     // from-angle
    assert(close(ring(25), (1.0, 0.0)))     // mid-arc (I=24 of 48 steps)
    assert(close(ring.last, (0.0, 1.0)))    // to-angle, exactly
    // containment: east inside, west outside, behind-center outside
    assert(Geometry.pointInPolygon(0.5, 0.0, ring))
    assert(!Geometry.pointInPolygon(-0.5, 0.0, ring))
    assert(!Geometry.pointInPolygon(0.5, 0.0, ring.map { case (x, y) => (x - 2, y) }))

    // aperture 360: full ellipse, no center vertex, unclosed
    val omni = Geometry.sectorRing(5, 5, 2, 3, 0, 360)
    assert(omni.length == 50 && omni.head != omni.last)
    assert(Geometry.pointInPolygon(5.0, 7.5, omni))   // inside ry=3
    assert(!Geometry.pointInPolygon(7.5, 5.0, omni))  // outside rx=2

    // WKT round-trip: a sector ring feeds any cutline consumer
    val wkt = Geometry.ringToWkt(ring)
    assert(wkt.startsWith("POLYGON ((") && wkt.endsWith("))"))
    assert(Geometry.parseWktPolygonRing(wkt) == ring)
  }

  test("sector ring through the trans cutline (PolygonizeSector -> cutline flow)") {
    import graft.raster.PixelFrame
    import graft.trans.Trans
    val gt = GeoTransform(0, 1, 0, 24, 0, -1) // geo y flips vs py
    // observer at geo (12, 12) = pixel center (11.5, 11.5); north cone
    val ring = Geometry.sectorRing(12.0, 12.0, 8.0, 8.0, 0.0, 90.0)
    val p = Trans.plan(PixelFrame.dem(spark, 24, 24), gt, 24, 24,
      Trans.TransOptions(cutlineWkt = Some(Geometry.ringToWkt(ring)))).get
    val kept = p.frame.select("px", "py").as[(Int, Int)].collect().toSet
    assert(kept.nonEmpty)
    // geo north = up = small py; everything south of the center is cut
    assert(kept.forall { case (_, py) => py <= 12 })
    assert(kept.exists { case (px, py) => px == 11 && py < 8 })
    // east/west beyond the 45-degree half-aperture is cut too
    assert(!kept.contains((20, 11)) && !kept.contains((3, 11)))
  }

  test("resolveOvrIdx numbering contract (gdalos_trans.py:72-79)") {
    import graft.raster.RasterOps.resolveOvrIdx
    assert(resolveOvrIdx(3, 0) == 0 && resolveOvrIdx(3, 3) == 3)
    assert(resolveOvrIdx(3, -1) == 3 && resolveOvrIdx(3, -4) == 0)
    assertThrows[IllegalArgumentException](resolveOvrIdx(3, 4))
    assertThrows[IllegalArgumentException](resolveOvrIdx(3, -5))
  }
}
