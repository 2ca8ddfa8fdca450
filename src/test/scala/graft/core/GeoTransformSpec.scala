package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropCheck

class GeoTransformSpec extends AnyFunSuite with PropCheck {

  private val gtGen: Gen[GeoTransform] = for {
    c0 <- Gen.chooseNum(-180.0, 180.0)
    c3 <- Gen.chooseNum(-90.0, 90.0)
    ps <- Gen.chooseNum(0.001, 2.0)
  } yield GeoTransform(c0, ps, 0, c3, 0, -ps)

  test("pixel → geo → pixel round-trips (north-up exact divisions)") {
    forAllN3(gtGen, Gen.chooseNum(0.0, 5000.0), Gen.chooseNum(0.0, 5000.0)) { (gt, px, py) =>
      val (x, y) = gt.pixelToGeo(px, py)
      val (px2, py2) = gt.geoToPixel(x, y)
      assert(math.abs(px2 - px) < 1e-6 && math.abs(py2 - py) < 1e-6)
    }
  }

  test("geo ↔ pixel for a rotated (non-north-up) transform") {
    val gt = GeoTransform(10, 0.5, 0.1, 50, -0.1, -0.5)
    val (x, y) = gt.pixelToGeo(7, 11)
    val (px, py) = gt.geoToPixel(x, y)
    assert(math.abs(px - 7) < 1e-9 && math.abs(py - 11) < 1e-9)
  }

  test("extent of w×h raster (gdalos_extent.py:13-29 conventions)") {
    val gt = GeoTransform(100, 0.25, 0, 50, 0, -0.25)
    assert(gt.extent(400, 200) == GeoRectangle(100, 0, 200, 50))
  }

  test("windowFromExtent: crop window matches hand computation") {
    val gt = GeoTransform(100, 0.25, 0, 50, 0, -0.25) // 400x200 raster
    // geo rect x ∈ [110,120], y ∈ [20,30] → px ∈ [40,80), py ∈ [80,120)
    assert(gt.windowFromExtent(GeoRectangle(110, 20, 120, 30), 400, 200)
      .contains((40, 80, 80, 120)))
    // clamped at raster edges
    assert(gt.windowFromExtent(GeoRectangle(0, -100, 500, 100), 400, 200)
      .contains((0, 0, 400, 200)))
    // disjoint → None (empty-extent short-circuit, R3)
    assert(gt.windowFromExtent(GeoRectangle(300, 20, 310, 30), 400, 200).isEmpty)
  }

  test("windowFromExtent snap: pixel-window round-trips never widen (GDAL 0.001-px tolerance)") {
    // arbitrary grids INCLUDING non-power-of-2 resolutions (1/3600°
    // SRTM-style): extent built from a pixel window's geo corners must
    // map back to exactly that window — fp noise of the geo↔pixel
    // round-trip (99.9999…/300.000…1) may not add a boundary pixel
    val resGen = Gen.oneOf(Gen.chooseNum(1e-4, 2.0),
      Gen.const(1.0 / 3600), Gen.const(1.0 / 1200), Gen.const(0.3))
    val g = for {
      c0 <- Gen.chooseNum(-180.0, 180.0)
      c3 <- Gen.chooseNum(-90.0, 90.0)
      ps <- resGen
      x0 <- Gen.chooseNum(0, 500); wpx <- Gen.chooseNum(1, 400)
      y0 <- Gen.chooseNum(0, 500); hpx <- Gen.chooseNum(1, 400)
    } yield (GeoTransform(c0, ps, 0, c3, 0, -ps), x0, y0, wpx, hpx)
    forAllN(g) { case (gt, x0, y0, wpx, hpx) =>
      val (w, h) = (1000, 1000)
      val (ax, ay) = gt.pixelToGeo(x0, y0)
      val (bx, by) = gt.pixelToGeo(x0 + wpx, y0 + hpx)
      val r = GeoRectangle(math.min(ax, bx), math.min(ay, by),
        math.max(ax, bx), math.max(ay, by))
      assert(gt.windowFromExtent(r, w, h).contains((x0, y0, x0 + wpx, y0 + hpx)))
      // align is idempotent on an on-grid extent (same snap rule)
      val aligned = r.align(gt)
      assert(gt.windowFromExtent(aligned, w, h).contains((x0, y0, x0 + wpx, y0 + hpx)))
    }
  }

  test("fromRect matches gt_and_size_from_rect (rectangle.py:13-17)") {
    val (gt, w, h) = GeoTransform.fromRect(GeoRectangle(10, 20, 11, 22), 0.25, -0.25)
    assert(gt == GeoTransform(10, 0.25, 0, 22, 0, -0.25))
    assert(w == 4 && h == 8)
  }

  test("overview(k) keeps origin, scales pixel size by 2^k") {
    val gt = GeoTransform(100, 0.25, 0, 50, 0, -0.25)
    val o2 = gt.overview(2)
    assert(o2 == GeoTransform(100, 1.0, 0, 50, 0, -1.0))
    // same geographic extent at quartered raster size
    assert(o2.extent(100, 50) == gt.extent(400, 200))
  }
}
