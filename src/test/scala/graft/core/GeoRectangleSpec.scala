package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropCheck

class GeoRectangleSpec extends AnyFunSuite with PropCheck {

  private val coord = Gen.chooseNum(-1000.0, 1000.0)
  private val rectGen: Gen[GeoRectangle] = for {
    x0 <- coord; y0 <- coord
    w <- Gen.chooseNum(0.001, 500.0); h <- Gen.chooseNum(0.001, 500.0)
  } yield GeoRectangle(x0, y0, x0 + w, y0 + h)

  test("intersect is commutative and idempotent") {
    forAllN2(rectGen, rectGen) { (a, b) =>
      assert(a.intersect(b) == b.intersect(a))
      assert(a.intersect(a) == a)
    }
  }

  test("intersection is contained in both inputs; union contains both") {
    forAllN2(rectGen, rectGen) { (a, b) =>
      val i = a.intersect(b)
      if (!i.isEmpty) { assert(a.contains(i)); assert(b.contains(i)) }
      val u = a.union(b)
      assert(u.contains(a) && u.contains(b))
    }
  }

  test("contains matches rect_contains semantics (rectangle.py:5-10)") {
    val big = GeoRectangle(0, 0, 10, 10)
    assert(big.contains(GeoRectangle(1, 1, 9, 9)))
    assert(big.contains(big)) // containment is inclusive
    assert(!big.contains(GeoRectangle(1, 1, 11, 9)))
    assert(!GeoRectangle(1, 1, 9, 9).contains(big))
  }

  test("area of intersection + disjointness") {
    val a = GeoRectangle(0, 0, 4, 4)
    assert(a.intersect(GeoRectangle(2, 2, 6, 6)) == GeoRectangle(2, 2, 4, 4))
    assert(a.intersect(GeoRectangle(5, 5, 6, 6)).isEmpty)
    assert(a.area == 16.0)
  }

  test("partition grid tiles the extent exactly") {
    forAllN3(rectGen, Gen.choose(1, 5), Gen.choose(1, 5)) { (r, nx, ny) =>
      val cells = Partitions.makePartitions(r, nx, ny)
      assert(cells.length == nx * ny)
      // cells cover: union equals the original
      assert(GeoRectangle.unionAll(cells) == r)
      // areas sum to the total (floating tolerance)
      assert(math.abs(cells.map(_.area).sum - r.area) < 1e-6 * math.max(r.area, 1.0))
    }
  }

  test("find_two_greatest_devisors port (partitions.py:9-14)") {
    assert(Partitions.findTwoGreatestDivisors(12) == (4, 3))
    assert(Partitions.findTwoGreatestDivisors(36) == (6, 6))
    assert(Partitions.findTwoGreatestDivisors(7) == (7, 1))
    assert(Partitions.findTwoGreatestDivisors(1) == (1, 1))
  }

  test("align snaps outward to the pixel grid") {
    val gt = GeoTransform(0, 1, 0, 100, 0, -1) // unit pixels, origin (0,100)
    val r = GeoRectangle(2.3, 90.2, 5.7, 95.9)
    val a = r.align(gt)
    assert(a == GeoRectangle(2, 90, 6, 96))
    assert(a.contains(r))
  }
}
