package graft.core

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** B3 vector cutline support: WKT polygon ring parsing + point-in-
  * polygon as an unrolled column expression (reference materializes
  * WKT lists to GPKG cutlines, `backports/ogr_utils.py:40-55`, and
  * rasterizes polygon rings to numpy masks, `viewshed_calc.py:148-177`
  * — we evaluate the ring test per pixel instead).
  *
  * The PIP test is generated driver-side as an unrolled XOR chain of
  * per-edge crossing tests (even-odd rule) — pure comparisons and
  * arithmetic, fully inside whole-stage codegen, no UDF and no arrays
  * at runtime. Cutline rings are small (tens of vertices), so the
  * expression stays modest; the coarse bbox prefilter is a separate
  * pushed-down range predicate.
  */
object Geometry {

  /** Parse `POLYGON ((x y, x y, ...))` — outer ring only (the
    * reference's cutlines are simple rings; `geom_arc.py` sectors
    * likewise).
    */
  def parseWktPolygonRing(wkt: String): Seq[(Double, Double)] = {
    val inner = wkt.trim
      .replaceAll("(?i)^POLYGON\\s*\\(\\(", "")
      .replaceAll("\\)\\).*$", "")
      .takeWhile(_ != ')')
    val pts = inner.split(",").toSeq.map { p =>
      val Array(x, y) = p.trim.split("\\s+").map(_.toDouble)
      (x, y)
    }
    if (pts.length > 1 && pts.head == pts.last) pts.init else pts
  }

  def ringBBox(ring: Seq[(Double, Double)]): GeoRectangle =
    GeoRectangle(ring.map(_._1).min, ring.map(_._2).min,
      ring.map(_._1).max, ring.map(_._2).max)

  /** Even-odd point-in-polygon as a column expression over point
    * columns (x,y) for a fixed ring. Edge rule matches the classic
    * ray-cast: ((yi > y) != (yj > y)) && x < (xj−xi)·(y−yi)/(yj−yi)+xi.
    */
  def pointInPolygonCol(x: Column, y: Column, ring: Seq[(Double, Double)]): Column = {
    require(ring.length >= 3, "ring needs ≥3 vertices")
    val edges = ring.indices.flatMap { i =>
      val (xi, yi) = ring(i)
      val (xj, yj) = ring((i + 1) % ring.length)
      if (yi == yj) None // horizontal edges never cross the cast ray
      else Some(((lit(yi) > y) =!= (lit(yj) > y)) &&
        (x < (y - yi) * ((xj - xi) / (yj - yi)) + xi))
    }
    edges.foldLeft(lit(false))((acc, e) => acc =!= e) // XOR fold
  }

  /** `PolygonizeSector` (`talos/geom_arc.py:9-36`): the sector /
    * ellipse ring the reference cuts per-observer viewsheds with
    * (`viewshed_calc.py:453-478`). Center (px,py), radii (rx,ry),
    * compass direction/aperture in degrees, optional ellipse rotation
    * `thetaDeg`. Aperture ≥ 360 → full ellipse (no center vertex);
    * otherwise center + arc from `Angles.fromToAngle`'s from→to sweep,
    * `pointCount − 1` arc vertices with the last exactly at the `to`
    * angle. Returned unclosed (the reference closes the ring; our PIP
    * wraps implicitly).
    */
  def sectorRing(px: Double, py: Double, rx: Double, ry: Double,
                 directionDeg: Double, apertureDeg: Double,
                 thetaDeg: Double = 0.0, pointCount: Int = 50): Seq[(Double, Double)] = {
    require(pointCount >= 3, "sector ring needs ≥3 points")
    val sinTheta = math.sin(thetaDeg * Angles.Pi180)
    val cosTheta = math.cos(thetaDeg * Angles.Pi180)
    def pt(a: Double): (Double, Double) = {
      val sinT = math.sin(a); val cosT = math.cos(a)
      (px + rx * cosT * cosTheta - ry * sinT * sinTheta,
        py + ry * sinT * cosTheta + rx * cosT * sinTheta)
    }
    if (apertureDeg >= 360) {
      val factor = Angles.TwoPi / pointCount
      (0 until pointCount).map(i => pt(i * factor)) // I = pointCount duplicates I = 0
    } else {
      val (aFrom, aTo) = Angles.fromToAngle(directionDeg, apertureDeg)
      val factor = (aTo - aFrom) / (pointCount - 2)
      (px, py) +: (0 until pointCount - 1).map(i => pt(i * factor + aFrom))
    }
  }

  /** Ring → `POLYGON ((...))` WKT (closed), the shape
    * [[parseWktPolygonRing]] reads back — lets a synthesized sector
    * ring feed any WKT cutline consumer (e.g. `TransOptions
    * .cutlineWkt`), mirroring the reference's PolygonizeSector →
    * cutline-file → warp flow (`viewshed_calc.py:453-478`).
    */
  def ringToWkt(ring: Seq[(Double, Double)]): String = {
    require(ring.length >= 3, "ring needs ≥3 vertices")
    val closed = if (ring.head == ring.last) ring else ring :+ ring.head
    closed.map { case (x, y) => s"$x $y" }.mkString("POLYGON ((", ", ", "))")
  }

  /** Driver-side PIP (same rule) for tests/planning. */
  def pointInPolygon(px: Double, py: Double, ring: Seq[(Double, Double)]): Boolean = {
    var inside = false
    for (i <- ring.indices) {
      val (xi, yi) = ring(i)
      val (xj, yj) = ring((i + 1) % ring.length)
      if ((yi > py) != (yj > py) && px < (py - yi) * ((xj - xi) / (yj - yi)) + xi)
        inside = !inside
    }
    inside
  }

  /** The same unrolled XOR chain as ANSI SQL — lets a declared query's
    * DuckDB oracle evaluate the identical cutline.
    */
  def pointInPolygonSql(x: String, y: String, ring: Seq[(Double, Double)]): String = {
    val edges = ring.indices.flatMap { i =>
      val (xi, yi) = ring(i)
      val (xj, yj) = ring((i + 1) % ring.length)
      if (yi == yj) None // keep in sync with pointInPolygonCol
      else Some(s"((($yi > $y) <> ($yj > $y)) AND ($x < ($y - $yi) * (${(xj - xi) / (yj - yi)}) + $xi))")
    }
    edges.foldLeft("FALSE")((acc, e) => s"($acc <> $e)")
  }
}
