package graft.core

/** H5 sampled extent transform + R6/D9 resolution inference — planner
  * metadata math, pure Scala (the reference computes these driver-side
  * too: `extent_utils_backport.py:21-47`, `gdalos_extent.py:42-112`).
  */
object ExtentUtils {

  /** H5: transform an extent by densifying its boundary (~`samples`
    * points per edge), transforming each, and taking the bbox
    * (`transform_extent`, `extent_utils_backport.py:21-47`).
    */
  def transformExtent(r: GeoRectangle, transform: (Double, Double) => (Double, Double),
                      samples: Int = 250): GeoRectangle = {
    require(!r.isEmpty, "empty extent")
    val pts = boundaryPoints(r, samples).map { case (x, y) => transform(x, y) }
    GeoRectangle(pts.map(_._1).min, pts.map(_._2).min,
      pts.map(_._1).max, pts.map(_._2).max)
  }

  /** Dense boundary walk of a rectangle (all four edges). */
  def boundaryPoints(r: GeoRectangle, samplesPerEdge: Int): Seq[(Double, Double)] = {
    val n = math.max(samplesPerEdge, 1)
    val xs = (0 to n).map(i => r.minX + r.width * i / n)
    val ys = (0 to n).map(j => r.minY + r.height * j / n)
    xs.map((_, r.minY)) ++ xs.map((_, r.maxY)) ++ ys.map((r.minX, _)) ++ ys.map((r.maxX, _))
  }

  /** R6/D9: median output resolution — sample a point grid over the
    * extent, measure the transformed length of one input pixel at each
    * sample, take the median, round to a significant digit
    * (`transform_resolution`, `gdalos_extent.py:68-100`).
    */
  def transformResolution(transform: (Double, Double) => (Double, Double),
                          inputRes: (Double, Double), extent: GeoRectangle,
                          sampleCount: Int = 1000): (Double, Double) = {
    val side = math.max(math.sqrt(sampleCount.toDouble).toInt, 1)
    val dists = for {
      j <- 0 until side
      i <- 0 until side
      x = extent.minX + extent.width * i / side
      y = extent.minY + extent.height * j / side
    } yield {
      val (p1x, p1y) = transform(x, y + inputRes._2)
      val (p2x, p2y) = transform(x, y)
      math.hypot(p2x - p1x, p2y - p1y)
    }
    val sorted = dists.sorted
    val med = roundToSig(sorted(sorted.length / 2), -1)
    (med, -med)
  }

  /** `round_to_sig` (`gdalos_extent.py:104-112`): round to
    * `floor(log10|d|) + extraDigits` decimal digits.
    */
  def roundToSig(d: Double, extraDigits: Int = -5): Double = {
    if (d == 0 || d.isNaN || d.isInfinite) return 0
    val digits = math.floor(math.log10(math.abs(d) + 1e-20)).toInt + extraDigits
    BigDecimal(d).setScale(-digits, BigDecimal.RoundingMode.HALF_EVEN).toDouble
  }
}
