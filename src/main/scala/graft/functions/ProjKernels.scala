package graft.functions

import java.util.concurrent.ConcurrentHashMap

import graft.core.Proj

/** Row-level projection kernels backing the H4 Catalyst expressions.
  * A Scala `object` emits static forwarders, so generated code can
  * call `graft.functions.ProjKernels.forwardE(...)` directly from
  * whole-stage codegen. Tmerc instances (series coefficients) are
  * cached per zone — one tiny allocation per distinct zone, not per
  * row.
  */
object ProjKernels {
  private val cache = new ConcurrentHashMap[(Double, Boolean), Proj.Tmerc]()

  private def tm(zone: Double, intl: Boolean = false): Proj.Tmerc = {
    val key = (zone, intl)
    val c = cache.get(key)
    if (c != null) c
    else {
      val t = Proj.utm(zone, if (intl) Proj.Intl else Proj.Wgs84)
      cache.putIfAbsent(key, t); cache.get(key)
    }
  }

  def forwardE(lat: Double, lon: Double, zone: Double): Double = tm(zone).forward(lat, lon)._1
  def forwardN(lat: Double, lon: Double, zone: Double): Double = tm(zone).forward(lat, lon)._2
  def inverseLat(e: Double, n: Double, zone: Double): Double = tm(zone).inverse(e, n)._1
  def inverseLon(e: Double, n: Double, zone: Double): Double = tm(zone).inverse(e, n)._2

  // ED50 family: UTM/tmerc on the International-1924 ellipsoid
  def forwardEIntl(lat: Double, lon: Double, zone: Double): Double = tm(zone, intl = true).forward(lat, lon)._1
  def forwardNIntl(lat: Double, lon: Double, zone: Double): Double = tm(zone, intl = true).forward(lat, lon)._2
  def inverseLatIntl(e: Double, n: Double, zone: Double): Double = tm(zone, intl = true).inverse(e, n)._1
  def inverseLonIntl(e: Double, n: Double, zone: Double): Double = tm(zone, intl = true).inverse(e, n)._2

  // 3-parameter geocentric datum shift (talos_osr.py:34), h = 0
  private val D = Proj.Ed50ToWgs84
  def ed50ToWgs84Lat(lat: Double, lon: Double): Double =
    Proj.datumShift(lat, lon, 0, D, Proj.Intl, Proj.Wgs84)._1
  def ed50ToWgs84Lon(lat: Double, lon: Double): Double =
    Proj.datumShift(lat, lon, 0, D, Proj.Intl, Proj.Wgs84)._2
  def wgs84ToEd50Lat(lat: Double, lon: Double): Double =
    Proj.datumShift(lat, lon, 0, (-D._1, -D._2, -D._3), Proj.Wgs84, Proj.Intl)._1
  def wgs84ToEd50Lon(lat: Double, lon: Double): Double =
    Proj.datumShift(lat, lon, 0, (-D._1, -D._2, -D._3), Proj.Wgs84, Proj.Intl)._2

  // aeqd is stateless (no precomputed series) — no per-center cache
  def aeqdForwardX(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    Proj.Aeqd(lat0, lon0).forward(lat, lon)._1
  def aeqdForwardY(lat: Double, lon: Double, lat0: Double, lon0: Double): Double =
    Proj.Aeqd(lat0, lon0).forward(lat, lon)._2
  def aeqdInverseLat(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    Proj.Aeqd(lat0, lon0).inverse(x, y)._1
  def aeqdInverseLon(x: Double, y: Double, lat0: Double, lon0: Double): Double =
    Proj.Aeqd(lat0, lon0).inverse(x, y)._2

  // SPHERICAL aeqd — the closed-form (non-iterative) twin of the
  // ellipsoidal Aeqd above, on the authalic-free GRS sphere
  // R = 6378137 (Radio.SphereRadius). Why it exists: the ellipsoidal
  // inverse runs the iterative geodesic direct problem, which no SQL
  // oracle can replay; these formulas are pure sin/cos/asin/atan2 and
  // are written EXACTLY as the q105 oracle writes them (same
  // association, explicit *PI()/180 degree conversion), so both
  // engines compute identical doubles.
  private val SphereR = 6378137.0

  def aeqdSphereForwardX(lat: Double, lon: Double, lat0: Double, lon0: Double): Double = {
    val phi0 = lat0 * math.Pi / 180; val phi = lat * math.Pi / 180
    val dlam = (lon - lon0) * math.Pi / 180
    val cosc = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dlam)
    val c = math.acos(math.max(-1.0, math.min(1.0, cosc)))
    if (c == 0.0) 0.0
    else SphereR * c / math.sin(c) * (math.cos(phi) * math.sin(dlam))
  }

  def aeqdSphereForwardY(lat: Double, lon: Double, lat0: Double, lon0: Double): Double = {
    val phi0 = lat0 * math.Pi / 180; val phi = lat * math.Pi / 180
    val dlam = (lon - lon0) * math.Pi / 180
    val cosc = math.sin(phi0) * math.sin(phi) +
      math.cos(phi0) * math.cos(phi) * math.cos(dlam)
    val c = math.acos(math.max(-1.0, math.min(1.0, cosc)))
    if (c == 0.0) 0.0
    else SphereR * c / math.sin(c) *
      (math.cos(phi0) * math.sin(phi) - math.sin(phi0) * math.cos(phi) * math.cos(dlam))
  }

  def aeqdSphereInverseLat(x: Double, y: Double, lat0: Double, lon0: Double): Double = {
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) lat0
    else {
      val c = rho / SphereR
      val phi0 = lat0 * math.Pi / 180
      math.asin(math.cos(c) * math.sin(phi0) +
        y * math.sin(c) * math.cos(phi0) / rho) * 180 / math.Pi
    }
  }

  def aeqdSphereInverseLon(x: Double, y: Double, lat0: Double, lon0: Double): Double = {
    val rho = math.sqrt(x * x + y * y)
    if (rho == 0.0) lon0
    else {
      val c = rho / SphereR
      val phi0 = lat0 * math.Pi / 180
      lon0 + math.atan2(x * math.sin(c),
        rho * math.cos(c) * math.cos(phi0) - y * math.sin(c) * math.sin(phi0)) * 180 / math.Pi
    }
  }
}
