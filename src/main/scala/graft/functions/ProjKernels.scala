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
}
