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
  private val cache = new ConcurrentHashMap[Double, Proj.Tmerc]()

  private def tm(zone: Double): Proj.Tmerc = {
    val c = cache.get(zone)
    if (c != null) c
    else { val t = Proj.utm(zone); cache.putIfAbsent(zone, t); cache.get(zone) }
  }

  def forwardE(lat: Double, lon: Double, zone: Double): Double = tm(zone).forward(lat, lon)._1
  def forwardN(lat: Double, lon: Double, zone: Double): Double = tm(zone).forward(lat, lon)._2
  def inverseLat(e: Double, n: Double, zone: Double): Double = tm(zone).inverse(e, n)._1
  def inverseLon(e: Double, n: Double, zone: Double): Double = tm(zone).inverse(e, n)._2

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
