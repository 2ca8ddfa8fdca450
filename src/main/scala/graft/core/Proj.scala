package graft.core

/** H4: pure-JVM CRS transform for the projection family the reference
  * actually uses (SURVEY §7.3): geographic ⇄ UTM/transverse-Mercator
  * on WGS84 or International(ED50), plus the 3-parameter ED50→WGS84
  * datum shift constant (`talos_osr.py:33-35`) and the UTM zone
  * helpers (`backports/osr_utm_util.py:9-65`, `talos_osr.py:8-30`).
  *
  * The projection math is the standard Krüger/Karney n⁴ series
  * (public-domain formulas; sub-millimeter within a UTM zone) — no
  * native proj dependency, so the transform can run inside executors.
  */
object Proj {

  final case class Ellipsoid(a: Double, invF: Double) {
    val f: Double = 1.0 / invF
    val e2: Double = f * (2 - f)
    val e: Double = math.sqrt(e2)
    val n: Double = f / (2 - f)
  }
  val Wgs84 = Ellipsoid(6378137.0, 298.257223563)
  /** International 1924 (`+ellps=intl`), the ED50 ellipsoid. */
  val Intl = Ellipsoid(6378388.0, 297.0)

  /** ED50→WGS84 3-param shift (meters), `talos_osr.py:34`. */
  val Ed50ToWgs84: (Double, Double, Double) = (-87.0, -98.0, -121.0)

  /** Transverse Mercator, `+proj=tmerc +k=0.9996 +x_0=500000` shape
    * (`proj_string_from_utm_zone`, `osr_utm_util.py:52-65`).
    */
  final case class Tmerc(lon0Deg: Double, k0: Double = 0.9996,
                         x0: Double = 500000.0, y0: Double = 0.0,
                         ell: Ellipsoid = Wgs84) {
    private val n = ell.n
    private val n2 = n * n; private val n3 = n2 * n; private val n4 = n3 * n
    /** Rectifying radius A (exposed for series cross-validation). */
    val aCap: Double = ell.a / (1 + n) * (1 + n2 / 4 + n4 / 64)
    val alphaCoeffs: Array[Double] = Array(
      n / 2 - 2 * n2 / 3 + 5 * n3 / 16 + 41 * n4 / 180,
      13 * n2 / 48 - 3 * n3 / 5 + 557 * n4 / 1440,
      61 * n3 / 240 - 103 * n4 / 140,
      49561 * n4 / 161280)
    private val beta = Array(
      n / 2 - 2 * n2 / 3 + 37 * n3 / 96 - n4 / 360,
      n2 / 48 + n3 / 15 - 437 * n4 / 1440,
      17 * n3 / 480 - 37 * n4 / 840,
      4397 * n4 / 161280)
    private val e = ell.e

    /** (latDeg, lonDeg) → (easting, northing). */
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val lam = math.toRadians(normalizeLonDeg(lonDeg - lon0Deg))
      val sinPhi = math.sin(phi)
      // conformal latitude via Karney's tau form
      val t = math.sinh(atanh(sinPhi) - e * atanh(e * sinPhi))
      val xiP = math.atan2(t, math.cos(lam))
      val etaP = asinh(math.sin(lam) / math.hypot(t, math.cos(lam)))
      var xi = xiP; var eta = etaP
      for (j <- 1 to 4) {
        xi += alphaCoeffs(j - 1) * math.sin(2 * j * xiP) * math.cosh(2 * j * etaP)
        eta += alphaCoeffs(j - 1) * math.cos(2 * j * xiP) * math.sinh(2 * j * etaP)
      }
      (x0 + k0 * aCap * eta, y0 + k0 * aCap * xi)
    }

    /** (easting, northing) → (latDeg, lonDeg). */
    def inverse(easting: Double, northing: Double): (Double, Double) = {
      val xi = (northing - y0) / (k0 * aCap)
      val eta = (easting - x0) / (k0 * aCap)
      var xiP = xi; var etaP = eta
      for (j <- 1 to 4) {
        xiP -= beta(j - 1) * math.sin(2 * j * xi) * math.cosh(2 * j * eta)
        etaP -= beta(j - 1) * math.cos(2 * j * xi) * math.sinh(2 * j * eta)
      }
      val chi = math.asin(math.sin(xiP) / math.cosh(etaP))
      // conformal → geodetic latitude series (e⁸ terms, ~1e-10 rad)
      val e2 = ell.e2; val e4 = e2 * e2; val e6 = e4 * e2; val e8 = e6 * e2
      val phi = chi +
        (e2 / 2 + 5 * e4 / 24 + e6 / 12 + 13 * e8 / 360) * math.sin(2 * chi) +
        (7 * e4 / 48 + 29 * e6 / 240 + 811 * e8 / 11520) * math.sin(4 * chi) +
        (7 * e6 / 120 + 81 * e8 / 1120) * math.sin(6 * chi) +
        (4279 * e8 / 161280) * math.sin(8 * chi)
      val lam = math.atan2(math.sinh(etaP), math.cos(xiP))
      (math.toDegrees(phi), normalizeLonDeg(lon0Deg + math.toDegrees(lam)))
    }
  }

  /** Azimuthal equidistant centered at (lat0, lon0) — the selector's
    * on-the-fly observer projection (`get_projected_pj`,
    * `gdalos_selector.py:67-69`: `+proj=aeqd +ellps=WGS84 +lat_0=y
    * +lon_0=x`) and the grid geographic-input viewsheds warp to
    * (`viewshed_calc.py:310-320`). Ellipsoidal construction, exactly
    * PROJ's: forward = geodesic (azimuth α, distance s) from the
    * center, (x, y) = (s·sin α, s·cos α); inverse = the geodesic
    * direct problem at azimuth atan2(x, y), distance hypot(x, y).
    * Distances from the center are exact by construction — the
    * property viewshed radii rely on.
    */
  final case class Aeqd(lat0: Double, lon0: Double, ell: Ellipsoid = Wgs84) {
    def forward(latDeg: Double, lonDeg: Double): (Double, Double) = {
      val inv = Geodesic.inverse(lat0, lon0, latDeg, lonDeg, ell)
      val az = math.toRadians(inv.az12)
      (inv.distM * math.sin(az), inv.distM * math.cos(az))
    }
    def inverse(x: Double, y: Double): (Double, Double) = {
      val dist = math.hypot(x, y)
      if (dist == 0.0) (lat0, lon0)
      else {
        val azDeg = math.toDegrees(math.atan2(x, y))
        val d = Geodesic.direct(lat0, lon0, azDeg, dist, ell)
        (d.lat2, d.lon2)
      }
    }
  }

  /** UTM projection for an (optionally fractional) zone
    * (`proj_string_from_utm_zone` semantics).
    */
  def utm(zone: Double, ell: Ellipsoid = Wgs84): Tmerc =
    Tmerc(lon0Deg = utmZoneCenter(zone), ell = ell)

  /** `get_utm_zone_center` (`osr_utm_util.py:9-15`). */
  def utmZoneCenter(floatZone: Double): Double = {
    var c = (floatZone - 30.5) * 6
    if (c <= -180) c += 360 else if (c > 180) c -= 360
    c
  }

  /** `get_utm_zone_by_lon` (`osr_utm_util.py:18-25`). */
  def utmZoneByLon(lonDeg: Double, allowFloatZone: Boolean = false): Double =
    if (allowFloatZone) lonDeg / 6 + 30.5
    else {
      val z = math.floor(lonDeg / 6) + 31
      if (z > 60) z - 60 else z
    }

  /** `get_zone_lon0` (`utm_convergence.py:13-15`). */
  def zoneLon0(zone: Double): Double = (zone - 31) * 6 + 3

  /** Meridian convergence, small-angle formula
    * (`utm_convergence_old`, `utm_convergence.py:18-20`), radians.
    */
  def utmConvergence(lonDeg: Double, latDeg: Double, zoneLon0Deg: Double): Double =
    math.toRadians((lonDeg - zoneLon0Deg) * math.sin(math.toRadians(latDeg)))

  /** `get_zone_from_name` (`talos_osr.py:8-19`): zone from a talos
    * name like `w84u36`; 0 when absent/invalid.
    */
  def zoneFromName(s: String): Double = {
    val i = s.toLowerCase.lastIndexOf('u')
    if (i < 0) 0
    else scala.util.Try(s.substring(i + 1).toDouble).getOrElse(0.0)
  }

  /** EPSG code for a talos SRS name: `w84geo`→4326, `e50geo`→4230,
    * `w84u<z>`→326zz (WGS84 UTM north), `e50u<z>`→230zz (ED50 UTM).
    * Integer zones only (float zones have no EPSG identity — callers
    * needing those pass an explicit CRS tag).
    */
  def epsgFromName(s: String): Int = {
    val z = zoneFromName(s)
    val e50 = s.toLowerCase.startsWith("e50")
    require(z == z.toInt && z >= 0 && z <= 60, s"no EPSG code for SRS '$s' (zone $z)")
    if (z == 0) { if (e50) 4230 else 4326 }
    else if (e50) 23000 + z.toInt
    else 32600 + z.toInt
  }

  /** `get_canonic_name` (`talos_osr.py:21-30`): `w84u36` / `e50geo`. */
  def canonicName(datum: String, zone: Double): String = {
    val base = if (datum != null && datum.nonEmpty && (datum.head | 0x20) == 'e') "e50" else "w84"
    if (zone != 0) {
      val zi = if (zone == zone.toInt) zone.toInt.toString else zone.toString
      base + "u" + (if (zone < 10) "0" else "") + zi
    } else base + "geo"
  }

  /** `proj_string_from_utm_zone` (`osr_utm_util.py:52-65`). */
  def projString(zone: Double, datumStr: String = "+datum=WGS84"): String = {
    val isGeo = zone == 0
    var pj =
      if (isGeo) "+proj=latlong"
      else if (zone == zone.toInt) s"+proj=utm +zone=${zone.toInt}"
      else s"+proj=tmerc +k=0.9996 +lon_0=${utmZoneCenter(zone)} +x_0=500000"
    pj = pj + " " + datumStr
    if (!isGeo) pj = pj + " +units=m"
    pj + " +no_defs"
  }

  /** 3-parameter geocentric datum shift: geodetic(src) → ECEF → +Δ →
    * geodetic(dst). Covers the reference's ED50⇄WGS84 path.
    */
  def datumShift(latDeg: Double, lonDeg: Double, h: Double,
                 d: (Double, Double, Double),
                 from: Ellipsoid, to: Ellipsoid): (Double, Double, Double) = {
    val (x, y, z) = geodeticToEcef(latDeg, lonDeg, h, from)
    ecefToGeodetic(x + d._1, y + d._2, z + d._3, to)
  }

  def geodeticToEcef(latDeg: Double, lonDeg: Double, h: Double,
                     ell: Ellipsoid): (Double, Double, Double) = {
    val phi = math.toRadians(latDeg); val lam = math.toRadians(lonDeg)
    val sinPhi = math.sin(phi); val cosPhi = math.cos(phi)
    val nu = ell.a / math.sqrt(1 - ell.e2 * sinPhi * sinPhi)
    ((nu + h) * cosPhi * math.cos(lam),
      (nu + h) * cosPhi * math.sin(lam),
      (nu * (1 - ell.e2) + h) * sinPhi)
  }

  def ecefToGeodetic(x: Double, y: Double, z: Double,
                     ell: Ellipsoid): (Double, Double, Double) = {
    val lam = math.atan2(y, x)
    val p = math.hypot(x, y)
    var phi = math.atan2(z, p * (1 - ell.e2))
    var h = 0.0
    for (_ <- 0 until 8) { // fixed-point iteration, converges fast
      val sinPhi = math.sin(phi)
      val nu = ell.a / math.sqrt(1 - ell.e2 * sinPhi * sinPhi)
      h = p / math.cos(phi) - nu
      phi = math.atan2(z, p * (1 - ell.e2 * nu / (nu + h)))
    }
    (math.toDegrees(phi), math.toDegrees(lam), h)
  }

  private def normalizeLonDeg(lon: Double): Double =
    if (lon > 180) lon - 360 else if (lon <= -180) lon + 360 else lon
  private def atanh(x: Double): Double = 0.5 * math.log((1 + x) / (1 - x))
  private def asinh(x: Double): Double = math.log(x + math.sqrt(x * x + 1))
}
