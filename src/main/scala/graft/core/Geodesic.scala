package graft.core

/** H2 geodesic inverse — azimuths + distance between two geographic
  * points on the WGS84 ellipsoid (reference: `calc_dist` /
  * `g_wgs84.inv`, `viewshed_calc.py:620-624`; cross-library
  * differential test `tests/geod_pyproj_vs_geographiclib.py:35-65`).
  *
  * Vincenty's inverse formula (public-domain): sub-millimeter for all
  * but near-antipodal pairs (where the iteration can fail to
  * converge — those fall back to the spherical great-circle, flagged
  * in the result). Pure JVM and allocation-free per call, so it can
  * back a row-level expression like the UTM kernels.
  */
object Geodesic {

  /** (azimuth1→2 deg, azimuth2→1 deg, distance m, converged). */
  final case class Inverse(az12: Double, az21: Double, distM: Double, converged: Boolean)

  def inverse(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
              ell: Proj.Ellipsoid = Proj.Wgs84): Inverse = {
    val a = ell.a; val f = ell.f; val b = a * (1 - f)
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val L = math.toRadians(lon2 - lon1)
    val u1 = math.atan((1 - f) * math.tan(phi1))
    val u2 = math.atan((1 - f) * math.tan(phi2))
    val sinU1 = math.sin(u1); val cosU1 = math.cos(u1)
    val sinU2 = math.sin(u2); val cosU2 = math.cos(u2)

    var lambda = L
    var iter = 0
    var converged = false
    var sinSigma = 0.0; var cosSigma = 0.0; var sigma = 0.0
    var cosSqAlpha = 0.0; var cos2SigmaM = 0.0
    while (iter < 100 && !converged) {
      val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
      sinSigma = math.sqrt(
        math.pow(cosU2 * sinLambda, 2) +
          math.pow(cosU1 * sinU2 - sinU1 * cosU2 * cosLambda, 2))
      if (sinSigma == 0.0)
        return Inverse(0, 0, 0, converged = true) // coincident points
      cosSigma = sinU1 * sinU2 + cosU1 * cosU2 * cosLambda
      sigma = math.atan2(sinSigma, cosSigma)
      val sinAlpha = cosU1 * cosU2 * sinLambda / sinSigma
      cosSqAlpha = 1 - sinAlpha * sinAlpha
      cos2SigmaM = if (cosSqAlpha == 0) 0.0
        else cosSigma - 2 * sinU1 * sinU2 / cosSqAlpha
      val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
      val lambdaPrev = lambda
      lambda = L + (1 - c) * f * sinAlpha *
        (sigma + c * sinSigma *
          (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
      if (math.abs(lambda - lambdaPrev) < 1e-12) converged = true
      iter += 1
    }

    if (!converged) {
      // near-antipodal fallback: spherical haversine + great-circle azimuths
      val d = haversine(lat1, lon1, lat2, lon2, (2 * a + b) / 3)
      return Inverse(sphericalAzimuth(lat1, lon1, lat2, lon2),
        Angles.normalize(sphericalAzimuth(lat2, lon2, lat1, lon1)),
        d, converged = false)
    }

    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))
    val deltaSigma = bigB * sinSigma *
      (cos2SigmaM + bigB / 4 *
        (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
          bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
            (-3 + 4 * cos2SigmaM * cos2SigmaM)))
    val dist = b * bigA * (sigma - deltaSigma)

    val sinLambda = math.sin(lambda); val cosLambda = math.cos(lambda)
    val az12 = math.toDegrees(math.atan2(cosU2 * sinLambda,
      cosU1 * sinU2 - sinU1 * cosU2 * cosLambda))
    // Vincenty's α2 is the forward azimuth AT point 2; the back
    // azimuth 2→1 (what pyproj's inv returns) is α2 + 180°.
    val az21 = math.toDegrees(math.atan2(cosU1 * sinLambda,
      -sinU1 * cosU2 + cosU1 * sinU2 * cosLambda)) + 180.0
    Inverse(Angles.normalize(az12), Angles.normalize(az21), dist, converged = true)
  }

  /** (lat2 deg, lon2 deg, forward azimuth at 2 deg). */
  final case class Direct(lat2: Double, lon2: Double, az2: Double)

  /** Vincenty's direct formula (public-domain): destination point
    * given start, initial azimuth and distance. The second half of
    * the geodesic toolkit — together with [[inverse]] it backs the
    * ellipsoidal azimuthal-equidistant projection (PROJ's aeqd is
    * exactly this geodesic construction).
    */
  def direct(lat1: Double, lon1: Double, az12Deg: Double, distM: Double,
             ell: Proj.Ellipsoid = Proj.Wgs84): Direct = {
    val a = ell.a; val f = ell.f; val b = a * (1 - f)
    val alpha1 = math.toRadians(az12Deg)
    val sinAlpha1 = math.sin(alpha1); val cosAlpha1 = math.cos(alpha1)
    val tanU1 = (1 - f) * math.tan(math.toRadians(lat1))
    val cosU1 = 1 / math.sqrt(1 + tanU1 * tanU1); val sinU1 = tanU1 * cosU1
    val sigma1 = math.atan2(tanU1, cosAlpha1)
    val sinAlpha = cosU1 * sinAlpha1
    val cosSqAlpha = 1 - sinAlpha * sinAlpha
    val uSq = cosSqAlpha * (a * a - b * b) / (b * b)
    val bigA = 1 + uSq / 16384 * (4096 + uSq * (-768 + uSq * (320 - 175 * uSq)))
    val bigB = uSq / 1024 * (256 + uSq * (-128 + uSq * (74 - 47 * uSq)))

    var sigma = distM / (b * bigA)
    var sigmaPrev = 2 * math.Pi
    var cos2SigmaM = 0.0; var sinSigma = 0.0; var cosSigma = 0.0
    var iter = 0
    while (math.abs(sigma - sigmaPrev) > 1e-12 && iter < 100) {
      cos2SigmaM = math.cos(2 * sigma1 + sigma)
      sinSigma = math.sin(sigma); cosSigma = math.cos(sigma)
      val deltaSigma = bigB * sinSigma *
        (cos2SigmaM + bigB / 4 *
          (cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM) -
            bigB / 6 * cos2SigmaM * (-3 + 4 * sinSigma * sinSigma) *
              (-3 + 4 * cos2SigmaM * cos2SigmaM)))
      sigmaPrev = sigma
      sigma = distM / (b * bigA) + deltaSigma
      iter += 1
    }
    cos2SigmaM = math.cos(2 * sigma1 + sigma)
    sinSigma = math.sin(sigma); cosSigma = math.cos(sigma)

    val tmp = sinU1 * sinSigma - cosU1 * cosSigma * cosAlpha1
    val lat2 = math.atan2(sinU1 * cosSigma + cosU1 * sinSigma * cosAlpha1,
      (1 - f) * math.hypot(sinAlpha, tmp))
    val lambda = math.atan2(sinSigma * sinAlpha1,
      cosU1 * cosSigma - sinU1 * sinSigma * cosAlpha1)
    val c = f / 16 * cosSqAlpha * (4 + f * (4 - 3 * cosSqAlpha))
    val bigL = lambda - (1 - c) * f * sinAlpha *
      (sigma + c * sinSigma *
        (cos2SigmaM + c * cosSigma * (-1 + 2 * cos2SigmaM * cos2SigmaM)))
    val lon2 = lon1 + math.toDegrees(bigL)
    val az2 = math.toDegrees(math.atan2(sinAlpha, -tmp))
    Direct(math.toDegrees(lat2),
      if (lon2 > 180) lon2 - 360 else if (lon2 <= -180) lon2 + 360 else lon2,
      Angles.normalize(az2))
  }

  /** Spherical haversine distance (the differential cross-check — an
    * independent formulation the Vincenty result must agree with to
    * ~0.5%, the flattening bound).
    */
  def haversine(lat1: Double, lon1: Double, lat2: Double, lon2: Double,
                radius: Double = 6371008.8): Double = {
    val dPhi = math.toRadians(lat2 - lat1)
    val dLam = math.toRadians(lon2 - lon1)
    val s = math.pow(math.sin(dPhi / 2), 2) +
      math.cos(math.toRadians(lat1)) * math.cos(math.toRadians(lat2)) *
        math.pow(math.sin(dLam / 2), 2)
    2 * radius * math.asin(math.min(1.0, math.sqrt(s)))
  }

  private def sphericalAzimuth(lat1: Double, lon1: Double,
                               lat2: Double, lon2: Double): Double = {
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val dLam = math.toRadians(lon2 - lon1)
    math.toDegrees(math.atan2(math.sin(dLam) * math.cos(phi2),
      math.cos(phi1) * math.sin(phi2) - math.sin(phi1) * math.cos(phi2) * math.cos(dLam)))
  }
}
