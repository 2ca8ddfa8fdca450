package graft.core

import org.scalacheck.Gen
import org.scalatest.funsuite.AnyFunSuite

import graft.PropCheck

class ProjSpec extends AnyFunSuite with PropCheck {
  private val utm36 = Proj.utm(36) // lon0 = 33

  test("forward/inverse round-trips to <1e-9 degrees across the zone") {
    forAllN2(Gen.chooseNum(-80.0, 80.0), Gen.chooseNum(-3.0, 3.0), 200) { (lat, dLon) =>
      val (e, n) = utm36.forward(lat, 33 + dLon)
      val (lat2, lon2) = utm36.inverse(e, n)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat dLon $dLon")
      assert(math.abs(lon2 - (33 + dLon)) < 1e-9)
    }
  }

  test("central meridian maps to easting 500000; equator to northing 0") {
    val (e0, n0) = utm36.forward(0, 33)
    assert(math.abs(e0 - 500000.0) < 1e-6 && math.abs(n0) < 1e-6)
    val (e1, _) = utm36.forward(45, 33)
    assert(math.abs(e1 - 500000.0) < 1e-6)
  }

  test("scale on the central meridian ≈ k0 = 0.9996") {
    val (_, n1) = utm36.forward(45.0, 33)
    val (_, n2) = utm36.forward(45.001, 33)
    // meridian arc length for 0.001° at 45°: M ≈ 111.132 km/deg
    val arc = (n2 - n1) / 0.001
    assert(math.abs(arc / 111131.7 - 0.9996) < 1e-3)
  }

  test("known geometry: 3° off-meridian easting at the equator ≈ 834 km") {
    val (e, _) = utm36.forward(0, 36)
    assert(math.abs(e - 833978) < 200) // published UTM zone-edge easting
  }

  test("zone helpers (osr_utm_util.py:9-25, utm_convergence.py:13-15)") {
    assert(Proj.utmZoneCenter(36) == 33.0)
    assert(Proj.utmZoneCenter(1) == -177.0)
    assert(Proj.utmZoneByLon(33) == 36.0)
    assert(Proj.utmZoneByLon(-179) == 1.0)
    assert(Proj.utmZoneByLon(33.5, allowFloatZone = true) == 33.5 / 6 + 30.5)
    assert(Proj.zoneLon0(36) == 33.0)
  }

  test("talos names (talos_osr.py:8-30)") {
    assert(Proj.zoneFromName("w84u36") == 36.0)
    assert(Proj.zoneFromName("e50u07") == 7.0)
    assert(Proj.zoneFromName("w84geo") == 0.0)
    assert(Proj.zoneFromName("nonsense") == 0.0)
    assert(Proj.canonicName("WGS84", 36) == "w84u36")
    assert(Proj.canonicName("ed50", 7) == "e50u07")
    assert(Proj.canonicName("WGS84", 0) == "w84geo")
    assert(Proj.epsgFromName("w84geo") == 4326)
    assert(Proj.epsgFromName("e50geo") == 4230)
    assert(Proj.epsgFromName("w84u36") == 32636)
    assert(Proj.epsgFromName("e50u07") == 23007)
    assertThrows[IllegalArgumentException](Proj.epsgFromName("w84u36.5"))
  }

  test("proj strings (osr_utm_util.py:52-65)") {
    assert(Proj.projString(36) == "+proj=utm +zone=36 +datum=WGS84 +units=m +no_defs")
    assert(Proj.projString(0) == "+proj=latlong +datum=WGS84 +no_defs")
    assert(Proj.projString(36.5).startsWith("+proj=tmerc +k=0.9996 +lon_0=36.0"))
  }

  test("ED50 datum shift magnitude and round trip (talos_osr.py:34)") {
    val (lat, lon, h) = Proj.datumShift(32.0, 34.8, 0,
      Proj.Ed50ToWgs84, Proj.Intl, Proj.Wgs84)
    // ED50→WGS84 in the eastern Mediterranean is a ~100–200 m shift
    val distM = math.hypot((lat - 32.0) * 111000, (lon - 34.8) * 111000 * math.cos(0.56))
    assert(distM > 50 && distM < 300, s"shift was $distM m")
    // inverse shift returns (to <1mm)
    val (lat2, lon2, _) = Proj.datumShift(lat, lon, h,
      (87.0, 98.0, 121.0), Proj.Wgs84, Proj.Intl)
    assert(math.abs(lat2 - 32.0) < 1e-8 && math.abs(lon2 - 34.8) < 1e-8)
  }

  test("meridian convergence small-angle formula (utm_convergence.py:18-20)") {
    assert(Proj.utmConvergence(33, 45, 33) == 0.0)
    val c = Proj.utmConvergence(34, 45, 33) // 1° east at 45°N
    assert(math.abs(c - math.toRadians(math.sin(math.toRadians(45)))) < 1e-12)
  }

  test("ExtentUtils.transformExtent: geo extent → projected bbox (H5)") {
    val geo = GeoRectangle(32, 31, 34, 33) // around zone 36's west side
    val proj = ExtentUtils.transformExtent(geo,
      (x, y) => utm36.forward(y, x)) // transform takes (x=lon, y=lat)... see note
    assert(!proj.isEmpty)
    // projected extent must contain the projected corners
    val (e1, n1) = utm36.forward(31, 32)
    assert(proj.containsPoint(e1, n1))
  }

  test("Geodesic inverse: known arc lengths on WGS84 (H2)") {
    // 1° of longitude along the equator = a·π/180 ≈ 111319.491 m
    val eq = Geodesic.inverse(0, 0, 0, 1)
    assert(math.abs(eq.distM - 111319.491) < 0.01 && eq.converged)
    assert(math.abs(eq.az12 - 90.0) < 1e-9)
    // 1° of latitude from the equator ≈ 110574.39 m (meridian arc)
    val mer = Geodesic.inverse(0, 0, 1, 0)
    assert(math.abs(mer.distM - 110574.39) < 0.5)
    assert(math.abs(mer.az12 - 0.0) < 1e-9 && math.abs(mer.az21 - 180.0) < 1e-9)
    // coincident points
    assert(Geodesic.inverse(45, 33, 45, 33).distM == 0.0)
  }

  test("Geodesic differential: Vincenty vs haversine within flattening bound") {
    forAllN2(Gen.chooseNum(-70.0, 70.0), Gen.chooseNum(-170.0, 170.0), 100) { (lat, lon) =>
      val v = Geodesic.inverse(10, 20, lat, lon)
      val h = Geodesic.haversine(10, 20, lat, lon)
      if (v.distM > 1000) // relative bound meaningless at tiny distances
        assert(math.abs(v.distM - h) / v.distM < 0.006,
          s"($lat,$lon): vincenty ${v.distM} vs haversine $h")
    }
  }

  test("ExtentUtils.transformResolution + roundToSig (R6/D9)") {
    // identity transform: resolution passes through (rounded to sig digit)
    val (rx, ry) = ExtentUtils.transformResolution(
      (x, y) => (x, y), (0.25, 0.25), GeoRectangle(0, 0, 10, 10), 100)
    assert(rx == 0.25 && ry == -0.25)
    assert(ExtentUtils.roundToSig(123.456, -1) == 120.0)
    assert(ExtentUtils.roundToSig(0.0001234, -1) == 0.00012)
    assert(ExtentUtils.roundToSig(0) == 0.0)
  }
  test("Vincenty direct inverts the geodesic inverse (round-trip < 1e-9 deg)") {
    forAllN2(Gen.chooseNum(-80.0, 80.0), Gen.chooseNum(-179.0, 179.0), 200) { (lat, lon) =>
      val inv = Geodesic.inverse(31.5, 34.5, lat, lon)
      if (inv.converged && inv.distM > 1) {
        val d = Geodesic.direct(31.5, 34.5, inv.az12, inv.distM)
        assert(math.abs(d.lat2 - lat) < 1e-9, s"lat: $lat vs ${d.lat2}")
        val dLon = math.abs(d.lon2 - lon) min math.abs(math.abs(d.lon2 - lon) - 360)
        assert(dLon < 1e-9, s"lon: $lon vs ${d.lon2}")
      }
    }
  }

  test("aeqd forward/inverse round-trips to <1e-9 degrees (gdalos_selector.py:67-69)") {
    val pj = Proj.Aeqd(31.5, 34.5)
    forAllN2(Gen.chooseNum(-45.0, 75.0), Gen.chooseNum(-60.0, 130.0), 200) { (lat, lon) =>
      val (x, y) = pj.forward(lat, lon)
      val (lat2, lon2) = pj.inverse(x, y)
      assert(math.abs(lat2 - lat) < 1e-9, s"lat $lat lon $lon -> $lat2")
      assert(math.abs(lon2 - lon) < 1e-9, s"lat $lat lon $lon -> $lon2")
    }
  }

  test("aeqd known geometry: center maps to origin; equator arc eastward") {
    val eq = Proj.Aeqd(0.0, 0.0)
    val (x0, y0) = eq.forward(0, 0)
    assert(math.abs(x0) < 1e-9 && math.abs(y0) < 1e-9)
    // 1 deg along the equator is an exact ellipsoid arc: a * pi/180
    val (x1, y1) = eq.forward(0, 1)
    assert(math.abs(x1 - Proj.Wgs84.a * math.Pi / 180) < 1e-3, s"x1 $x1")
    assert(math.abs(y1) < 1e-6)
    // due north: distance equals the meridian arc (within 1 m of the
    // published 1-degree meridian arc length at the equator ~110574.3 m)
    val (x2, y2) = eq.forward(1, 0)
    assert(math.abs(x2) < 1e-6)
    assert(math.abs(y2 - 110574.39) < 1.0, s"y2 $y2")
    // distances from the center are geodesic distances by construction
    val p = eq.forward(12.3, 45.6)
    val d = Geodesic.inverse(0, 0, 12.3, 45.6).distM
    assert(math.abs(math.hypot(p._1, p._2) - d) < 1e-6)
  }
}
