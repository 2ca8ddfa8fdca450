package graft.core

import org.scalatest.funsuite.AnyFunSuite

class CoreSpec extends AnyFunSuite {

  test("Angles.normalize wraps to [0,360) (geom_util.py:29-42)") {
    for ((in, out) <- Seq(-540.0 -> 180.0, -360.0 -> 0.0, -180.0 -> 180.0,
      0.0 -> 0.0, 180.0 -> 180.0, 360.0 -> 0.0, 540.0 -> 180.0, 720.0 -> 0.0, 900.0 -> 180.0))
      assert(math.abs(Angles.normalize(in) - out) < 1e-9, s"normalize($in)")
  }

  test("Angles.normalizePair orders end after start") {
    assert(Angles.normalizePair(350, 10) == (350.0, 370.0))
    assert(Angles.normalizePair(10, 350) == (10.0, 350.0))
  }

  test("Angles.fromToAngle full-circle fast path (geom_util.py:60-63)") {
    assert(Angles.fromToAngle(123, 360) == (0.0, 0.0))
  }

  test("Radio.fspl matches the reference constant (viewshed_calc.py:631)") {
    // d=1000 m, f=100 MHz: 20*(3+2) − 27.55
    assert(math.abs(Radio.fspl(1000, 100) - 72.45) < 1e-9)
  }

  test("Radio.heightCorrection (refraction_coeff.py:40-43)") {
    val hc = Radio.heightCorrection(1000, Radio.AtmosphericRefractionCoeff)
    assert(math.abs(hc - (-(6.0 / 7) * 1e6 / (2 * 6378137.0))) < 1e-12)
    assert(Radio.heightCorrection(0, 0.25) == 0.0)
    assert(math.abs(Radio.kFactor(0.25) - 4.0 / 3) < 1e-12)
  }

  test("Radio.hata* match the published worked example (900 MHz, 5 km, 50/1.5 m)") {
    // standard textbook point: urban ≈ 146.96 dB; corrections are
    // strictly ordered urban > suburban > open
    val u = Radio.hataUrban(900, 5, 50, 1.5)
    assert(math.abs(u - 146.96) < 0.05, s"urban $u")
    val s = Radio.hataSuburban(900, 5, 50, 1.5)
    val o = Radio.hataOpen(900, 5, 50, 1.5)
    assert(math.abs(s - (u - 2.0 * math.pow(math.log10(900 / 28.0), 2) - 5.4)) < 1e-12)
    assert(u > s && s > o)
    // distance monotone (44.9 − 6.55·log10 hb > 0 for hb < ~10^6.85)
    assert(Radio.hataUrban(900, 10, 50, 1.5) > u)
  }

  test("RasterKind.guess (gdalos_types.py:65-82)") {
    import RasterKind._
    assert(guess(Seq("byte", "byte", "byte")) == Photo)
    assert(guess(Seq("byte", "byte", "byte", "byte")) == Photo)
    assert(guess(Seq("byte")) == Pal)
    assert(guess(Seq("int16")) == Dtm)
    assert(guess(Seq("int16", "int16")) == Unknown)
  }

  test("resampling choice by kind (gdalos_types.py:84-94)") {
    import ResamplingAlg._
    assert(RasterKind.Pal.resamplingAlg() == Mode)
    assert(RasterKind.Pal.resamplingAlg(fastMode = true) == Nearest)
    assert(RasterKind.Pal.resamplingAlg(expandRgb = true) == Cubic)
    assert(RasterKind.Dtm.resamplingAlg() == Cubic)
    assert(RasterKind.Photo.resamplingAlg(fastMode = true) == Average)
  }

  test("Palette.parseColorFile: absolute, percent, nv rows") {
    val p = Palette.parseColorFile(
      """# comment
        |0 0 0 255
        |100 255 0 0
        |50% 0 255 0 128
        |nv 0 0 0 0""".stripMargin)
    assert(p.entries.size == 2 && p.percentEntries.size == 1)
    assert(p.nodataColor.contains(0x00000000))
    assert(p.entries(0.0) == 0xff0000ff && p.entries(100.0) == 0xffff0000)
    val resolved = p.applyPercent(0, 200) // 50% → 100 overwrites absolute 100
    assert(resolved.entries(100.0) == 0x8000ff00)
  }

  test("Palette.interp / nearest (gdalos_raster_color.py:60-69)") {
    val p = Palette.parseColorFile("0 0 0 0\n100 100 100 100")
    // rows are `value R G B` (alpha defaults 255): midpoint → ff323232
    assert(p.interp(50.0) == 0xff323232)
    assert(p.interp(-10) == p.entries(0.0) && p.interp(500) == p.entries(100.0))
    assert(p.nearest(49) == p.entries(0.0) && p.nearest(51) == p.entries(100.0))
    assert(p.nearest(50) == p.entries(0.0)) // tie → lower key
  }

  test("Palette.parseTalos ($AABBGGRR quads, gdalos_color.py:11-39)") {
    val talos = "0;2;6;0;10;0;1;1;0;|;$CC0000FF;0;3;2|;$CC00FF00;0;3;2"
    val p = Palette.parseTalos(talos)
    assert(p.entries.size == 2)
    assert(p.entries(0.0) == 0xccff0000)  // $CC0000FF = a=CC,b=00,g=00,r=FF → ARGB ccff0000
    assert(p.entries(10.0) == 0xcc00ff00)
  }
  test("Palette corpus: every .txt color file in the reference data tree parses") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val root = Paths.get("/root/reference/data/color_files")
    assume(Files.isDirectory(root))
    val files = Files.walk(root).iterator().asScala
      .filter(f => f.toString.endsWith(".txt")).toSeq.sortBy(_.toString)
    assert(files.size >= 9, s"expected the full corpus, found ${files.size}")
    files.foreach { f =>
      val pal = Palette.parseColorFile(Files.readString(f))
      val n = pal.entries.size + pal.percentEntries.size
      assert(n > 0, s"$f parsed to an empty palette")
      // a resolved palette must interpolate over its whole key range
      val resolved = if (pal.isPercent) pal.applyPercent(0, 1000) else pal
      val keys = resolved.entries.keys.toSeq
      val mid = (keys.head + keys.last) / 2
      resolved.interp(mid) // must not throw
      resolved.nearest(mid)
      // percent files resolve percents monotonically into the range
      if (pal.isPercent) assert(keys == keys.sorted)
    }
    // spot-check known rows of the corpus
    val comb = Palette.parseColorFile(
      Files.readString(root.resolve("viewshed/comb.txt")))
    assert(comb.entries(1.0) == 0xff00008f) // "1 0 0 143"
    assert(comb.entries(0.0) == 0x00ffffff) // alpha 0 row
    val pct = Palette.parseColorFile(Files.readString(root.resolve("percents.txt")))
    assert(pct.isPercent && pct.nodataColor.contains(0x00000000))
    val resolved = pct.applyPercent(0, 100)
    assert(resolved.entries.contains(100.0) && resolved.entries(100.0) == 0xccff00ff)
  }
}
