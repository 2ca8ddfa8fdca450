package graft.core

import scala.collection.immutable.TreeMap

/** Color palette: ordered map value → ARGB, with percent-relative keys
  * and a nodata entry (reference: talos string format parser
  * `gdalos_color.py:11-39`, color-file rows `value R G B [A]` /
  * `percent%` / `nv` per `data/color_files/gradient/rainbow.txt`,
  * percent→absolute resolution `viewshed_calc.py:438-440`, dict form
  * `gdalos_color.py:69-85`).
  */
final case class Palette(entries: TreeMap[Double, Int],
                         percentEntries: TreeMap[Double, Int],
                         nodataColor: Option[Int]) {

  def isPercent: Boolean = percentEntries.nonEmpty

  /** Resolve percent keys against a (min,max) range
    * (`apply_percent` use, `viewshed_calc.py:438-440`).
    */
  def applyPercent(min: Double, max: Double): Palette = {
    val resolved = percentEntries.map { case (p, c) => (min + (max - min) * p / 100.0, c) }
    Palette(entries ++ resolved, TreeMap.empty, nodataColor)
  }

  /** Nearest-key lookup (`-nearest_color_entry` mode,
    * `gdalos_raster_color.py:60-69`): the entry whose key is closest;
    * ties take the lower key.
    */
  def nearest(v: Double): Int = {
    require(entries.nonEmpty, "empty palette")
    entries.minBy { case (k, _) => (math.abs(k - v), k) }._2
  }

  /** Linear color-relief interpolation between bracketing keys
    * (`gdalos_raster_color.py:60-69` interp mode). Clamps outside the
    * key range.
    */
  def interp(v: Double): Int = {
    require(entries.nonEmpty, "empty palette")
    val below = entries.rangeTo(v)
    val above = entries.rangeFrom(v)
    (below.lastOption, above.headOption) match {
      case (Some((k0, c0)), Some((k1, c1))) if k0 != k1 =>
        val t = (v - k0) / (k1 - k0)
        def lerp(sh: Int): Int = {
          val a = (c0 >>> sh) & 0xff; val b = (c1 >>> sh) & 0xff
          math.round(a + t * (b - a)).toInt & 0xff
        }
        (lerp(24) << 24) | (lerp(16) << 16) | (lerp(8) << 8) | lerp(0)
      case (Some((_, c)), None) => c // above top key
      case (None, Some((_, c))) => c // below bottom key
      case (Some((_, c)), _)    => c
      case _                    => throw new IllegalStateException("unreachable")
    }
  }
}

object Palette {
  val empty: Palette = Palette(TreeMap.empty, TreeMap.empty, None)

  /** Parse GDAL color-file text: one entry per line,
    * `value R G B [A]` with value either numeric, `N%`, or `nv`
    * (nodata). Lines may use commas or whitespace; `#` comments.
    */
  def parseColorFile(text: String): Palette = {
    var abs = TreeMap.empty[Double, Int]
    var pct = TreeMap.empty[Double, Int]
    var nv: Option[Int] = None
    for (raw <- text.linesIterator) {
      val line = raw.takeWhile(_ != '#').trim
      if (line.nonEmpty) {
        val toks = line.split("[,\\s]+")
        if (toks.length >= 2) {
          val rgba = toks.drop(1).map(_.toInt)
          val a = if (rgba.length >= 4) rgba(3) else 255
          val argb = (a << 24) | (rgba(0) << 16) | (rgba(1) << 8) | rgba(2)
          toks(0) match {
            case "nv" => nv = Some(argb)
            case k if k.endsWith("%") => pct += (k.dropRight(1).toDouble -> argb)
            case k => abs += (k.toDouble -> argb)
          }
        }
      }
    }
    Palette(abs, pct, nv)
  }

  /** Parse the talos `;`-separated palette string
    * (`read_talos_palette`, `gdalos_color.py:11-39`): header
    * `min;count;selected;lock;multiplier;special;interp;?;logBase`,
    * then per-entry `name;?;$AABBGGRR;brush` quads; key i =
    * min + i·multiplier (or logBase^key when logBase ≠ 0).
    */
  def parseTalos(s: String): Palette = {
    val x = s.split(";", -1)
    val minValue = x(0).toDouble
    val count = x(1).toInt
    val multiplier = x(4).toDouble
    val logBase = x(8).toDouble
    val lnLogBase = if (logBase == 0) None else Some(math.log(logBase))
    var pal = TreeMap.empty[Double, Int]
    var j = 8
    for (i <- 0 until count) {
      val color = pasColorToRgb(x(j + 2))
      var key = minValue + i * multiplier
      lnLogBase.foreach(ln => key = math.exp(ln * key))
      pal += (key -> color)
      j += 4
    }
    Palette(pal, TreeMap.empty, None)
  }

  /** Delphi `$AABBGGRR` (or `$BBGGRR`) → ARGB int (the reference's
    * `pas_color_to_rgb`, used by `gdalos_color.py:29`).
    */
  def pasColorToRgb(c: String): Int = {
    val hex = java.lang.Long.parseLong(c.stripPrefix("$"), 16)
    val b = (hex >> 16) & 0xff; val g = (hex >> 8) & 0xff; val r = hex & 0xff
    val a = if (c.stripPrefix("$").length > 6) (hex >> 24) & 0xff else 0xffL
    ((a << 24) | (r << 16) | (g << 8) | b).toInt
  }
}
