package graft.core

/** Semantic raster kinds + kind-driven resampling choice (reference
  * `gdalos_types.py:59-94`). Kinds are inferred from band dtypes:
  * 3/4 Byte bands → photo, 1 Byte band → pal (palette), 1 non-Byte
  * band → dtm, else unknown.
  */
sealed trait RasterKind {
  import RasterKind._
  import ResamplingAlg._

  /** `resampling_alg_by_kind` (`gdalos_types.py:84-94`). */
  def resamplingAlg(expandRgb: Boolean = false, fastMode: Boolean = false): ResamplingAlg =
    this match {
      case Pal if !expandRgb => if (fastMode) Nearest else Mode
      case _                 => if (fastMode) Average else Cubic
    }

  /** Native at-rest sample width for COG-layout tile payloads
    * ([[graft.sources.Sinks]]): Byte kinds store 8 bits/sample, DTMs
    * Int16 (the reference's GTiff convention — resampled overviews
    * truncate to the integer grid exactly like GDAL's), Unknown stays
    * lossless Float64.
    */
  def atRestDtypeCode: Int = this match {
    case Photo | Pal => 8
    case Dtm         => 16
    case Unknown     => 64
  }
}

object RasterKind {
  case object Unknown extends RasterKind
  case object Photo   extends RasterKind
  case object Pal     extends RasterKind
  case object Dtm     extends RasterKind

  /** `RasterKind.guess` (`gdalos_types.py:65-82`); dtype names are our
    * catalog's `dtype` tags (SURVEY §1.4).
    */
  def guess(bandTypes: Seq[String]): RasterKind = {
    require(bandTypes.nonEmpty, "no bands in raster")
    val byte = bandTypes.head.equalsIgnoreCase("byte")
    if (byte) {
      if (bandTypes.length == 3 || bandTypes.length == 4) Photo
      else if (bandTypes.length == 1) Pal
      else Unknown
    } else if (bandTypes.length == 1) Dtm
    else Unknown
  }
}

/** Resampling kernels (E1; reference enum `gdalos_types.py:33-49`). */
sealed trait ResamplingAlg
object ResamplingAlg {
  case object Nearest     extends ResamplingAlg
  case object Average     extends ResamplingAlg
  case object Bilinear    extends ResamplingAlg
  case object Cubic       extends ResamplingAlg
  case object CubicSpline extends ResamplingAlg
  case object Lanczos     extends ResamplingAlg
  case object Mode        extends ResamplingAlg
}
