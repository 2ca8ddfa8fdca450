package graft.sources

import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Writers & sinks (SURVEY §2 A3/A10/A11/A12/A13 + the B5 write rule).
  *
  * The COG analogue (A3) is a layout policy, not a format: cluster
  * tiles by spatial key and keep them sorted inside each file so a
  * range read touches contiguous row groups — exactly what
  * `repartitionByRange` + `sortWithinPartitions` give Parquet.
  * Small-output sinks (info/CZML/JSON) collect by design, mirroring
  * the reference's driver-side serializers
  * (`calc/gdal_to_czml.py:19-118`, `calc/gdal_to_json.py:5-21`);
  * they guard against large frames instead of silently collecting.
  */
object Sinks {

  /** A3 COG-style clustered tile write: spatially ordered parquet
    * (`TILED/BLOCKXSIZE` + clustered-layout options assembled at
    * `gdalos_trans.py:773-816`). `buckets` bounds file count; within a
    * file tiles are (ty,tx)-sorted for monotone range scans.
    *
    * Tile payloads go to rest as dtype-tagged BINARY (SURVEY §7.4:
    * little-endian samples at the raster's native width via
    * `tile_pack`), not `ARRAY<DOUBLE>` — an Int16 DEM is 4× smaller
    * on disk and on every downstream scan, exactly like the
    * reference's GTiff staying Int16 instead of inflating to Float64.
    * `dtypeCode` is the sample bit width (8 Byte, 16 Int16, 32
    * Float32, 64 Float64 — bit-exact). LOSSY CONTRACT for the
    * integer codes (same as the GeoTiff writer's): fractional
    * samples truncate toward zero — sub-integer precision from
    * Average/Cubic-resampled warps does NOT survive an Int16
    * at-rest round trip — and out-of-range values saturate at the
    * int cast then narrow by two's-complement wrap (semantics
    * pinned in RasterOpsSpec). Callers pick the code from the
    * raster kind ([[graft.core.RasterKind]]); anything that needs
    * lossless `ARRAY<DOUBLE>` fidelity keeps the default 64.
    * The `dtype` column makes files self-describing —
    * [[readCogLayout]] restores the `ARRAY<DOUBLE>` compute form.
    */
  def writeCogLayout(tiles: DataFrame, path: String, buckets: Int = 8,
                     dtypeCode: Int = 64): Unit = {
    val packed = tiles.schema.find(_.name == "data").map(_.dataType) match {
      case Some(org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.DoubleType, _)) =>
        graft.raster.PixelFrame.packBinary(tiles, dtypeCode)
      case _ => tiles // already binary (or no tile payload): pass through
    }
    packed.repartitionByRange(buckets, col("ty"), col("tx"))
      .sortWithinPartitions("ty", "tx")
      .write.mode(SaveMode.Overwrite).parquet(path)
  }

  /** Read a [[writeCogLayout]] directory back to the `ARRAY<DOUBLE>`
    * compute form (self-describing via the `dtype` column; legacy
    * array-payload layouts pass through unchanged).
    */
  def readCogLayout(spark: org.apache.spark.sql.SparkSession,
                    path: String): DataFrame = {
    val df = spark.read.parquet(path)
    if (df.columns.contains("dtype")) graft.raster.PixelFrame.unpackBinary(df)
    else df
  }

  /** B5 alpha/JPEG exclusion rule (`gdalos_trans.py:437-459`): JPEG +
    * YCBCR cannot carry an alpha band — drop band 4 when writing
    * lossy photo rasters.
    */
  def applyWriteBandRule(tiles: DataFrame, lossy: Boolean, kindIsPhoto: Boolean): DataFrame =
    if (lossy && kindIsPhoto) tiles.filter(col("band") =!= 4) else tiles

  /** A10 info sink: schema + stats + plan text to `<path>.info`
    * (`gdalos_info`, `gdalos_trans.py:1220-1234`).
    */
  def infoSink(df: DataFrame, path: String): Unit = {
    val text = new StringBuilder
    text ++= df.schema.treeString
    text ++= df.describe().collect().map(_.toString).mkString("\n")
    text ++= "\n\n" ++= df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("simple"))
    Files.writeString(Paths.get(path + ".info"), text.toString)
  }

  /** A13 XYZ sink: whitespace-separated table (`np.savetxt` branch,
    * `viewshed_calc.py:964-966`). Distributed CSV write.
    */
  def xyzSink(df: DataFrame, path: String): Unit =
    df.write.mode(SaveMode.Overwrite)
      .option("sep", " ").option("header", "false").csv(path)

  /** A12 JSON sink: raster → `{bbox, gt, size, ndv, data[band][...]}`
    * (`gdal_to_json`, `calc/gdal_to_json.py:5-21`). Collects — guarded
    * to small rasters, like the reference's in-memory dict.
    */
  def rasterToJson(pixels: DataFrame, gt: Array[Double], ndv: Double,
                   maxPixels: Long = 1000000): String = {
    val rows = pixels.select("band", "px", "py", "v")
      .orderBy("band", "py", "px").limit(maxPixels.toInt + 1).collect()
    require(rows.length <= maxPixels, s"raster too large for JSON sink (> $maxPixels px)")
    val w = rows.map(_.getInt(1)).max + 1
    val h = rows.map(_.getInt(2)).max + 1
    val byBand = rows.groupBy(_.getInt(0)).toSeq.sortBy(_._1)
    val data = byBand.map { case (_, rs) =>
      rs.sortBy(r => (r.getInt(2), r.getInt(1))).map(_.getDouble(3))
        .grouped(w).map(_.mkString("[", ",", "]")).mkString("[", ",", "]")
    }.mkString("[", ",", "]")
    s"""{"size":[$w,$h],"gt":${gt.mkString("[", ",", "]")},"ndv":$ndv,"bands":${byBand.size},"data":$data}"""
  }

  /** A11 CZML sink: warp-to-4326 rectangle packet with an embedded
    * PNG image (`gdal_to_czml`, `calc/gdal_to_czml.py:19-78`) — a real
    * PNG, encoded by [[Png]] (pure-JDK codec), base64'd into the data
    * URI. Styled input carries `argb`.
    */
  def rasterToCzml(styled: DataFrame, name: String,
                   extent4326: (Double, Double, Double, Double),
                   maxPixels: Long = 250000): String = {
    // limit(max+1)+require BEFORE deriving bounds — truncating first
    // could shrink the surviving bbox under the guard and silently
    // emit a partial image (missing pixels = transparent black)
    val rows = styled.select("px", "py", "argb")
      .orderBy("py", "px").limit(maxPixels.toInt + 1).collect()
    require(rows.length <= maxPixels, s"raster too large for CZML sink (> $maxPixels px)")
    val imgW = rows.map(_.getInt(0)).max + 1
    val imgH = rows.map(_.getInt(1)).max + 1
    require(imgW.toLong * imgH <= maxPixels, s"raster too large for CZML sink")
    val pix = new Array[Int](imgW * imgH)
    rows.foreach(r => pix(r.getInt(1) * imgW + r.getInt(0)) = r.getInt(2))
    val b64 = Base64.getEncoder.encodeToString(Png.encode(imgW, imgH, pix))
    val (w, s, e, n) = extent4326
    s"""[{"id":"document","name":"$name","version":"1.0"},
       |{"id":"$name","rectangle":{"coordinates":{"wsenDegrees":[$w,$s,$e,$n]},
       |"material":{"image":{"image":{"uri":"data:image/png;base64,$b64"}}}}}]""".stripMargin
  }

  /** A11 polyline variant (`polyline_to_czml`,
    * `calc/gdal_to_czml.py:95-118`): LOS result polylines.
    */
  def polylinesToCzml(polys: Seq[Seq[(Double, Double, Double)]], colors: Seq[Int]): String = {
    val packets = polys.zip(colors).zipWithIndex.map { case ((pts, argb), i) =>
      val coords = pts.flatMap(p => Seq(p._1, p._2, p._3)).mkString(",")
      val rgba = Seq((argb >> 16) & 0xff, (argb >> 8) & 0xff, argb & 0xff, (argb >>> 24) & 0xff)
      s"""{"id":"polyline$i","polyline":{"positions":{"cartographicDegrees":[$coords]},
         |"material":{"solidColor":{"color":{"rgba":${rgba.mkString("[", ",", "]")}}}}}}""".stripMargin
    }
    (Seq("""{"id":"document","name":"polylines","version":"1.0"}""") ++ packets)
      .mkString("[", ",\n", "]")
  }
}
