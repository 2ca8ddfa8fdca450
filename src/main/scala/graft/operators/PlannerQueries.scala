package graft.operators

import java.nio.file.{Files, Paths}
import java.util.Base64

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{ExtentUtils, GeoRectangle, Jobs}
import graft.catalog.Catalog
import graft.raster.PixelFrame
import graft.sources.{FileList, Png, Sinks}

/** Declared correctness queries for the DRIVER-SIDE planning and
  * sidecar-sink operators (SURVEY §2 rows A2, A10–A12, B5, F3, F5,
  * G3, H5) — the rows the coverage table previously carried as
  * "spec-only": each is pure planning code (no table input), so the
  * gate here synthesizes its input deterministically, runs the real
  * operator, and lands the result in a shape a DuckDB oracle can
  * recompute from scratch (the q106/q119 closed-form pattern). For
  * the text sidecars (JSON/CZML/info) the gate is a ROUND-TRIP: the
  * sink's actual output string/file is decoded back into rows inside
  * the query, so a wrong byte anywhere in the sidecar (or in the
  * pure-JDK PNG codec under the CZML data URI) breaks the hash.
  *
  * These are planner-metadata paths — driver-sized by contract (the
  * reference holds the same structures in Python lists/dicts:
  * `gdalos_util.py:37-66`, `gdalos_trans.py:62-70`,
  * `viewshed_calc.py:105-110`); the 100-TB story is that they stay
  * O(jobs), never O(rows).
  */
object PlannerQueries {

  /** q233 A2 file-list expansion ([[graft.sources.FileList]],
    * `flatten_and_expand_file_list` `gdalos_util.py:37-66`): nested
    * list flatten + `*`/`?` glob + `.txt` path-list expansion
    * (with a glob INSIDE the txt exercising the recursion), over the
    * sf dir's real files. Deterministic: glob matches are sorted,
    * list order is preserved. Oracle: the sf dir's fixed table set.
    */
  def q233(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val txt = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_q233_list_${ProcessHandle.current().pid()}.txt")
    Files.writeString(txt, s"$d/part.parquet\n\n  $d/or*.parquet  \n")
    val expanded = FileList.flattenAndExpand(Seq(
      Seq(s"$d/region.parquet", s"$d/nation.parquet"), // nested list
      s"$d/c*.parquet",                                // * glob
      txt.toString,                                    // txt (holds a glob)
      s"$d/event?.parquet",                            // ? glob
      s"$d/lineitem.parquet"))                         // plain scalar
    expanded.map(p => Paths.get(p).getFileName.toString)
      .zipWithIndex.map { case (f, i) => (i, f) }.toDF("ord", "file")
  }

  /** q234 F3+F5+I3 job planning ([[graft.core.Jobs]]): sequence-arg
    * cross-product expansion (`gdalos_trans.py:62-70`), largest-first
    * ordering (`WHATDO.md:15`), `vp_slice` from/to/step
    * (`viewshed_calc.py:105-110`) and the backend input cap
    * (`:245-247`) — one pipeline, rank-stamped so the oracle can
    * replay the ordering with a window and the slice arithmetic with
    * a predicate. Sizes are collision-free by construction (dtm
    * weight 1, dsm weight 3 over {10,20,50}), so the sort is total.
    */
  def q234(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val jobs = Jobs.expand(Map(
      "res" -> Seq(10.0, 20.0, 50.0), "kind" -> Seq("dtm", "dsm"),
      "name" -> "j"))
    def sz(j: Map[String, Any]): Double =
      j("res").asInstanceOf[Double] * (if (j("kind") == "dsm") 3.0 else 1.0)
    val ranked = Jobs.orderBySize(jobs)(sz).zipWithIndex.map { case (j, i) =>
      (i, j("kind").toString, j("res").asInstanceOf[Double], sz(j),
        j("name").toString)
    }
    Jobs.capInputs(Jobs.slice(ranked, Some(1), Some(6), Some(2)), 2)
      .toDF("job_rank", "kind", "res", "size", "name")
  }

  /** q235 B5+G3+A10 write planning ([[graft.sources.Sinks
    * .applyWriteBandRule]] `gdalos_trans.py:437-459`,
    * [[graft.catalog.Catalog.dedupOvrPaths]] `gdalos_vrt.py:271-281`,
    * [[graft.sources.Sinks.infoSink]] `gdalos_trans.py:1220-1234`):
    * one (kind, item) table unioning (a) the catalog surviving
    * `.ovr`-parent de-dup — `p9.ovr` survives because `p9` is
    * absent; (b) per-band tile counts after the lossy-photo alpha
    * exclusion (band 4 dropped) and (c) with the rule OFF (band 4
    * kept); (d) structural gates parsed back out of a real `.info`
    * sidecar (field count from the schema tree, row count from the
    * stats block, plan presence).
    */
  def q235(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val cat = s.range(11).select(
      when(col("id") === 8, lit("p0.ovr"))
        .when(col("id") === 9, lit("p2.ovr"))
        .when(col("id") === 10, lit("p9.ovr"))
        .otherwise(concat(lit("p"), col("id"))).as("path"))
    val kept = Catalog.dedupOvrPaths(cat)
      .select(lit("path").as("kind"), col("path").as("item"))
    val tiles = s.range(16).select(
      ((col("id") % 4) + 1).cast("int").as("band"),
      (col("id") / 4).cast("int").as("px"), lit(0).as("py"),
      col("id").cast("double").as("v"))
    val lossy = Sinks.applyWriteBandRule(tiles, lossy = true, kindIsPhoto = true)
      .groupBy("band").agg(count(lit(1)).as("n"))
      .select(lit("band").as("kind"),
        concat(col("band"), lit("="), col("n")).as("item"))
    val noop = Sinks.applyWriteBandRule(tiles, lossy = false, kindIsPhoto = true)
      .filter(col("band") === 4)
      .groupBy("band").agg(count(lit(1)).as("n"))
      .select(lit("noop").as("kind"),
        concat(col("band"), lit("="), col("n")).as("item"))
    val infoPath = Paths.get(System.getProperty("java.io.tmpdir"),
      s"graft_q235_info_${ProcessHandle.current().pid()}").toString
    Sinks.infoSink(PixelFrame.dem(s, 16, 12), infoPath)
    val text = Files.readString(Paths.get(infoPath + ".info"))
    val fields = text.linesIterator.count(_.trim.startsWith("|--"))
    val countVal = "count,([0-9]+)".r.findFirstMatchIn(text)
      .map(_.group(1)).getOrElse("absent")
    val hasPlan = if (text.contains("Range")) 1 else 0
    val info = Seq(("info", s"fields=$fields"), ("info", s"count=$countVal"),
      ("info", s"plan=$hasPlan")).toDF("kind", "item")
    kept.unionByName(lossy).unionByName(noop).unionByName(info)
      .orderBy("kind", "item")
  }

  /** q236 A11+A12 sidecar sinks, round-tripped
    * ([[graft.sources.Sinks.rasterToJson]] `calc/gdal_to_json.py:5-21`,
    * [[graft.sources.Sinks.rasterToCzml]] `calc/gdal_to_czml.py:19-78`):
    * the 16×12 DEM goes out through BOTH text sinks and comes back as
    * rows inside the same plan — the JSON via `from_json` +
    * `posexplode` over the nested data array (plus a meta row gating
    * size/ndv), the CZML by decoding the embedded base64 PNG data URI
    * through the pure-JDK [[graft.sources.Png]] codec (gating the
    * full argb encode→PNG→decode path bit-for-bit). The oracle
    * regenerates the DEM and the argb packing closed-form.
    */
  def q236(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val ndv = PixelFrame.Dem.Ndv
    val small = PixelFrame.dem(s, 16, 12)
    val json = Sinks.rasterToJson(small, Array(100, 0.25, 0, 50, 0, -0.25), ndv)
    val schema = "size array<int>, gt array<double>, ndv double, " +
      "bands int, data array<array<array<double>>>"
    val j = s.range(1).select(from_json(lit(json), org.apache.spark.sql.types
      .StructType.fromDDL(schema)).as("j"))
    val jsonPixels = j
      .select(posexplode(col("j.data")).as(Seq("b", "rows2")))
      .select(col("b"), posexplode(col("rows2")).as(Seq("py", "rowv")))
      .select(col("b"), col("py"), posexplode(col("rowv")).as(Seq("px", "v")))
      .select(lit("json").as("src"), col("px").cast("int").as("px"),
        col("py").cast("int").as("py"), col("v").cast("long").as("val"))
    val meta = j.select(lit("meta").as("src"),
      col("j.size")(0).as("px"), col("j.size")(1).as("py"),
      col("j.ndv").cast("long").as("val"))
    val styled = small.select(col("px"), col("py"),
      when(col("v") === ndv, lit(0L)).otherwise(
        lit(-16777216L) + (col("v").cast("long") % 256) * 65536 +
          (col("px").cast("long") % 256) * 256 + (col("py").cast("long") % 256))
        .cast("int").as("argb"))
    val czml = Sinks.rasterToCzml(styled, "q236", (34.0, 31.0, 35.0, 32.0))
    val b64 = "base64,([A-Za-z0-9+/=]+)".r.findFirstMatchIn(czml).get.group(1)
    val (w, h, pix) = Png.decode(Base64.getDecoder.decode(b64))
    require(w == 16 && h == 12, s"CZML PNG came back ${w}x$h, expected 16x12")
    val czmlPixels = pix.toSeq.zipWithIndex.map { case (argb, i) =>
      ("czml", i % w, i / w, argb.toLong)
    }.toDF("src", "px", "py", "val")
    jsonPixels.unionByName(meta).unionByName(czmlPixels)
      .orderBy("src", "py", "px")
  }

  /** q237 H5 sampled extent transform
    * ([[graft.core.ExtentUtils.transformExtent]], `transform_extent`
    * `extent_utils_backport.py:21-47`): bbox of the densified
    * boundary under a nonlinear map chosen so the true extremes sit
    * at INTERIOR edge samples, not corners — max_x needs (30, 32) on
    * the right edge, max_y needs (20, 44) on the top edge, so a
    * corners-only implementation fails the gate by whole units. All
    * arithmetic is exact in binary (steps of 2.5/3, squares ≤ 144,
    * /512), so the cross-engine compare is hash-exact with no
    * rounding fence.
    */
  def q237(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val t = ExtentUtils.transformExtent(GeoRectangle(10, 20, 30, 44),
      (x, y) => (x - (y - 32) * (y - 32) / 512.0,
        y - (x - 20) * (x - 20) / 512.0),
      samples = 8)
    Seq((t.minX, t.minY, t.maxX, t.maxY))
      .toDF("min_x", "min_y", "max_x", "max_y")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q233_file_list" -> q233 _,
    "q234_job_plan" -> q234 _,
    "q235_write_plan" -> q235 _,
    "q236_sink_roundtrip" -> q236 _,
    "q237_extent_transform" -> q237 _,
  )

  val oracles: Map[String, String] = Map(
    "q233_file_list" ->
      """SELECT * FROM (VALUES
        |    (0, 'region.parquet'), (1, 'nation.parquet'),
        |    (2, 'customer.parquet'), (3, 'part.parquet'),
        |    (4, 'orders.parquet'), (5, 'events.parquet'),
        |    (6, 'lineitem.parquet')) t(ord, file)
        |ORDER BY ord""".stripMargin,

    "q234_job_plan" ->
      """WITH jobs AS (
        |  SELECT k.kind, CAST(r.res AS DOUBLE) AS res,
        |         CAST(r.res * CASE WHEN k.kind = 'dsm' THEN 3 ELSE 1 END
        |              AS DOUBLE) AS size
        |  FROM (VALUES ('dtm'), ('dsm')) k(kind)
        |  CROSS JOIN (VALUES (10.0), (20.0), (50.0)) r(res)),
        |ranked AS (
        |  SELECT CAST(ROW_NUMBER() OVER (ORDER BY size DESC) - 1 AS INTEGER)
        |           AS job_rank, kind, res, size
        |  FROM jobs)
        |SELECT job_rank, kind, res, size, 'j' AS name FROM ranked
        |WHERE job_rank >= 1 AND job_rank < 6 AND (job_rank - 1) % 2 = 0
        |ORDER BY job_rank LIMIT 2""".stripMargin,

    "q235_write_plan" ->
      """SELECT kind, item FROM (
        |  SELECT 'path' AS kind, 'p' || CAST(i AS VARCHAR) AS item
        |  FROM range(8) t(i)
        |  UNION ALL SELECT 'path', 'p9.ovr'
        |  UNION ALL SELECT 'band', CAST(b AS VARCHAR) || '=4'
        |            FROM range(1, 4) u(b)
        |  UNION ALL SELECT 'noop', '4=4'
        |  UNION ALL SELECT 'info', 'fields=5'
        |  UNION ALL SELECT 'info', 'count=192'
        |  UNION ALL SELECT 'info', 'plan=1'
        |) ORDER BY kind, item""".stripMargin,

    "q236_sink_roundtrip" ->
      """WITH g AS (
        |  SELECT CAST(i % 16 AS INTEGER) AS px, CAST(i // 16 AS INTEGER) AS py,
        |         CASE WHEN ((i % 16) * 31 + (i // 16) * 17) % 101 = 0
        |              THEN -32768.0
        |              ELSE CAST(((i % 16) * 7 + (i // 16) * 13) % 997 AS DOUBLE)
        |         END AS v
        |  FROM range(192) t(i))
        |SELECT src, px, py, val FROM (
        |  SELECT 'czml' AS src, px, py,
        |         CASE WHEN v = -32768.0 THEN 0
        |              ELSE -16777216 + (CAST(v AS BIGINT) % 256) * 65536
        |                   + (px % 256) * 256 + (py % 256) END AS val
        |  FROM g
        |  UNION ALL SELECT 'json', px, py, CAST(v AS BIGINT) FROM g
        |  UNION ALL SELECT 'meta', 16, 12, -32768
        |) ORDER BY src, py, px""".stripMargin,

    "q237_extent_transform" ->
      """WITH xs AS (SELECT 10 + 20 * i / 8.0 AS x FROM range(9) t(i)),
        |ys AS (SELECT 20 + 24 * j / 8.0 AS y FROM range(9) t(j)),
        |pts AS (
        |  SELECT x, 20.0 AS y FROM xs
        |  UNION ALL SELECT x, 44.0 FROM xs
        |  UNION ALL SELECT 10.0, y FROM ys
        |  UNION ALL SELECT 30.0, y FROM ys),
        |tr AS (SELECT x - (y - 32) * (y - 32) / 512.0 AS tx,
        |              y - (x - 20) * (x - 20) / 512.0 AS ty FROM pts)
        |SELECT MIN(tx) AS min_x, MIN(ty) AS min_y,
        |       MAX(tx) AS max_x, MAX(ty) AS max_y
        |FROM tr""".stripMargin,
  )
}
