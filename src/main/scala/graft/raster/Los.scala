package graft.raster

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Radio

/** E3 line-of-sight profile walk (reference `los_calc`,
  * `viewshed_calc.py:636-968`): sample the DEM along each
  * observer→target segment at fixed spacing, find obstructions with a
  * running max of elevation ratio, emit per-pair visibility + path
  * loss (H3).
  *
  * Spark shape (SURVEY §3.3): pairs → `posexplode` stations → probe
  * join against the pixel frame on the computed (px,py) key (A9/C7 —
  * an equi-join, never a theta join) → window running-max per pair →
  * per-pair aggregate. Everything is one shuffle for the join (the
  * DEM side is joined on its native key) plus one for the window,
  * both on keys that scale with |pairs|·stations, independent of
  * raster size.
  *
  * Geometry is in pixel space: observer/target coordinates are
  * fractional pixel positions, `cellSize` converts to meters.
  * Obstruction test compares slope ratios (Δh_corrected / dist) —
  * monotone in elevation angle, so no `atan` is needed. Earth
  * curvature: `height_correction` (`refraction_coeff.py:40-43`).
  */
object Los {

  /** Per-station profile: pairs (pair_id, ox, oy, oz, tx, ty, tz,
    * freq_mhz) × n stations, joined to the DEM pixel frame. Output one
    * row per (pair, station) with terrain height, corrected sight
    * ratio, and the running obstruction max over *preceding* stations.
    */
  def profile(pairs: DataFrame, dem: DataFrame, nStations: Int,
              cellSize: Double, refractionCoeff: Double = Radio.AtmosphericRefractionCoeff,
              demNdv: Double = PixelFrame.Dem.Ndv): DataFrame = {
    val n = nStations
    require(n >= 2, "need at least 2 stations (observer + target)")

    val stations = pairs
      .select(col("*"), posexplode(sequence(lit(0), lit(n - 1))).as(Seq("t", "_drop")))
      .drop("_drop")
      .withColumn("frac", col("t").cast("double") / (n - 1))
      .withColumn("fx", col("ox") + (col("tx") - col("ox")) * col("frac"))
      .withColumn("fy", col("oy") + (col("ty") - col("oy")) * col("frac"))
      .withColumn("spx", floor(col("fx") + 0.5).cast("int"))
      .withColumn("spy", floor(col("fy") + 0.5).cast("int"))

    // A9/C7 point-probe: equi-join on the quantized pixel key. Off-grid
    // or nodata stations read as ground level 0 (st_nodtm handling).
    val demV = dem.select(col("px"), col("py"), col("v").as("h_raw"))
    val probed = stations
      .join(demV, stations("spx") === demV("px") && stations("spy") === demV("py"), "left")
      .drop("px", "py")
      .withColumn("h", when(col("h_raw").isNull || col("h_raw") === demNdv, lit(0.0))
        .otherwise(col("h_raw")))

    val totalDist = sqrt(pow(col("tx") - col("ox"), 2) + pow(col("ty") - col("oy"), 2)) * cellSize
    val cc = 1.0 - refractionCoeff
    val byPair = Window.partitionBy("pair_id").orderBy("t")

    probed
      .withColumn("dist", totalDist * col("frac"))
      // curvature drop −(1−rc)·d²/diam (refraction_coeff.py:40-43)
      .withColumn("hc", lit(-cc) * col("dist") * col("dist") / lit(2 * Radio.SphereRadius))
      // observer absolute height = ground at t=0 + mast height oz
      .withColumn("ozAbs", first(col("h")).over(byPair) + col("oz"))
      // sight ratio of the station's terrain (intermediate obstruction)
      .withColumn("ratio",
        when(col("t") === 0, lit(null))
          .otherwise((col("h") + col("hc") - col("ozAbs")) / col("dist")))
      // ratio of the target point itself (terrain + target mast tz)
      .withColumn("targetRatio",
        when(col("t") === 0, lit(null))
          .otherwise((col("h") + col("tz") + col("hc") - col("ozAbs")) / col("dist")))
      // running max of obstruction over strictly-preceding stations
      .withColumn("obstruction",
        max(when(col("t") > 0 && col("t") < n - 1, col("ratio")))
          .over(byPair.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("stationVisible",
        col("t") > 0 && col("targetRatio") >= coalesce(col("obstruction"), lit(-1e300)))
  }

  /** Per-pair LOS summary: visibility of the target, the first
    * blocking station, total distance and FSPL (H3,
    * `viewshed_calc.py:627-633`).
    */
  def summary(pairs: DataFrame, dem: DataFrame, nStations: Int,
              cellSize: Double, refractionCoeff: Double = Radio.AtmosphericRefractionCoeff,
              demNdv: Double = PixelFrame.Dem.Ndv): DataFrame = {
    val prof = profile(pairs, dem, nStations, cellSize, refractionCoeff, demNdv)
    prof.groupBy("pair_id")
      .agg(
        max(when(col("t") === nStations - 1,
          col("stationVisible").cast("int"))).as("visible"),
        min(when(col("t") > 0 && !col("stationVisible"), col("t"))).as("first_blocked_t"),
        max(col("dist")).as("dist"),
        max(col("freq_mhz")).as("freq_mhz"))
      .withColumn("fspl",
        lit(20.0) * (log10(col("dist")) + log10(col("freq_mhz"))) - 27.55)
  }

  /** The extended LOS output table — the remaining `RadioCalcType`
    * result columns (`radio_params.py:10-37`) the reference's
    * los_calc can emit beyond visible/fspl: absolute observer/target
    * heights (`oz_abs`/`tz_abs`), elevation angle observer→target
    * (`ElevationAngleCalc`), distance to the first obstruction
    * (`LOSRange`; full distance when unblocked), minimum vertical
    * clearance between the sight line and terrain over interior
    * stations (`Clearance`; negative when blocked), and
    * `PowerReminder` = power_diff − path_loss. All pure column math
    * over the same single profile walk — one extra full-frame window
    * value (the target's absolute height) and the same one aggregation.
    */
  /** The profile walk plus direct-sight-line geometry: target absolute
    * height (full-frame window), interpolated line height per station,
    * and the vertical `gap` between line and corrected terrain — the
    * shared base of [[summaryExtended]] and [[summaryDiffraction]].
    */
  private def profileWithLine(pairs: DataFrame, dem: DataFrame, nStations: Int,
                              cellSize: Double, refractionCoeff: Double,
                              demNdv: Double): DataFrame = {
    val prof = profile(pairs, dem, nStations, cellSize, refractionCoeff, demNdv)
    val byPair = Window.partitionBy("pair_id").orderBy("t")
    val full = byPair.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    prof
      .withColumn("tzAbsEnd", last(col("h") + col("tz") + col("hc")).over(full))
      .withColumn("lineH", col("ozAbs") + (col("tzAbsEnd") - col("ozAbs")) * col("frac"))
      .withColumn("gap", col("lineH") - (col("h") + col("hc")))
  }

  def summaryExtended(pairs: DataFrame, dem: DataFrame, nStations: Int,
                      cellSize: Double,
                      powerDiff: Column = lit(150.0),
                      refractionCoeff: Double = Radio.AtmosphericRefractionCoeff,
                      demNdv: Double = PixelFrame.Dem.Ndv): DataFrame = {
    val n = nStations
    val withLine = profileWithLine(pairs, dem, nStations, cellSize, refractionCoeff, demNdv)
    withLine.groupBy("pair_id")
      .agg(
        max(when(col("t") === n - 1, col("stationVisible").cast("int"))).as("visible"),
        min(when(col("t") > 0 && !col("stationVisible"), col("dist"))).as("blocked_dist"),
        max(col("dist")).as("dist"),
        max(col("freq_mhz")).as("freq_mhz"),
        max(col("ozAbs")).as("oz_abs"),
        max(when(col("t") === n - 1, col("tzAbsEnd"))).as("tz_abs"),
        min(when(col("t") > 0 && col("t") < n - 1, col("gap"))).as("clearance"))
      .withColumn("fspl",
        lit(20.0) * (log10(col("dist")) + log10(col("freq_mhz"))) - 27.55)
      .withColumn("elev_angle_deg",
        degrees(atan2(col("tz_abs") - col("oz_abs"), col("dist"))))
      .withColumn("los_range", coalesce(col("blocked_dist"), col("dist")))
      .withColumn("power_reminder", powerDiff - col("fspl"))
      .drop("blocked_dist")
  }

  /** ITU-R P.526 §4.1 single knife-edge diffraction loss layered on the
    * same profile walk — the published-public propagation step toward
    * the reference's external rfmodel/tirem backend
    * (`viewshed_calc.py:792-806` imports a proprietary package that is
    * not in the reference repo; FSPL + knife-edge is the standard open
    * alternative). Per interior station the dimensionless knife-edge
    * parameter is
    *   ν = h·√(2/λ · (1/d₁ + 1/d₂))
    * with h = obstruction height above the direct sight line (−gap
    * from [[profileWithLine]]), d₁/d₂ distances to observer/target and
    * λ = c/f. The dominant (max-ν) edge gives P.526's approximation
    *   J(ν) = 6.9 + 20·log₁₀(√((ν−0.1)² + 1) + ν − 0.1)  for ν > −0.78
    * (0 dB below), and total path loss = FSPL + J(ν). Pure column math
    * over the single walk: one extra per-station expression and the
    * same one aggregation — no new shuffle beyond [[summaryExtended]].
    */
  def summaryDiffraction(pairs: DataFrame, dem: DataFrame, nStations: Int,
                         cellSize: Double,
                         refractionCoeff: Double = Radio.AtmosphericRefractionCoeff,
                         demNdv: Double = PixelFrame.Dem.Ndv): DataFrame = {
    val n = nStations
    val withLine = profileWithLine(pairs, dem, nStations, cellSize, refractionCoeff, demNdv)
    // total path length recomputed from the pair endpoints (the same
    // algebra `profile` uses), so d₂ = td − dist needs no extra window
    val td = sqrt(pow(col("tx") - col("ox"), 2) + pow(col("ty") - col("oy"), 2)) * cellSize
    val lambdaM = lit(Radio.SpeedOfLightMhzM) / col("freq_mhz")
    val nu = when(col("t") > 0 && col("t") < n - 1,
      (-col("gap")) * sqrt(lit(2.0) / lambdaM *
        (lit(1.0) / col("dist") + lit(1.0) / (td - col("dist")))))
    withLine
      .withColumn("nu", nu)
      .groupBy("pair_id")
      .agg(
        max(when(col("t") === n - 1, col("stationVisible").cast("int"))).as("visible"),
        max(col("dist")).as("dist"),
        max(col("freq_mhz")).as("freq_mhz"),
        max(col("nu")).as("nu_max"))
      .withColumn("fspl",
        lit(20.0) * (log10(col("dist")) + log10(col("freq_mhz"))) - 27.55)
      .withColumn("j_loss",
        when(col("nu_max") > -0.78,
          lit(6.9) + lit(20.0) * log10(
            sqrt((col("nu_max") - 0.1) * (col("nu_max") - 0.1) + 1.0)
              + col("nu_max") - 0.1))
          .otherwise(lit(0.0)))
      .withColumn("path_loss", col("fspl") + col("j_loss"))
  }

  /** Okumura-Hata median path-loss columns — the column twins of
    * [[graft.core.Radio.hataUrban]]/Suburban/Open (same expression
    * associations, so values are bit-equal to the scalar forms).
    * Terrain-free: loss from frequency (MHz), ground distance (km)
    * and the two antenna heights (m) — pure per-row math, no shuffle.
    */
  def hataCols(freqMhz: Column, distKm: Column,
               hb: Column, hm: Column): Map[String, Column] = {
    val lf = log10(freqMhz)
    val aHm = (lit(1.1) * lf - 0.7) * hm - (lit(1.56) * lf - 0.8)
    val urban = lit(69.55) + lit(26.16) * lf - lit(13.82) * log10(hb) - aHm +
      (lit(44.9) - lit(6.55) * log10(hb)) * log10(distKm)
    Map(
      "hata_urban" -> urban,
      "hata_suburban" ->
        (urban - lit(2.0) * pow(log10(freqMhz / 28.0), 2) - 5.4),
      "hata_open" ->
        (urban - lit(4.78) * pow(lf, 2) + lit(18.33) * lf - 40.94))
  }

  /** E4 forward target computation (`MultiPointParams.calc_fwd`,
    * `viewshed_params.py:204-228`): targets from observer +
    * azimuth/elevation/range with the earth-curvature term —
    * vectorized trig as pure column expressions.
    *
    * a = (90−az)·π/180; e = el·π/180; ground_r = r·cos e;
    * tx = ox + cos a·ground_r; ty = oy + sin a·ground_r;
    * tz = abs_oz + r·sin e + ground_r²·(1−rc)/diam.
    */
  def fwdTargets(df: DataFrame,
                 refractionCoeff: Double = Radio.AtmosphericRefractionCoeff): DataFrame = {
    val curv = (1.0 - refractionCoeff) / (2 * Radio.SphereRadius)
    df.withColumn("a_rad", (lit(90.0) - col("azimuth")) * math.Pi / 180)
      .withColumn("e_rad", col("elevation") * math.Pi / 180)
      .withColumn("ground_r", col("max_r") * cos(col("e_rad")))
      .withColumn("tx", col("ox") + cos(col("a_rad")) * col("ground_r"))
      .withColumn("ty", col("oy") + sin(col("a_rad")) * col("ground_r"))
      .withColumn("tz", col("oz") + col("max_r") * sin(col("e_rad"))
        + col("ground_r") * col("ground_r") * curv)
      .drop("a_rad", "e_rad")
  }

  /** C6 observer×target pairing (`make_points_list`,
    * `gdalos_base.py:117-133`): zip (by index), zip_cycle (modular
    * recycle of the shorter side), or product (cartesian).
    */
  def pairPoints(obs: DataFrame, tars: DataFrame, mode: String): DataFrame = mode match {
    case "zip" =>
      obs.join(tars, obs("oi") === tars("ti"))
    case "zip_cycle" =>
      // cycle the shorter vector (modular index), like zip_cycle.
      // The two counts are driver-side planner metadata over the tiny
      // parameter vectors (LOSParams observers/targets), not data-path
      // actions — each runs once here, at plan-build time.
      val no = obs.count(); val nt = tars.count()
      if (no >= nt) obs.join(tars, obs("oi") % nt === tars("ti"))
      else obs.join(tars, tars("ti") % no === obs("oi"))
    case "product" =>
      obs.crossJoin(tars)
    case other => throw new IllegalArgumentException(s"unknown fill mode $other")
  }

  /** Deterministic synthetic observer→target pairs over a w×h DEM —
    * fixture generator for the declared LOS queries/tests.
    */
  def syntheticPairs(s: SparkSession, nPairs: Int, w: Int, h: Int): DataFrame =
    s.range(nPairs).select(
      col("id").cast("int").as("pair_id"),
      (col("id") % 7 * 3 + 5).cast("double").as("ox"),
      (col("id") % 11 * 4 + 6).cast("double").as("oy"),
      lit(10.0).as("oz"),
      (lit(w - 8) - col("id") % 5 * 6).cast("double").as("tx"),
      (lit(h - 9) - col("id") % 9 * 4).cast("double").as("ty"),
      lit(5.0).as("tz"),
      (col("id") % 4 * 300 + 100).cast("double").as("freq_mhz"))
}
