package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** H7 string/path and H8 JSON-reshaping probes (promised in SURVEY §2
  * and previously missing), plus the batch twin of the streaming
  * tumbling-window aggregate (§2 J extension).
  */
object EventQueries {

  /** q53 H8: parse `events.props` JSON and aggregate per event type. */
  def q53(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("k").cast("long")).as("sum_k"),
        min("k").as("min_k"), max("k").as("max_k"))
      .orderBy("event_type")

  /** q54 H7: suffix-accretion path synthesis + regex zone extraction
    * (the gdalos naming scheme, `gdalos_trans.py:658-738` /
    * `gdalos_selector.py:15`).
    */
  def q54(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d)
      .withColumn("path", concat(lit("srtm_w84u"),
        lpad((col("s_suppkey") % 60 + 1).cast("string"), 2, "0"),
        lit("_x"), col("s_suppkey").cast("string"), lit(".cog.tif")))
      .withColumn("zone", regexp_extract(col("path"), "w84u([0-9]+)", 1).cast("int"))
      .withColumn("ext", regexp_extract(col("path"), "\\.([a-z]+)$", 1))
      .withColumn("stem", regexp_replace(col("path"), "\\.cog\\.tif$", ""))
      .select("s_suppkey", "path", "zone", "ext", "stem")
      .orderBy("s_suppkey")

  /** q55 J: tumbling 1-hour event counts — the batch equivalent of
    * [[graft.streaming.EventStream.tumblingCounts]]; hour keyed as
    * epoch-hours so the oracle compares integers, not timestamps.
    */
  def q55(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .withColumn("hour", floor(unix_timestamp(col("ts")) / 3600).cast("long"))
      .groupBy("hour", "event_type")
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("hour", "event_type")

  /** q71 as-of join: each click annotated with the user's most recent
    * error at-or-before it (backward-inclusive). Times compared as
    * epoch micros so both engines stringify identically; the oracle
    * is DuckDB's native ASOF LEFT JOIN.
    */
  def q71(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).withColumn("t_us", expr("unix_micros(ts)"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("event_id").as("click_id"), col("t_us").as("click_us"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("t_us").as("err_us"), col("value").as("err_value"))
    Temporal.asofJoinBackward(clicks, errors, Seq("user_id"), "click_us", "err_us")
      .select("click_id", "user_id", "click_us", "err_id", "err_us", "err_value")
      .orderBy("click_id")
  }

  /** q72 range join: per error, aggregate the user's non-error events
    * inside the 10-minute incident window [err, err + 10 min) —
    * bucketed equi-join, exact-decimal value sums.
    */
  def q72(s: SparkSession, d: String): DataFrame = {
    val winUs = 600000000L // 10 minutes in epoch micros
    val ev = Tables.events(s, d).withColumn("t_us", expr("unix_micros(ts)"))
    val intervals = ev.filter(col("event_type") === "error")
      .select(col("user_id"), col("event_id").as("err_id"),
        col("t_us").as("s_us"), (col("t_us") + winUs).as("e_us"))
    val points = ev.filter(col("event_type") =!= "error")
      .select(col("user_id"), col("event_id").as("ev_id"), col("t_us"), col("value"))
    Temporal.rangeJoin(points, intervals, Seq("user_id"),
        "t_us", "s_us", "e_us", bucketWidth = winUs)
      .groupBy("err_id")
      .agg(count(lit(1)).as("n_in_window"),
        sum(col("value").cast(DecimalType(18, 2))).cast("double").as("sum_value"))
      .orderBy("err_id")
  }

  /** q74 J: per-user session windows (30-min gap) — the batch twin of
    * [[graft.streaming.EventStream.sessionAgg]]; session start keyed
    * as epoch micros, value sums exact-decimal. The oracle recomputes
    * the identical sessions with gaps-and-islands SQL (break when
    * gap ≥ 30 min, matching Spark's half-open session windows).
    */
  def q74(s: SparkSession, d: String): DataFrame =
    graft.streaming.EventStream.sessionAgg(Tables.events(s, d).select("user_id", "ts",
        "value"))
      .select(col("user_id"), expr("unix_micros(session_start)").as("s_us"),
        col("n"),
        col("sum_value"))
      .orderBy("user_id", "s_us")

  /** q92 J: click→view attribution — the batch twin of the
    * watermarked stream-stream interval join
    * [[graft.streaming.EventStream.attributionJoin]] (each click
    * pairs with the same user's views in the 10 minutes before it,
    * inclusive). Gap reported in epoch micros; the oracle replays the
    * identical inequality join.
    */
  def q92(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    graft.streaming.EventStream.attributionJoin(
        ev.filter(col("event_type") === "click"),
        ev.filter(col("event_type") === "view"))
      .orderBy("click_id", "view_id")
  }

  /** q163 ordered funnel ([[Temporal.funnel]]): view → click →
    * purchase per user, each stage strictly after the previous
    * stage's completion and within a re-armed 1-hour window; report
    * is per-stage survivor counts + conversion vs head and previous.
    * Oracle replays the per-stage MIN chain and both rates.
    */
  def q163(s: SparkSession, d: String): DataFrame =
    Temporal.funnel(
        Tables.events(s, d).withColumn("t_us", expr("unix_micros(ts)")),
        "user_id", "t_us", "event_type",
        Seq("view", "click", "purchase"), windowUs = 3600000000L)
      .orderBy("stage_idx")

  /** q164 retention cohorts ([[Temporal.retentionCohorts]]): users
    * cohorted by first-seen DAY, day-offset retention matrix out to
    * +7 — active counts, cohort sizes, rates. Oracle replays the
    * bucket floor, first-seen MIN, the (user, day) distinct and both
    * aggregations.
    */
  def q164(s: SparkSession, d: String): DataFrame =
    Temporal.retentionCohorts(
        Tables.events(s, d).withColumn("t_us", expr("unix_micros(ts)")),
        "user_id", "t_us", bucketUs = 86400000000L, maxOffset = 7)
      .orderBy("cohort", "offset")

  /** q167 burst cells ([[Temporal.burstCells]]): per event type and
    * hour, event counts vs the mean of the 6 full preceding hours
    * (dense cell axis — silent hours count as zero), bursts at
    * ratio ≥ 2. Oracle replays the dense axis, the trailing window
    * and the exact-count ratio.
    */
  def q167(s: SparkSession, d: String): DataFrame =
    Temporal.burstCells(
        Tables.events(s, d).withColumn("t_us", expr("unix_micros(ts)")),
        "event_type", "t_us", cellUs = 3600000000L, trail = 6,
        threshold = 2.0)
      .orderBy("k", "c")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q53_events_json" -> q53 _,
    "q54_string_paths" -> q54 _,
    "q55_events_hourly" -> q55 _,
    "q71_asof_join" -> q71 _,
    "q72_range_join" -> q72 _,
    "q74_session_windows" -> q74 _,
    "q92_attrib_join" -> q92 _,
    "q163_event_funnel" -> q163 _,
    "q164_retention_cohorts" -> q164 _,
    "q167_burst_cells" -> q167 _,
  )

  val oracles: Map[String, String] = Map(
    "q53_events_json" ->
      """SELECT event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        |       MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS min_k,
        |       MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q54_string_paths" ->
      """WITH p AS (
        |  SELECT s_suppkey,
        |         'srtm_w84u' || lpad(CAST(s_suppkey % 60 + 1 AS VARCHAR), 2, '0')
        |           || '_x' || CAST(s_suppkey AS VARCHAR) || '.cog.tif' AS path
        |  FROM supplier)
        |SELECT s_suppkey, path,
        |       CAST(regexp_extract(path, 'w84u([0-9]+)', 1) AS INTEGER) AS zone,
        |       regexp_extract(path, '\.([a-z]+)$', 1) AS ext,
        |       regexp_replace(path, '\.cog\.tif$', '') AS stem
        |FROM p ORDER BY s_suppkey""".stripMargin,

    "q55_events_hourly" ->
      """SELECT CAST(FLOOR(epoch(ts) / 3600) AS BIGINT) AS hour, event_type, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin,

    "q71_asof_join" ->
      """WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS click_us
        |  FROM events WHERE event_type = 'click'),
        |e AS (
        |  SELECT user_id, event_id AS err_id, epoch_us(ts) AS err_us, value AS err_value
        |  FROM events WHERE event_type = 'error')
        |SELECT c.click_id, c.user_id, c.click_us, e.err_id, e.err_us, e.err_value
        |FROM c ASOF LEFT JOIN e
        |  ON c.user_id = e.user_id AND c.click_us >= e.err_us
        |ORDER BY click_id""".stripMargin,

    "q74_session_windows" ->
      """WITH e AS (SELECT user_id, epoch_us(ts) AS t, value FROM events),
        |l AS (SELECT *, LAG(t) OVER (PARTITION BY user_id ORDER BY t) AS pt FROM e),
        |f AS (SELECT *, CASE WHEN pt IS NULL OR t - pt >= 1800000000 THEN 1 ELSE 0 END AS brk FROM l),
        |s AS (SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY t
        |                               ROWS UNBOUNDED PRECEDING) AS sid FROM f)
        |SELECT user_id, MIN(t) AS s_us, COUNT(*) AS n,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM s GROUP BY user_id, sid ORDER BY user_id, s_us""".stripMargin,

    "q72_range_join" ->
      """WITH e AS (
        |  SELECT user_id, event_id AS err_id, epoch_us(ts) AS s_us,
        |         epoch_us(ts) + 600000000 AS e_us
        |  FROM events WHERE event_type = 'error'),
        |p AS (
        |  SELECT user_id, epoch_us(ts) AS t_us, value
        |  FROM events WHERE event_type <> 'error')
        |SELECT e.err_id, COUNT(*) AS n_in_window,
        |       CAST(SUM(CAST(p.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM p JOIN e ON p.user_id = e.user_id
        |  AND p.t_us >= e.s_us AND p.t_us < e.e_us
        |GROUP BY e.err_id ORDER BY err_id""".stripMargin,

    "q167_burst_cells" ->
      """WITH e AS (
        |  SELECT event_type AS k,
        |         (epoch_us(ts) - ((epoch_us(ts) % 3600000000) + 3600000000) % 3600000000) // 3600000000 AS c
        |  FROM events),
        |hist AS (SELECT k, c, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY k, c),
        |span AS (SELECT MIN(c) AS c0, MAX(c) AS c1 FROM hist),
        |dense AS (
        |  SELECT ks.k, g.c, COALESCE(h.n, 0) AS n
        |  FROM (SELECT DISTINCT k FROM hist) ks
        |  CROSS JOIN (SELECT unnest(range(c0, c1 + 1)) AS c FROM span) g
        |  LEFT JOIN hist h ON h.k = ks.k AND h.c = g.c),
        |t AS (
        |  SELECT k, c, n,
        |         COUNT(*) OVER (PARTITION BY k ORDER BY c
        |           ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING) AS tn,
        |         COALESCE(SUM(n) OVER (PARTITION BY k ORDER BY c
        |           ROWS BETWEEN 6 PRECEDING AND 1 PRECEDING), 0) AS tsum
        |  FROM dense)
        |SELECT k, c, CAST(n AS BIGINT) AS n,
        |       CASE WHEN tn = 6 THEN CAST(tsum AS DOUBLE) / 6 END AS trail_mean,
        |       CASE WHEN tn = 6 AND tsum > 0
        |            THEN CAST(n AS DOUBLE) / (CAST(tsum AS DOUBLE) / 6) END AS ratio,
        |       COALESCE((CASE WHEN tn = 6 AND tsum > 0
        |            THEN CAST(n AS DOUBLE) / (CAST(tsum AS DOUBLE) / 6) END) >= 2.0,
        |          FALSE) AS burst
        |FROM t ORDER BY k, c""".stripMargin,

    "q164_retention_cohorts" ->
      """WITH e AS (
        |  SELECT user_id AS u,
        |         (epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000) // 86400000000 AS b
        |  FROM events),
        |first AS (SELECT u, MIN(b) AS cohort FROM e GROUP BY u),
        |sizes AS (SELECT cohort, COUNT(*) AS cohort_n FROM first GROUP BY cohort),
        |act AS (SELECT DISTINCT u, b FROM e)
        |SELECT f.cohort, CAST(a.b - f.cohort AS INTEGER) AS "offset",
        |       CAST(COUNT(*) AS BIGINT) AS n_active,
        |       CAST(s.cohort_n AS BIGINT) AS cohort_n,
        |       CAST(COUNT(*) AS DOUBLE) / s.cohort_n AS retention
        |FROM act a JOIN first f ON a.u = f.u JOIN sizes s ON s.cohort = f.cohort
        |WHERE a.b - f.cohort <= 7
        |GROUP BY f.cohort, a.b - f.cohort, s.cohort_n
        |ORDER BY f.cohort, "offset"""".stripMargin,

    "q163_event_funnel" ->
      """WITH e AS (SELECT user_id AS u, epoch_us(ts) AS t, event_type AS st FROM events),
        |s1 AS (SELECT u, MIN(t) AS t FROM e WHERE st = 'view' GROUP BY u),
        |s2 AS (SELECT e.u, MIN(e.t) AS t FROM e JOIN s1 ON e.u = s1.u
        |       WHERE e.st = 'click' AND e.t > s1.t AND e.t <= s1.t + 3600000000 GROUP BY e.u),
        |s3 AS (SELECT e.u, MIN(e.t) AS t FROM e JOIN s2 ON e.u = s2.u
        |       WHERE e.st = 'purchase' AND e.t > s2.t AND e.t <= s2.t + 3600000000 GROUP BY e.u),
        |c AS (
        |  SELECT 1 AS stage_idx, 'view' AS stage, (SELECT COUNT(*) FROM s1) AS n
        |  UNION ALL SELECT 2, 'click', (SELECT COUNT(*) FROM s2)
        |  UNION ALL SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3))
        |SELECT stage_idx, stage, CAST(n AS BIGINT) AS n_users,
        |  CASE WHEN FIRST_VALUE(n) OVER (ORDER BY stage_idx
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) = 0 THEN 0.0
        |       ELSE CAST(n AS DOUBLE) / FIRST_VALUE(n) OVER (ORDER BY stage_idx
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) END AS conv_from_head,
        |  CASE WHEN COALESCE(LAG(n) OVER (ORDER BY stage_idx), n) = 0 THEN 0.0
        |       ELSE CAST(n AS DOUBLE) / COALESCE(LAG(n) OVER (ORDER BY stage_idx), n)
        |       END AS conv_from_prev
        |FROM c ORDER BY stage_idx""".stripMargin,

    "q92_attrib_join" ->
"""WITH c AS (
        |  SELECT user_id, event_id AS click_id, epoch_us(ts) AS c_us
        |  FROM events WHERE event_type = 'click'),
        |v AS (
        |  SELECT user_id, event_id AS view_id, epoch_us(ts) AS v_us
        |  FROM events WHERE event_type = 'view')
        |SELECT c.user_id, c.click_id, v.view_id, c.c_us - v.v_us AS gap_us
        |FROM c JOIN v ON c.user_id = v.user_id
        |  AND v.v_us <= c.c_us AND v.v_us >= c.c_us - 600000000
        |ORDER BY click_id, view_id""".stripMargin,
  )
}
