package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured-Streaming extension over the `events` table (SURVEY §2 J:
  * the reference is batch-only; the streaming surface shares the
  * D-family aggregate code).
  *
  * Design: `readStream` → event-time watermark → tumbling-window aggs;
  * custom state via `mapGroupsWithState` for sessionization. The same
  * transforms run in batch (EventQueries.q55 is the batch twin of
  * [[tumblingCounts]]) — one definition, two runners, which is the
  * Spark-native replacement for the reference's job-at-a-time
  * recursion.
  */
object EventStream {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)

  final case class SessionSummary(user_id: Long, n_events: Long, total_value: Double)

  /** Tumbling event-time window counts; works identically on a batch
    * or streaming DataFrame (watermark only applies when streaming).
    */
  def tumblingCounts(events: DataFrame, every: String = "1 hour",
                     watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    src.groupBy(window(col("ts"), every), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("sum_value"))
  }

  /** Per-user running session state via `mapGroupsWithState` — the
    * KeyValueGroupedDataset state-store surface (processing-time
    * timeout; emits the running totals on every trigger).
    */
  def userTotals(events: Dataset[Event])(implicit s: SparkSession): Dataset[SessionSummary] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .mapGroupsWithState[SessionSummary, SessionSummary](GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionSummary]) =>
          val prev = state.getOption.getOrElse(SessionSummary(userId, 0L, 0.0))
          val batch = rows.toSeq
          val next = SessionSummary(userId,
            prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          next
      }
  }

  /** Append-mode alerting via `flatMapGroupsWithState`: emit one row
    * per user the first time their running value total crosses
    * `threshold` — the generator-style stateful surface (0..n outputs
    * per group per trigger), complementing [[userTotals]]'s 1-per-group
    * `mapGroupsWithState`.
    */
  def thresholdAlerts(events: Dataset[Event], threshold: Double)
                     (implicit s: SparkSession): Dataset[SessionSummary] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionSummary, SessionSummary](
        OutputMode.Append(), GroupStateTimeout.NoTimeout) {
        (userId: Long, rows: Iterator[Event], state: GroupState[SessionSummary]) =>
          val prev = state.getOption.getOrElse(SessionSummary(userId, 0L, 0.0))
          val batch = rows.toSeq
          val next = SessionSummary(userId,
            prev.n_events + batch.size,
            prev.total_value + batch.map(_.value).sum)
          state.update(next)
          if (prev.total_value < threshold && next.total_value >= threshold)
            Iterator.single(next)
          else Iterator.empty
      }
  }

  /** Event-time session windows via the built-in `session_window`
    * (dynamic-gap windows merged by the engine — the declarative
    * replacement for hand-rolled gaps-and-islands): one session per
    * maximal run of per-user events with inter-event gap < `gap`
    * (half-open — an event exactly `gap` after the last starts a new
    * session). Works identically on batch and streaming frames; when
    * streaming, the watermark bounds session state so closed sessions
    * emit and evict (append mode).
    */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
                 watermark: String = "2 hours"): DataFrame = {
    val src = if (events.isStreaming) events.withWatermark("ts", watermark) else events
    // decimal-exact sum: order-independent across partitionings and
    // engines (the float sum would drift with aggregation order)
    src.groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 2)))
          .cast("double").as("sum_value"))
      .select(col("user_id"), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"), col("n"), col("sum_value"))
  }

  /** Streaming exact dedup — the streaming face of the LLM-pipeline
    * exact-dedup family (`llm/Dedup.exactDedup` is the batch twin):
    * documents are keyed by content hash (md5 of the dedup column)
    * and deduplicated ACROSS micro-batches with watermark-bounded
    * state (`dropDuplicatesWithinWatermark`), so the state store
    * holds one key per distinct document seen within the watermark
    * horizon instead of growing forever. On a batch frame it
    * degrades to a plain exact dedup (same output contract).
    */
  def streamingDedup(docs: DataFrame, textCol: String, tsCol: String,
                     watermark: String = "1 hour"): DataFrame = {
    val keyed = docs.withColumn("content_key", md5(col(textCol)))
    if (keyed.isStreaming)
      keyed.withWatermark(tsCol, watermark)
        .dropDuplicatesWithinWatermark("content_key")
    else keyed.dropDuplicates("content_key")
  }

  /** Watermarked stream-stream interval join (click attribution): each
    * click pairs with the same user's views inside the `lookback`
    * window ending at the click (inclusive). The canonical
    * stream-stream join shape: BOTH sides carry event-time watermarks
    * and the join predicate bounds view time relative to click time,
    * so the state store holds only rows inside
    * watermark + lookback and evicts everything older — bounded state
    * at any stream length. One definition, two runners: on batch
    * frames the same code plans as a user_id equi-join with the
    * interval residual (per-user rates bound the fan-out; the
    * bucketed [[graft.operators.Temporal.rangeJoin]] is the
    * heavy-skew alternative).
    */
  def attributionJoin(clicks: DataFrame, views: DataFrame,
                      lookback: String = "10 minutes",
                      watermark: String = "30 minutes"): DataFrame = {
    val c = (if (clicks.isStreaming) clicks.withWatermark("ts", watermark) else clicks)
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"))
    val v = (if (views.isStreaming) views.withWatermark("ts", watermark) else views)
      .select(col("event_id").as("view_id"), col("user_id").as("view_user"),
        col("ts").as("view_ts"))
    c.join(v,
        col("user_id") === col("view_user") &&
          col("view_ts") <= col("click_ts") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookback"))
      .select(col("user_id"), col("click_id"), col("view_id"),
        (expr("unix_micros(click_ts)") - expr("unix_micros(view_ts)")).as("gap_us"))
  }

  /** Per-user running totals on the Spark 4 `transformWithState`
    * surface — the successor of [[userTotals]]'s mapGroupsWithState:
    * named typed state variables (`ValueState`) on the RocksDB state
    * store, explicit TimeMode/OutputMode, optional TTL. Same output
    * contract as [[userTotals]], so the test asserts both APIs agree
    * trigger by trigger. Requires
    * `spark.sql.streaming.stateStore.providerClass =
    * ...state.RocksDBStateStoreProvider`.
    */
  class RunningTotalsProcessor
      extends org.apache.spark.sql.streaming.StatefulProcessor[Long, Event, SessionSummary] {
    import org.apache.spark.sql.streaming.{TimerValues, TTLConfig, ValueState}
    @transient private var totals: ValueState[SessionSummary] = _
    override def init(outputMode: OutputMode,
                      timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      totals = getHandle.getValueState[SessionSummary]("totals",
        org.apache.spark.sql.Encoders.product[SessionSummary], TTLConfig.NONE)
    override def handleInputRows(userId: Long, rows: Iterator[Event],
                                 timerValues: TimerValues): Iterator[SessionSummary] = {
      val prev = Option(totals.get()).getOrElse(SessionSummary(userId, 0L, 0.0))
      val batch = rows.toSeq
      val next = SessionSummary(userId,
        prev.n_events + batch.size,
        prev.total_value + batch.map(_.value).sum)
      totals.update(next)
      Iterator.single(next)
    }
  }

  /** Run [[RunningTotalsProcessor]] over a user-keyed event stream. */
  def userTotalsTws(events: Dataset[Event])(implicit s: SparkSession): Dataset[SessionSummary] = {
    import s.implicits._
    events.groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        org.apache.spark.sql.streaming.TimeMode.None(), OutputMode.Update())
  }

  /** File-source streaming reader with an explicit schema (streaming
    * requires one) — `readStream` over a parquet directory.
    */
  def readEventStream(s: SparkSession, dir: String): DataFrame =
    s.readStream
      .schema("event_id LONG, ts TIMESTAMP, user_id LONG, event_type STRING, value DOUBLE, props STRING")
      .parquet(dir)

  /** Convenience runner: stream `tumblingCounts` into an in-memory
    * sink, returning the query handle (tests + demos).
    */
  def runToMemory(src: DataFrame, name: String): org.apache.spark.sql.streaming.StreamingQuery =
    tumblingCounts(src).writeStream
      .format("memory").queryName(name).outputMode(OutputMode.Complete())
      .start()
}
