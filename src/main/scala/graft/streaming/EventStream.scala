package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
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

  /** A banded document row feeding [[streamingLshCandidates]]. */
  final case class BandedDoc(doc_id: Long, ts: Timestamp, band: Int, bkey: String)

  /** An ingest-time near-dup candidate: `doc_id` collided with the
    * bucket whose first (retained) occupant is `first_id`. */
  final case class LshCandidate(doc_id: Long, first_id: Long, band: Int, bkey: String)

  /** Streaming MinHash-LSH candidate detection — the near-dup face of
    * [[streamingDedup]] and the streaming twin of the q47 batch
    * pipeline's GENERATION stage: each arriving document computes its
    * signature and band keys PER ROW (the [[graft.llm.Dedup]] column
    * forms — no corpus shuffle, which is what makes it streamable),
    * and a per-bucket `flatMapGroupsWithState` emits a candidate row
    * whenever a later document lands in a bucket some earlier
    * document already claimed. State is ONE doc id per occupied
    * bucket, evicted by event-time timeout at the watermark horizon —
    * bounded at any stream length.
    *
    * Contract notes: this is the candidate-GENERATION stage only —
    * the exact-Jaccard verify needs both texts and stays a batch join
    * downstream (`Dedup.minhashLsh` semantics; at ingest you quarantine
    * candidates, you don't drop them). A pair colliding in several
    * bands emits once per band (same multiplicity the batch band
    * explode produces before its `distinct()`); dedup after the
    * verify join as the batch pipeline does. On a BATCH frame the
    * same call degrades to the window form (earliest `(ts, doc_id)`
    * per bucket is the retained occupant) — one definition, two
    * runners, equality asserted in EventStreamSpec.
    */
  def streamingLshCandidates(docs: DataFrame, idCol: String, textCol: String,
                             tsCol: String, watermark: String = "1 hour",
                             numHashes: Int = 16, bands: Int = 4,
                             shingleLen: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val rowsPerBand = numHashes / bands
    // the band index rides inside the state/window key so band-b
    // buckets never alias band-b' buckets with equal minima hashes
    def keyed(df: DataFrame): DataFrame = df
      .select(col("doc_id"), col("ts"), col("band").cast("int").as("band"),
        concat_ws(":", col("band").cast("string"), col("bkey")).as("bkey"))
    if (docs.isStreaming) {
      // streaming strategy: signatures + band keys PER ROW (the
      // Dedup column forms) — a micro-batch is small, and per-row
      // evaluation needs no shuffle before the stateful op. The
      // repartition still spreads a one-partition micro-batch so the
      // signature work isn't pinned to one task.
      val sig = graft.llm.Dedup.minhashSigCol(
        graft.llm.Dedup.shinglesCol(col(textCol), shingleLen), numHashes)
      val banded = keyed(docs.repartition(col(idCol))
        .select(col(idCol).cast("long").as("doc_id"), col(tsCol).as("ts"),
          posexplode(graft.llm.Dedup.bandKeysCol(sig, bands, rowsPerBand))
            .as(Seq("band", "bkey"))))
      def handle(key: String, rows: Iterator[BandedDoc],
                 state: GroupState[Long]): Iterator[LshCandidate] = {
        if (state.hasTimedOut) { state.remove(); Iterator.empty }
        else {
          // arrival order within a micro-batch is not defined; (ts, id)
          // makes the retained occupant deterministic — the same order
          // the batch twin's struct-min uses
          val sorted = rows.toSeq.sortBy(r => (r.ts.getTime, r.doc_id))
          var first = state.getOption.getOrElse(-1L)
          val out = Seq.newBuilder[LshCandidate]
          for (r <- sorted) {
            if (first < 0) first = r.doc_id
            else if (r.doc_id != first)
              out += LshCandidate(r.doc_id, first, r.band, key)
          }
          state.update(first)
          state.setTimeoutTimestamp(sorted.map(_.ts.getTime).max, watermark)
          out.result().iterator
        }
      }
      banded.withWatermark("ts", watermark)
        .as[BandedDoc]
        .groupByKey(_.bkey)
        .flatMapGroupsWithState(OutputMode.Append,
          GroupStateTimeout.EventTimeTimeout)(handle)
        .toDF()
    } else {
      // batch strategy: the RELATIONAL signature pipeline (the q47
      // machinery) — identical band keys by construction (shared
      // affine family; stream≡batch asserted in EventStreamSpec), but
      // one explode + one aggregation instead of per-row array
      // expressions, which re-inline per element, never enter
      // whole-stage codegen, and measured 20+ minutes on a full
      // corpus where this form takes ~2 s
      val banded = keyed(
        graft.llm.Dedup.bandedKeys(docs, idCol, textCol, numHashes, bands, shingleLen)
          .select(col("id").as("doc_id"), col("band"), col("bkey"))
          .join(docs.select(col(idCol).cast("long").as("doc_id"),
            col(tsCol).as("ts")), "doc_id"))
      val w = Window.partitionBy("bkey")
      banded
        .withColumn("first_id",
          min(struct(col("ts"), col("doc_id"))).over(w).getField("doc_id"))
        .filter(col("doc_id") =!= col("first_id"))
        .select(col("doc_id"), col("first_id"), col("band"), col("bkey"))
    }
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

  /** Dedup-before-ingest over an at-rest LSH index
    * ([[graft.llm.Dedup.lshIngestAtRest]] artifacts) — the streaming
    * face of the q208 probe (judge r14 item 6), the operation a
    * production pipeline runs on every incoming shard: each
    * micro-batch probes the index (ONE band equi-join against the
    * stored buckets — the index is what makes this streamable; the
    * historical corpus is never re-shingled), every row is flagged
    * `dup_earlier` when a verified near-dup already rests in the
    * index, and the WHOLE batch is then appended (quarantine model —
    * flagged rows are marked, never dropped, so later shards still
    * collide with them; the downstream consumer decides what
    * quarantined means). Probe strictly precedes append, so a row
    * never collides with its own batch — same-batch near-dup pairs
    * are NOT flagged, the exact per-ingest-batch blindness the
    * at-rest family documents on [[graft.llm.Dedup.lshAppendAtRest]].
    *
    * Returns the started query; flagged rows (id, dup_earlier)
    * land in `outPath` as parquet PARTITIONED BY the micro-batch id.
    * The caller seeds the index (lshIngestAtRest) before starting
    * the stream — batch ids from the stream begin after that seed.
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): a re-run of a
    * micro-batch after a crash/restart must not self-flag or
    * double-ingest. Three guards make the sink idempotent:
    *  1. the probe anti-joins the batch's OWN ids out of the base
    *     side, so a replay whose rows already rest in the index
    *     cannot verify a row against itself or a same-batch partner
    *     (preserving the documented same-batch blindness);
    *  2. the append ingests only ids NOT already in the shingle
    *     store (written LAST by the append face, so it is the
    *     completion marker — a crash mid-append can leave duplicate
    *     BUCKET rows for the batch, which probes tolerate by
    *     candidate-distinct, but never double-counted shingles);
    *  3. flags overwrite their own batch partition (dynamic
    *     partition overwrite), so replayed output replaces any
    *     partial first attempt instead of appending next to it.
    */
  def dedupBeforeIngestStream(stream: DataFrame, idCol: String,
                              textCol: String, dir: String, outPath: String,
                              numHashes: Int = 16, bands: Int = 4,
                              threshold: Double = 0.5, shingleLen: Int = 3)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      dedupIngestStep(batch, batchId, idCol, textCol, dir, outPath,
        numHashes, bands, threshold, shingleLen)
    }.start()

  /** One probe→flag→append→emit cycle of [[dedupBeforeIngestStream]],
    * package-visible so the replay guards are directly testable
    * (EventStreamSpec re-runs a committed batch and asserts nothing
    * changes — foreachBatch gives at-least-once, not exactly-once).
    */
  private[graft] def dedupIngestStep(batch: DataFrame, batchId: Long,
                                     idCol: String, textCol: String,
                                     dir: String, outPath: String,
                                     numHashes: Int = 16, bands: Int = 4,
                                     threshold: Double = 0.5,
                                     shingleLen: Int = 3): Unit = {
    val spark = batch.sparkSession
    val b = batch.localCheckpoint() // probe + append + emit: one evaluation
    val ownIds = b.select(col(idCol).cast("long").as("base_id"))
    val dups = graft.llm.Dedup.lshProbeAtRest(spark, dir, b, idCol, textCol,
        numHashes, bands, threshold, shingleLen)
      .join(ownIds, Seq("base_id"), "left_anti") // replay guard 1
      .select(col("new_id").as(idCol)).distinct()
      .withColumn("dup_earlier", lit(1))
    val flagged = b.select(col(idCol).cast("long").as(idCol))
      .join(dups, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("dup_earlier"), lit(0)).cast("int").as("dup_earlier"),
        lit(batchId).as("batch"))
      .localCheckpoint() // fix the flags BEFORE the index mutates
    val freshRows = b.join( // replay guard 2
        spark.read
          .parquet(graft.llm.AtRestStore.tablePath(spark, dir, "shingles"))
          .select(col("id").cast("long").as(idCol)).distinct(),
        Seq(idCol), "left_anti")
      .localCheckpoint()
    graft.llm.Dedup.lshAppendAtRest(freshRows, idCol, textCol, dir,
      numHashes, bands, shingleLen)
    flagged.write.mode("overwrite") // replay guard 3
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch").parquet(outPath)
    ()
  }

  /** BATCH twin of [[dedupBeforeIngestStream]] — one relational
    * definition of the same flags, gated by the q212 oracle: given
    * the whole corpus with a batch-id column, a document is
    * `dup_earlier` iff some verified near-dup partner (the q47
    * [[graft.llm.Dedup.minhashLsh]] pair semantics, same hash family
    * and threshold as the probe) sits in a STRICTLY EARLIER batch —
    * exactly what the sequential probe-then-append cycle computes.
    * Parity caveat (documented, spec-asserted on a cap-free corpus):
    * a bucket that crosses the hub cap ACROSS streamed batches keeps
    * only per-batch survivors at rest, so the streaming face can
    * miss a flag the idealized pair set implies when the true
    * partner was hub-reduced away and the hub itself verifies below
    * threshold — the same documented heterogeneous-hot-bucket recall
    * caveat as every LSH face here.
    *
    * Scale shape: the pair join is the banded LSH equi-join (never
    * all-pairs); the flag reduction is one aggregation keyed by doc.
    */
  def dedupBeforeIngestBatch(docs: DataFrame, idCol: String,
                             textCol: String, batchCol: String,
                             numHashes: Int = 16, bands: Int = 4,
                             threshold: Double = 0.5,
                             shingleLen: Int = 3): DataFrame = {
    val pairs = graft.llm.Dedup.minhashLsh(docs, idCol, textCol,
      numHashes, bands, threshold, shingleLen)
    val sym = pairs.select(col("id_a").as("d"), col("id_b").as("p"))
      .unionByName(pairs.select(col("id_b").as("d"), col("id_a").as("p")))
    val b = docs.select(col(idCol).cast("long").as("doc_id"),
      col(batchCol).cast("long").as("batch"))
    val flagged = sym
      .join(b.select(col("doc_id").as("p"), col("batch").as("p_batch")), Seq("p"))
      .join(b.select(col("doc_id").as("d"), col("batch").as("d_batch")), Seq("d"))
      .filter(col("p_batch") < col("d_batch"))
      .select(col("d").as("doc_id")).distinct()
      .withColumn("dup_earlier", lit(1))
    b.join(flagged, Seq("doc_id"), "left")
      .select(col("doc_id"), col("batch"),
        coalesce(col("dup_earlier"), lit(0)).cast("int").as("dup_earlier"))
  }

  /** Streaming face of the at-rest CDC chunk store — dedup-at-the-
    * storage-layer as ingestion runs: each micro-batch flows through
    * [[graft.llm.Dedup.cdcAppendAtRest]] (chunk once, batch-dedup,
    * anti-join the store on the chunk hash, append only NEW chunks +
    * one ledger row), so the store and its ledger are always current
    * and history is never re-chunked. The caller establishes the
    * store first ([[graft.llm.Dedup.cdcInitAtRest]]); micro-batch ids
    * key the ledger. Unlike [[dedupBeforeIngestStream]] there is no
    * per-batch blindness caveat — chunk identity is content, so
    * within-batch and cross-batch duplicates dedupe identically to a
    * one-shot ingest (q227 gates stream-built ≡ batch-replayed).
    */
  def cdcIngestStream(stream: DataFrame, idCol: String, textCol: String,
                      dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.llm.Dedup.cdcAppendAtRest(batch, idCol, textCol, dir, batchId)
      ()
    }.start()

  /** Streaming face of the at-rest BM25 index — the crawl-shard
    * pattern (index documents on arrival) that already exists for
    * LSH ([[dedupBeforeIngestStream]]) and CDC ([[cdcIngestStream]]):
    * each micro-batch flows through
    * [[graft.llm.Retrieval.bm25AppendBatch]], which signs and buckets
    * the shard under the stored params and lands postings + doclens +
    * one stats delta row in the micro-batch's own `batch=` partitions
    * via dynamic partition overwrite. BM25's additive drift-free
    * deltas make this the easiest of the three: no probe, no
    * anti-join — a probe through any prefix of the stream is
    * bit-equal to a one-shot ingest of the same documents (q231
    * gates stream-built ≡ batch-built).
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): a re-run of a
    * committed micro-batch recomputes the identical postings/stats
    * delta and overwrites exactly its own partitions — the ledger
    * can never double-count a shard. Caller seeds with
    * [[graft.llm.Retrieval.bm25InitAtRest]] (params only, no corpus)
    * so Spark's batch ids have nothing to collide with.
    */
  def bm25IngestStream(stream: DataFrame, idCol: String, textCol: String,
                       dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      graft.llm.Retrieval.bm25AppendBatch(batch, idCol, textCol, dir, batchId)
      ()
    }.start()

  /** Streaming face of the at-rest IVF-PQ vector index — the
    * crawl-shard pattern for EMBEDDINGS (index vectors on arrival),
    * completing the matrix: every at-rest index kind (LSH, CDC,
    * BM25, winnowing, IVF-PQ) has batch ingest + append + a
    * streaming ingest face. The FIRST micro-batch trains the index
    * ([[graft.llm.Similarity.ivfPqIngest]] — FAISS `train()+add()`);
    * every later batch is coarse-routed and PQ-encoded under the
    * FROZEN codebooks ([[graft.llm.Similarity.ivfPqAppend]] — FAISS
    * `add()`), exactly the batch lifecycle q201 gates.
    *
    * REPLAY SAFETY (foreachBatch is at-least-once): the codes table
    * is written LAST by the train face, so its existence is the
    * training completion marker — a replay that finds no codes
    * retrains (the models it overwrites were half of a crashed
    * first attempt); a replay that finds codes anti-joins away ids
    * already encoded (Spark's file committer lands the append
    * atomically at job granularity, so a committed batch's ids are
    * all present and the replay dissolves to an empty append).
    * Drift contract unchanged from [[graft.llm.Similarity.ivfPqAppend]]:
    * codebooks describe micro-batch 0's distribution; audit a
    * drifting stream with pqRecall and re-ingest (the q211
    * census/rebalance face) when it degrades.
    */
  def ivfPqIngestStream(stream: DataFrame, dir: String, coarseK: Int = 8,
                        m: Int = 4, k: Int = 8,
                        idCol: String = "vec_id",
                        vecCol: String = "embedding")
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      ivfPqIngestStep(batch, dir, coarseK, m, k, idCol, vecCol)
    }.start()

  /** One train-or-append cycle of [[ivfPqIngestStream]],
    * package-visible so the replay guard is directly testable.
    */
  private[graft] def ivfPqIngestStep(batch: DataFrame, dir: String,
                                     coarseK: Int, m: Int, k: Int,
                                     idCol: String, vecCol: String): Unit =
    graft.llm.AtRestStore.establishOrAppend(batch, dir, "codes", "id", idCol)(
      b => graft.llm.Similarity.ivfPqIngest(b, dir, coarseK, m, k,
        idCol = idCol, vecCol = vecCol))(
      fresh => graft.llm.Similarity.ivfPqAppend(fresh, dir, m, idCol, vecCol))

  /** Streaming face of the at-rest winnowing (MOSS) index — shared-
    * passage provenance kept current as shards arrive: each
    * micro-batch is fingerprinted ONCE under the STORED (k, w)
    * ([[graft.llm.Dedup.winnowAppendAtRest]]) and appended to the fp
    * store; history is never re-fingerprinted. The first micro-batch
    * establishes the store ([[graft.llm.Dedup.winnowIngestAtRest]],
    * default params).
    *
    * REPLAY SAFETY: winnowAppendAtRest's contract requires fresh
    * ids, so the step anti-joins the fp store's id set — a replayed
    * committed batch dissolves to an empty append (the fp rows land
    * in one job commit, so a committed batch's ids are all present
    * or all absent). A doc too short to yield any fingerprint
    * (len < k) re-fingerprints on replay and yields nothing again —
    * harmless by construction.
    */
  def winnowIngestStream(stream: DataFrame, idCol: String, textCol: String,
                         dir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    stream.writeStream.foreachBatch { (batch: DataFrame, _: Long) =>
      winnowIngestStep(batch, idCol, textCol, dir)
    }.start()

  /** One establish-or-append cycle of [[winnowIngestStream]],
    * package-visible so the replay guard is directly testable.
    */
  private[graft] def winnowIngestStep(batch: DataFrame, idCol: String,
                                      textCol: String, dir: String): Unit =
    graft.llm.AtRestStore.establishOrAppend(batch, dir, "fps", "id", idCol)(
      b => graft.llm.Dedup.winnowIngestAtRest(b, idCol, textCol, dir))(
      fresh => graft.llm.Dedup.winnowAppendAtRest(fresh, idCol, textCol, dir))

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
