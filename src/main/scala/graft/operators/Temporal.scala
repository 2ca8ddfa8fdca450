package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join operators Spark lacks as built-ins: backward as-of
  * join and point-in-interval range join. Part of the
  * training-pipeline extension surface (event/session enrichment at
  * corpus scale), composed from existing operators per SURVEY §7.3's
  * preference order — no custom physical plan is needed because both
  * have an exact shuffle-once relational formulation.
  *
  * 100 TB posture:
  *  - [[asofJoinBackward]] is the union+window formulation (the same
  *    shape kdb's `aj` and Flink's temporal join lower to): ONE
  *    shuffle on the key columns, then a per-key ordered walk — never
  *    the t₁ ≥ t₂ theta-join (quadratic candidate volume) that naive
  *    SQL produces. Spark's window sort spills to disk, so a hot key
  *    degrades before it OOMs; keys are assumed to fit a sort-spill
  *    partition (salting cannot apply — the walk needs full per-key
  *    order).
  *  - [[rangeJoin]] buckets time into `bucketWidth` cells: intervals
  *    replicate to each cell they overlap (⌈len/width⌉ + 1 ≤ 2 rows
  *    when width ≥ max interval length), points land in exactly one
  *    cell, and the join is a plain equi-join on (keys, cell) with a
  *    residual bounds filter — Catalyst gets a hash-joinable key and
  *    the candidate volume is bounded by cell co-occupancy, not
  *    |points|×|intervals|.
  */
object Temporal {

  /** Exact floor-division time bucket: v ↦ ⌊v / width⌋ in pure
    * integer arithmetic. `pmod` makes the numerator the FLOOR
    * multiple of `width` (nonnegative remainder even for pre-1970
    * timestamps), and integral `div` on an exact multiple has no
    * remainder — so the result is exact for the full long range,
    * unlike a double division (only exact below 2^53) or a truncated
    * `%` (diverges from floor for negative v). Oracles mirror this
    * with DuckDB's `(v - ((v % w) + w) % w) // w` (DuckDB `%` and
    * `//` both truncate toward zero).
    */
  private def floorDivCell(widthUs: Long)(c: Column): Column =
    call_function("div",
      c.cast("long") - pmod(c.cast("long"), lit(widthUs)), lit(widthUs))

  /** Backward (most-recent-at-or-before) as-of join: for each left
    * row, attach the payload of the latest right row with the same
    * `on` keys and `right(rightTime) <= left(leftTime)`; left rows
    * with no such right row keep null payload (left-outer semantics).
    *
    * Time columns must be numeric/orderable (epoch micros
    * recommended); left and right non-key column names must not
    * collide (rename before joining). At equal timestamps the right
    * row is visible to the left row (inclusive ≥, tagged so right
    * sorts first); among right rows sharing one timestamp the last by
    * union order wins — disambiguate upstream if that can occur.
    */
  def asofJoinBackward(left: DataFrame, right: DataFrame, on: Seq[String],
                       leftTime: String, rightTime: String): DataFrame = {
    val lCols = left.columns.filterNot(on.contains).toSeq
    val rCols = right.columns.filterNot(on.contains).toSeq
    val clash = lCols.intersect(rCols)
    require(clash.isEmpty, s"column collision between sides: ${clash.mkString(", ")}")
    require(lCols.contains(leftTime) && rCols.contains(rightTime),
      "time columns must be non-key columns of their own side")

    def nulls(src: DataFrame, cols: Seq[String]): Seq[Column] =
      cols.map(c => lit(null).cast(src.schema(c).dataType).as(c))
    val lTagged = left.select(
      on.map(col) ++ Seq(col(leftTime).as("__t"), lit(1).as("__isl")) ++
        lCols.map(col) ++ nulls(right, rCols): _*)
    val rTagged = right.select(
      on.map(col) ++ Seq(col(rightTime).as("__t"), lit(0).as("__isl")) ++
        nulls(left, lCols) ++ rCols.map(col): _*)

    val w = Window.partitionBy(on.map(col): _*)
      .orderBy(col("__t"), col("__isl"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lTagged.unionByName(rTagged)
      .select(on.map(col) ++ lCols.map(col) ++ Seq(col("__isl")) ++
        rCols.map(c => last(col(c), ignoreNulls = true).over(w).as(c)): _*)
      .filter(col("__isl") === 1)
      .drop("__isl")
  }

  /** Point-in-interval join (inner): rows of `points` matched to every
    * row of `intervals` sharing the `on` keys with
    * `start <= point < end`. All three columns are integral (epoch
    * micros recommended). `bucketWidth` sizes the time cells —
    * choose ≥ the typical interval length so intervals replicate to
    * ~2 cells; longer intervals still work (they replicate to more
    * cells), shorter widths trade replication for smaller cells.
    * Non-key column names must not collide across the two frames.
    */
  def rangeJoin(points: DataFrame, intervals: DataFrame, on: Seq[String],
                pointCol: String, startCol: String, endCol: String,
                bucketWidth: Long): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val clash = points.columns.filterNot(on.contains)
      .intersect(intervals.columns.filterNot(on.contains))
    require(clash.isEmpty, s"column collision between sides: ${clash.mkString(", ")}")
    // exact floor-division cell (integral `div`, no double round-trip
    // — a double division is only exact below 2^53, and a cell
    // disagreement between the two sides silently drops matches):
    // any monotonic cell works as long as both sides use the same one
    def cell(c: Column): Column = floorDivCell(bucketWidth)(c)
    val iv = intervals.withColumn("__cell",
      explode(sequence(cell(col(startCol)), cell(col(endCol) - 1))))
    val pt = points.withColumn("__cell", cell(col(pointCol)))
    pt.join(iv, on :+ "__cell")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }

  /** Burst detection — the rate-anomaly monitor over a keyed event
    * stream: counts bucket per (key, time cell), each cell compares
    * against the mean of the `trail` FULL preceding cells, and cells
    * at `ratio ≥ threshold` flag as bursts. Ratios are exact-count
    * divisions (sum/width of integers — no variance estimate, no
    * float accumulation), so the flags are bit-reproducible.
    *
    * Scale shape: one (key, cell) aggregation over the stream, then
    * a per-key ordered window over the CELL HISTOGRAM (|keys|·|cells|
    * rows — hours, not events), never over raw events. Cells with
    * fewer than `trail` predecessors emit NULL ratio (no baseline)
    * rather than a misleading partial mean.
    */
  def burstCells(ev: DataFrame, keyCol: String, tsCol: String,
                 cellUs: Long, trail: Int,
                 threshold: Double): DataFrame = {
    require(cellUs > 0 && trail > 0, s"need cellUs/trail > 0, got $cellUs/$trail")
    val cell = floorDivCell(cellUs) _
    val hist = ev.select(col(keyCol).as("k"), cell(col(tsCol)).as("c"))
      .groupBy("k", "c").agg(count(lit(1)).as("n"))
    // gaps matter: an empty cell between events must count as 0 in
    // the baseline, so the trailing window runs over a DENSE cell
    // axis joined per key (cells bounded by the observed span)
    val span = hist.agg(min("c").as("c0"), max("c").as("c1"))
    val dense = hist.select("k").distinct()
      .crossJoin(broadcast(span))
      .select(col("k"), explode(sequence(col("c0"), col("c1"))).as("c"))
      .join(hist, Seq("k", "c"), "left")
      .withColumn("n", coalesce(col("n"), lit(0L)))
    val w = Window.partitionBy("k").orderBy("c").rowsBetween(-trail, -1)
    dense
      .withColumn("trail_n", count(lit(1)).over(w))
      .withColumn("trail_sum", coalesce(sum("n").over(w), lit(0L)))
      .withColumn("trail_mean",
        when(col("trail_n") === trail,
          col("trail_sum").cast("double") / trail))
      .withColumn("ratio",
        when(col("trail_mean") > 0.0, col("n").cast("double") / col("trail_mean")))
      .withColumn("burst",
        coalesce(col("ratio") >= threshold, lit(false)))
      .select("k", "c", "n", "trail_mean", "ratio", "burst")
  }

  /** Retention cohort analysis — the funnel's longitudinal
    * companion: entities cohort by the time bucket of their FIRST
    * event, and each later bucket in which they appear marks them
    * retained at that offset. Output is the (cohort, offset) matrix
    * with active counts, cohort sizes and retention rates — the
    * table behind every "day-N retention" curve.
    *
    * Scale shape: one entity-keyed MIN aggregation (first-seen), one
    * (entity, bucket) distinct, a join back on the entity and one
    * (cohort, offset) aggregation — every shuffle keys on the entity
    * or a bounded (cohort, offset) pair; no windows, nothing
    * collected. Bucket arithmetic is exact integer floor division.
    */
  def retentionCohorts(ev: DataFrame, entityCol: String, tsCol: String,
                       bucketUs: Long, maxOffset: Int): DataFrame = {
    require(bucketUs > 0 && maxOffset >= 0,
      s"need bucketUs > 0, maxOffset >= 0; got $bucketUs/$maxOffset")
    val cell = floorDivCell(bucketUs) _
    val e = ev.select(col(entityCol).as("u"), cell(col(tsCol)).as("b"))
    val first = e.groupBy("u").agg(min("b").as("cohort"))
    val sizes = first.groupBy("cohort").agg(count(lit(1)).as("cohort_n"))
    e.distinct()
      .join(first, "u")
      .withColumn("offset", (col("b") - col("cohort")).cast("int"))
      .filter(col("offset") <= maxOffset)
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_active")) // (u, b) distinct ⇒ count = users
      .join(sizes, "cohort")
      .withColumn("retention",
        col("n_active").cast("double") / col("cohort_n"))
  }

  /** Ordered funnel analysis — the staged-conversion report: per
    * entity, stage k counts only if some stage-k event lands STRICTLY
    * AFTER the entity's stage-(k−1) completion time and within
    * `windowUs` of it (each stage re-arms the window — the classic
    * product-analytics funnel). Per stage: entities reaching it,
    * conversion vs the funnel head and vs the previous stage.
    *
    * Scale shape: stage k is one entity-keyed MIN aggregation over
    * the stage's events joined against the (monotonically shrinking)
    * survivor frame of stage k−1 — every shuffle keys on the entity,
    * no corpus-wide window, nothing collected; the report itself is
    * |stages| rows. Events need ONE scan per stage of the already
    * type-filtered slice; at rest, a table partitioned by event type
    * turns each stage scan into a partition-pruned read.
    */
  def funnel(ev: DataFrame, entityCol: String, tsCol: String,
             stageCol: String, stages: Seq[String],
             windowUs: Long): DataFrame = {
    require(stages.nonEmpty, "need at least one funnel stage")
    require(windowUs > 0, "windowUs must be positive")
    val base = ev.select(col(entityCol).as("u"),
      col(tsCol).cast("long").as("t"), col(stageCol).as("st"))
    // survivor frames: (u, t = completion time of this stage)
    val survivors = stages.tail.scanLeft(
      base.filter(col("st") === stages.head).groupBy("u")
        .agg(min("t").as("t"))) { (prev, stage) =>
      base.filter(col("st") === stage)
        .join(prev.select(col("u"), col("t").as("pt")), "u")
        .filter(col("t") > col("pt") && col("t") <= col("pt") + windowUs)
        .groupBy("u").agg(min("t").as("t"))
    }
    val counts = survivors.zip(stages).zipWithIndex.map {
      case ((df, stage), i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("stage_idx"), lit(stage).as("stage"),
            col("n_users"))
    }.reduce(_ unionByName _)
    val w = Window.orderBy("stage_idx")
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val wPrev = Window.orderBy("stage_idx")
    // |stages| rows: the single-partition windows are free
    counts
      .withColumn("head_n", first("n_users").over(w))
      .withColumn("prev_n", coalesce(lag("n_users", 1).over(wPrev), col("n_users")))
      .select(col("stage_idx"), col("stage"), col("n_users"),
        when(col("head_n") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("head_n")).as("conv_from_head"),
        when(col("prev_n") === 0, lit(0.0))
          .otherwise(col("n_users").cast("double") / col("prev_n")).as("conv_from_prev"))
  }
}
