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
    // exact floor division (pmod keeps the numerator an exact multiple
    // of the width, so the double division is exact): any monotonic
    // cell function works as long as both sides use the same one
    def cell(c: Column): Column = {
      val v = c.cast("long")
      ((v - pmod(v, lit(bucketWidth))) / lit(bucketWidth)).cast("long")
    }
    val iv = intervals.withColumn("__cell",
      explode(sequence(cell(col(startCol)), cell(col(endCol) - 1))))
    val pt = points.withColumn("__cell", cell(col(pointCol)))
    pt.join(iv, on :+ "__cell")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }
}
