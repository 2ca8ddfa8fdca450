package graft.llm

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared plumbing for the at-rest index lifecycles (MinHash-LSH and
  * winnowing in [[Dedup]], BM25 in [[Retrieval]], CDC chunk store in
  * [[Dedup]], IVF-PQ in [[Similarity]]): existence-gated table reads,
  * the crash-safe two-rename table swap, and the tombstone mask set
  * every takedown face shares.
  *
  * The swap contract (extracted from the BM25 compaction, which was
  * the only lifecycle doing it safely — the LSH and winnowing
  * compactions used delete-live-then-rename, where a crash between
  * the two FS calls leaves the index with NO live copy and a re-run
  * fails its own delete gate): write the successor to `<table>_new`,
  * retire live to `<table>_old`, promote `_new` → live, drop `_old`.
  * No step destroys data before its replacement is in place, so a
  * crash at any point leaves a complete copy of the table on disk —
  * worst case the live path is momentarily absent with `_old` and/or
  * `_new` present, recoverable by renaming either back — and a
  * subsequent run clears the stale debris up front and proceeds.
  * Hadoop-FS rename has no atomic-swap primitive to do better with.
  */
private[graft] object AtRestStore {

  /** Read `path` as parquet iff it exists — the existence gate every
    * optional at-rest table (tombstones, prior stats, prior chunks)
    * goes through.
    */
  def tableIfExists(spark: SparkSession, path: String): Option[DataFrame] = {
    val pth = new Path(path)
    val fs = pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(pth)) Some(spark.read.parquet(path)) else None
  }

  /** Crash-safe replacement of `dir/table`: `write` receives the
    * staging path (`<table>_new`) and must fully materialize the
    * successor there; the swap then retires live → `_old`, promotes
    * `_new` → live, and drops `_old`. Every FS call is checked.
    * `live` must exist (compaction rewrites an ingested table; a
    * swap against a missing table is a caller bug, surfaced by the
    * retire-rename require).
    */
  def swap(spark: SparkSession, dir: String, table: String)(
      write: String => Unit): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val live = new Path(dir + "/" + table)
    val next = new Path(dir + "/" + table + "_new")
    val old = new Path(dir + "/" + table + "_old")
    val fs = live.getFileSystem(conf)
    // debris from a previous crashed swap — clear before staging
    if (fs.exists(old))
      require(fs.delete(old, true), s"swap($table): could not clear stale $old")
    if (fs.exists(next))
      require(fs.delete(next, true), s"swap($table): could not clear stale $next")
    write(next.toString)
    require(fs.rename(live, old), s"swap($table): could not retire $live")
    require(fs.rename(next, live), s"swap($table): could not promote $next")
    require(fs.delete(old, true), s"swap($table): could not drop $old")
  }

  /** Shared tombstone APPEND for the at-rest takedown faces: dedupe
    * against the existing set (re-delete is a no-op, never a
    * double-mask), materialize before appending into the read path.
    * `gatePath` must exist — a takedown against a mistyped or
    * un-ingested dir must fail LOUD, not write tombstones nowhere
    * useful.
    */
  def tombstoneAppend(ids: DataFrame, idCol: String,
                      dir: String, gatePath: String): Unit = {
    val spark = ids.sparkSession
    require(tableIfExists(spark, dir + "/" + gatePath).isDefined,
      s"takedown against $dir: no $gatePath found — not an ingested " +
        "index (mistyped dir, or delete called before ingest)")
    val existing = tableIfExists(spark, dir + "/tombstones")
    val base = ids.select(col(idCol).cast("long").as("id")).distinct()
    val fresh = existing.map(t => base.join(t, Seq("id"), "left_anti"))
      .getOrElse(base)
      .localCheckpoint() // materialize before appending into the read path
    fresh.write.mode("append").parquet(dir + "/tombstones")
  }

  /** Clear a stale tombstone set at (re-)ingest — without this, a
    * re-ingest after a takedown (the recovery path every delete face
    * documents) would leave old tombstones silently masking freshly
    * ingested rows forever.
    */
  def tombstoneClear(spark: SparkSession, dir: String): Unit = {
    val pth = new Path(dir + "/tombstones")
    pth.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .delete(pth, true)
    ()
  }
}
