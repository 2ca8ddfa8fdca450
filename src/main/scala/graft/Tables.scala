package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Each loader is a plain parquet scan — column pruning and predicate
  * pushdown are left to Catalyst (filters land in `PushedFilters`, the
  * projection in `ReadSchema`), which is exactly the behavior the
  * reference gets from windowed block reads (open_ds,
  * gdalos_util.py:6) but for free and distributed.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame   = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame   = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame     = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame   = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** The events fixture carries INT64 TIMESTAMP(NANOS) which Spark's
    * parquet reader rejects by default. The session must be built with
    * `spark.sql.legacy.parquet.nanosAsLong=true` (Verify/Bench/test
    * builders all set it — a loader must not mutate session conf as a
    * side effect); nanos are then rebuilt into a microsecond
    * TimestampType with integer division (a double division would lose
    * precision at ~1e18 ns). */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.get("spark.sql.legacy.parquet.nanosAsLong", "false") == "true",
      "session must set spark.sql.legacy.parquet.nanosAsLong=true to read the events fixture")
    table(s, d, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts DIV 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")
}
