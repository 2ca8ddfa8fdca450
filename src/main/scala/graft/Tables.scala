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
  /** The events fixture's `ts` physical type has drifted across driver
    * generations — INT64 TIMESTAMP(NANOS) through round 8, then
    * `timestamp[us]` (isAdjustedToUTC=false, read by Spark as
    * TIMESTAMP_NTZ) from round 9 — so the loader adapts to the scanned
    * schema instead of assuming one encoding:
    *
    *  - `LongType` (nanos read under
    *    `spark.sql.legacy.parquet.nanosAsLong=true`, which
    *    Verify/Bench/test builders still set defensively): rebuild a
    *    microsecond TimestampType with integer division (a double
    *    division would lose precision at ~1e18 ns).
    *  - `TimestampNTZType`: cast to the session TimestampType. All
    *    entry points pin `spark.sql.session.timeZone=UTC`, so the
    *    naive wall-clock maps to the same instant DuckDB's `epoch_us`
    *    assigns the naive parquet value.
    *  - `TimestampType`: already the session-local instant; pass through.
    *
    * Anything else fails loudly with the offending type named, so the
    * next fixture drift is one readable line, not seven downstream
    * analysis errors. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val raw = table(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other => sys.error(
        s"events fixture drift: ts is $other; expected INT64 nanos, TIMESTAMP_NTZ, or TIMESTAMP")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = table(s, d, "embeddings")

  /** Expected fixture schema (TESTDATA.md, round-10 generation), as
    * Spark `simpleString` type names. Time-valued columns accept the
    * encodings every loader here handles: parquet `timestamp[us]`
    * read as TIMESTAMP_NTZ (driver ≥ r9), plain TIMESTAMP, or — for
    * `events.ts` only — INT64 nanos read as `bigint` under
    * `nanosAsLong` (driver ≤ r8). */
  private val TimeTypes = Set("timestamp_ntz", "timestamp")
  private val expectedFixture: Seq[(String, Seq[(String, Set[String])])] = {
    def c(pairs: (String, String)*) = pairs.map { case (n, t) => n -> Set(t) }
    Seq(
      "region" -> c("r_regionkey" -> "int", "r_name" -> "string"),
      "nation" -> c("n_nationkey" -> "int", "n_name" -> "string", "n_regionkey" -> "int"),
      "customer" -> c("c_custkey" -> "bigint", "c_name" -> "string",
        "c_nationkey" -> "int", "c_acctbal" -> "double", "c_mktsegment" -> "string"),
      "supplier" -> c("s_suppkey" -> "bigint", "s_name" -> "string",
        "s_nationkey" -> "int", "s_acctbal" -> "double"),
      "part" -> c("p_partkey" -> "bigint", "p_name" -> "string", "p_brand" -> "string",
        "p_type" -> "string", "p_size" -> "int", "p_retailprice" -> "double"),
      "orders" -> (c("o_orderkey" -> "bigint", "o_custkey" -> "bigint",
        "o_orderstatus" -> "string", "o_totalprice" -> "double") ++
        Seq("o_orderdate" -> TimeTypes) ++ c("o_orderpriority" -> "string")),
      "lineitem" -> (c("l_orderkey" -> "bigint", "l_partkey" -> "bigint",
        "l_suppkey" -> "bigint", "l_linenumber" -> "int", "l_quantity" -> "double",
        "l_extendedprice" -> "double", "l_discount" -> "double", "l_tax" -> "double",
        "l_returnflag" -> "string", "l_linestatus" -> "string") ++
        Seq("l_shipdate" -> TimeTypes)),
      "events" -> (c("event_id" -> "bigint") ++ Seq("ts" -> (TimeTypes + "bigint")) ++
        c("user_id" -> "bigint", "event_type" -> "string", "value" -> "double",
          "props" -> "string")),
      "documents" -> c("doc_id" -> "bigint", "text" -> "string", "lang" -> "string",
        "source" -> "string", "n_chars" -> "bigint"),
      "embeddings" -> c("vec_id" -> "bigint", "embedding" -> "array<float>",
        "label" -> "int"),
    )
  }

  /** Fixture-schema contract check (run at the top of Verify/Bench):
    * compares each table's scanned schema against [[expectedFixture]]
    * and returns one readable drift line per mismatch — so the next
    * driver-side fixture regeneration surfaces as
    * `events.ts: date (expected timestamp_ntz|timestamp|bigint)`
    * instead of seven opaque downstream analysis errors (the round-9
    * failure mode). Footer-only reads; costs milliseconds. */
  def fixtureDrift(s: SparkSession, d: String): Seq[String] =
    expectedFixture.flatMap { case (t, cols) =>
      try {
        val actual = table(s, d, t).schema
          .map(f => f.name -> f.dataType.simpleString).toMap
        val missing = cols.collect { case (n, _) if !actual.contains(n) =>
          s"$t.$n: MISSING (expected ${cols.toMap.apply(n).mkString("|")})" }
        val drifted = cols.collect {
          case (n, exp) if actual.get(n).exists(a => !exp.contains(a)) =>
            s"$t.$n: ${actual(n)} (expected ${exp.mkString("|")})" }
        val extra = (actual.keySet -- cols.map(_._1)).toSeq.sorted
          .map(n => s"$t.$n: unexpected new column (${actual(n)})")
        missing ++ drifted ++ extra
      } catch { case e: Throwable => Seq(s"$t: unreadable (${e.getMessage})") }
    }
}
