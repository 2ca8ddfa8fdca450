package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Bucketing = the persistent form of co-located joins (the scale
  * playbook's alternative to per-query repartitioning): two tables
  * bucketed by the same key and count join WITHOUT a shuffle — the
  * Exchange disappears from the plan because the on-disk layout
  * already satisfies the join's required distribution.
  */
class BucketingSpec extends SparkSpec {
  import spark.implicits._

  test("same-bucketed tables sort-merge join with no Exchange") {
    val warehouse = new java.io.File("spark-warehouse")
    try {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      spark.range(2000).select($"id".as("k"), ($"id" * 2).as("a"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_orders")
      spark.range(6000).select(($"id" % 2000).as("k"), $"id".as("b"))
        .write.mode("overwrite").bucketBy(8, "k").sortBy("k").saveAsTable("bkt_lineitem")

      val joined = spark.table("bkt_orders")
        .hint("merge") // pin SMJ so AQE doesn't broadcast the tiny side
        .join(spark.table("bkt_lineitem"), "k")
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() == 6000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS bkt_orders")
      spark.sql("DROP TABLE IF EXISTS bkt_lineitem")
      def rm(f: java.io.File): Unit = {
        if (f.isDirectory) f.listFiles().foreach(rm)
        f.delete(); ()
      }
      if (warehouse.exists()) rm(warehouse)
    }
  }
}
