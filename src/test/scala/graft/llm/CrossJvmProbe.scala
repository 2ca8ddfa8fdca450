package graft.llm

/** Forked-JVM probe for the cross-process store contention check
  * ([[AtRestStoreSpec]] "second JVM probing during maintenance"): a
  * SEPARATE SparkSession in a SEPARATE process repeatedly resolves
  * and reads one store table through [[AtRestStore.tableIfExists]],
  * appending each observation (sorted value set, or ABSENT) to the
  * output file. The parent spec flips the store concurrently and then
  * asserts every observation equals a PUBLISHED generation — the
  * rename-visibility semantics a real cluster's executors see, which
  * a single-JVM/single-FS-client race spec cannot exercise.
  */
object CrossJvmProbe {
  def main(args: Array[String]): Unit = {
    val Array(dir, out, iters) = args
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-crossjvm-probe")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    val w = new java.io.PrintWriter(new java.io.FileWriter(out, true))
    try {
      // warm up the session's first-read machinery (codegen, parquet
      // footer readers) BEFORE signaling readiness — the parent only
      // starts flipping after STARTED, and a cold first read can take
      // seconds, long enough to straddle two spaced flips and lose
      // the one-generation read grace by design rather than by bug
      AtRestStore.tableIfExists(spark, dir, "t").foreach(_.collect())
      w.println("STARTED"); w.flush()
      var i = 0
      while (i < iters.toInt) {
        val obs =
          try AtRestStore.tableIfExists(spark, dir, "t")
            .map(_.collect().map(_.getInt(0)).toSet.toSeq.sorted
              .mkString(","))
            .getOrElse("ABSENT")
          catch { case e: Throwable => "ERROR:" + e.getClass.getName + ":" +
            Option(e.getMessage).getOrElse("").replaceAll("\\s+", " ").take(500) }
        w.println(obs); w.flush()
        i += 1
      }
      w.println("DONE"); w.flush()
    } finally {
      w.close()
      spark.stop()
    }
    sys.exit(0)
  }
}
