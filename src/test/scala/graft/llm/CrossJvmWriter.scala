package graft.llm

/** Forked-JVM writer for the cross-process LEASE specs
  * ([[AtRestStoreSpec]]): a separate SparkSession in a separate OS
  * process either HOLDS a store's write lease for a while (`hold`
  * mode — the parent then proves its own acquisition fails loudly
  * through the `_lease` FILE, since the in-process lock cannot see
  * across JVMs) or APPENDS a batch to an LSH store (`append` mode —
  * racing the parent's own append through real filesystem-level
  * lease acquisition). Outcomes are appended to the log file for the
  * parent to assert on.
  */
object CrossJvmWriter {
  def main(args: Array[String]): Unit = {
    val (mode, dir, out) = (args(0), args(1), args(2))
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[2]").appName("graft-crossjvm-writer")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.shuffle.partitions", "2")
      .getOrCreate()
    def log(s: String): Unit = {
      val w = new java.io.PrintWriter(new java.io.FileWriter(out, true))
      try { w.println(s); w.flush() } finally w.close()
    }
    try {
      mode match {
        case "hold" =>
          val ms = args(3).toLong
          AtRestStore.withLease(spark, dir, "xjvm-holder") {
            log("HELD"); Thread.sleep(ms)
          }
          log("RELEASED")
        case "append" =>
          import spark.implicits._
          val (lo, hi) = (args(3).toLong, args(4).toLong)
          val docs = (lo to hi).map(i =>
            (i, s"append race corpus sentence group ${i % 4} repeated " +
              s"words making shingles overlap ${i % 4}")).toDF("id", "text")
          try { Dedup.lshAppendAtRest(docs, "id", "text", dir); log("DONE") }
          catch {
            case e: Throwable => log("FAILED:" + e.getClass.getSimpleName)
          }
      }
    } finally spark.stop()
    sys.exit(0)
  }
}
