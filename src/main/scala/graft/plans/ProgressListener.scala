package graft.plans

import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

/** I4: progress reporting — the Spark-native replacement for GDAL's
  * progress callback (`gdalos_trans.py:815-816`): a `SparkListener`
  * counting jobs/stages/tasks, with an optional percent callback fed
  * from completed vs submitted tasks.
  */
class ProgressListener(onProgress: Double => Unit = _ => ()) extends SparkListener {
  val jobsStarted = new AtomicInteger
  val jobsEnded = new AtomicInteger
  val stagesCompleted = new AtomicInteger
  val tasksEnded = new AtomicInteger
  val recordsRead = new AtomicLong

  override def onJobStart(e: SparkListenerJobStart): Unit = { jobsStarted.incrementAndGet(); () }
  override def onJobEnd(e: SparkListenerJobEnd): Unit = { jobsEnded.incrementAndGet(); () }
  override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
    stagesCompleted.incrementAndGet(); ()
  }
  override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
    tasksEnded.incrementAndGet()
    if (e.taskMetrics != null) recordsRead.addAndGet(e.taskMetrics.inputMetrics.recordsRead)
    val started = jobsStarted.get
    if (started > 0) onProgress(jobsEnded.get.toDouble / started)
  }
}

object ProgressListener {
  /** Attach a fresh listener to the session; caller removes it via
    * `spark.sparkContext.removeSparkListener`.
    */
  def attach(spark: SparkSession, onProgress: Double => Unit = _ => ()): ProgressListener = {
    val l = new ProgressListener(onProgress)
    spark.sparkContext.addSparkListener(l)
    l
  }
}
