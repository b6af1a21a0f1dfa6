package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Dev-only: run ONLY q_neardup_lsh cold with a stage-time listener. */
object DebugLsh2 {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val dur = (si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)) / 1000.0
        val tm = si.taskMetrics
        println(f"[stage] id=${si.stageId} attempt=${si.attemptNumber} parents=${si.parentIds.mkString(",")} tasks=${si.numTasks} dur=$dur%.1f s shufW=${tm.shuffleWriteMetrics.bytesWritten/1e6}%.0fMB shufR=${tm.shuffleReadMetrics.totalBytesRead/1e6}%.0fMB out=${tm.outputMetrics.recordsWritten} fail=${si.failureReason.isDefined}")
      }
    })
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, durationNs: Long): Unit =
        println("[executedplan]\n" + qe.executedPlan.toString.take(8000))
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution, exception: Exception): Unit = ()
    })
    val t0 = System.nanoTime()
    val df = graft.engine.Dedup.queries("q_neardup_lsh")(spark, sf)
    df.write.format("noop").mode("overwrite").save()
    println(f"[debug] full cold: ${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(3000)
    spark.stop()
  }
}
