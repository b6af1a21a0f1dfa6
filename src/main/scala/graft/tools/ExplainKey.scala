package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper for local iteration: prints, per graded key, the
  * scan ReadSchema lines (column-pruning check), pushed filters, the
  * whole-stage-codegen span count, and the exchange count — the four
  * signals the scale discipline reviews after every new operator.
  *
  *   sbt "runMain graft.tools.ExplainKey q_boilerplate_strip[,k2,...] [sfDir]"
  *
  * Executes each key through the noop sink first (Bench's discipline),
  * so under AQE the printed plan is the FINAL adaptive plan with its
  * per-stage codegen annotation — the pre-execution toString shows the
  * initial guess without `*(n)` markers.
  */
object ExplainKey {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: ExplainKey <key[,key...]> [sfDir]")
    val keys = args(0).split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    keys.foreach { k =>
      println(s"===== $k")
      val fn = graft.SparkEntry.queries.getOrElse(k,
        sys.error(s"unknown key: $k"))
      val df = fn(spark, sfDir)
      // Execute the frame's OWN QueryExecution (ScaleSmoke's discipline):
      // df.write/foreachPartition build a derived QE and leave this one's
      // adaptive plan at its initial guess (isFinalPlan=false, no codegen
      // annotation).
      df.queryExecution.toRdd.foreachPartition(_ => ())
      val plan = df.queryExecution.executedPlan.toString
      if (sys.env.contains("EXPLAIN_FULL")) println(plan)
      // Scan audit: pull the ReadSchema/PushedFilters fragments out of the
      // (very long) FileScan lines so pruning is visible at a glance.
      plan.linesIterator.filter(_.contains("FileScan")).foreach { l =>
        val schema = "ReadSchema: ([^,]*(?:,[^ ]*)*)".r.findFirstMatchIn(l).map(_.group(1))
        val pushed = "PushedFilters: \\[([^\\]]*)\\]".r.findFirstMatchIn(l).map(_.group(1))
        println(s"  scan ReadSchema=${schema.getOrElse("?").take(160)}" +
          pushed.fold("")(p => s" PushedFilters=[${p.take(80)}]"))
      }
      // WholeStageCodegenExec renders as a `*(id)` prefix, not by name.
      val codegenIds = "\\*\\((\\d+)\\)".r.findAllMatchIn(plan).map(_.group(1)).toSet
      println(s"  WholeStageCodegen spans: ${codegenIds.size}")
      println(s"  Exchanges: " + plan.linesIterator.count(_.contains("Exchange")))
      println(s"  Broadcasts: " + plan.linesIterator.count(_.contains("BroadcastExchange")))
    }
    spark.stop()
  }
}
