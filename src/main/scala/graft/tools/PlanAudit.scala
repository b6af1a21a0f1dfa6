package graft.tools

import graft.SparkEntry

import org.apache.spark.sql.SparkSession

/** Dev-only: print join/scan characteristics of every query's physical
  * plan — the round-end "is this the plan you'd want at 100×" sweep.
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val p = fn(spark, sf).queryExecution.executedPlan.toString
        def n(s: String) = s.r.findAllIn(p).size
        val flags = Seq(
          "CartesianProduct" -> n("CartesianProduct"),
          "BNLJ" -> n("BroadcastNestedLoopJoin"),
          "SMJ" -> n("SortMergeJoin"),
          "BHJ" -> n("BroadcastHashJoin"),
          "SHJ" -> n("ShuffledHashJoin"),
          "Exchange" -> n("Exchange "),
          // A data filter sitting DIRECTLY on a scan that pushed nothing —
          // post-window/post-join filters and filter-free scans don't count.
          "UnpushedScan" -> p.linesIterator.sliding(2).count { w =>
            w.head.contains("Filter ") && !w.head.contains("isnotnull") &&
              w.last.contains("FileScan") && w.last.contains("PushedFilters: []")
          }
        ).collect { case (k, v) if v > 0 => s"$k=$v" }.mkString(" ")
        println(f"[audit] $name%-24s $flags")
      } catch { case e: Throwable => println(s"[audit] $name ERROR ${e.getMessage.take(80)}") }
    }
    spark.stop()
  }
}
