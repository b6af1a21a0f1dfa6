package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.engine.Tables

/** The bounded top-k Aggregator must be EXACTLY the window row_number
  * form — per group, same survivors, same order — and degrade to
  * "whole group sorted" when k exceeds the group size.
  */
class TopKAggSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("q_grouped_topk_agg ≡ window row_number top-3 on the fixture") {
    val agg = SparkEntry.queries("q_grouped_topk_agg")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(desc("o_totalprice"), asc("o_orderkey"))
    val win = Tables.orders(spark, TestSpark.sfDir)
      .withColumn("rank", row_number().over(w).cast("long"))
      .where(col("rank") <= 3)
      .select(col("o_custkey"), col("rank"), col("o_totalprice"), col("o_orderkey"))
      .orderBy("o_custkey", "rank")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))

    assert(agg.toSeq == win.toSeq)
  }

  test("k larger than every group returns whole groups, sorted") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 10L), (1L, 7.0, 11L), (2L, 3.0, 12L))
      .toDF("g", "v", "id")
    val top = udaf(new graft.functions.TopKAgg(10))
    val out = df.groupBy(col("g")).agg(top(col("v"), col("id")).as("t"))
      .orderBy("g").collect()
      .map(r => r.getSeq[org.apache.spark.sql.Row](1).map(x => (x.getDouble(0), x.getLong(1))))
    assert(out(0) == Seq((7.0, 11L), (5.0, 10L)))
    assert(out(1) == Seq((3.0, 12L)))
  }

  test("ties break by id ascending (deterministic survivors)") {
    import spark.implicits._
    val df = Seq((1L, 5.0, 30L), (1L, 5.0, 10L), (1L, 5.0, 20L)).toDF("g", "v", "id")
    val top = udaf(new graft.functions.TopKAgg(2))
    val out = df.groupBy(col("g")).agg(top(col("v"), col("id")).as("t"))
      .select(col("t")).collect()(0).getSeq[org.apache.spark.sql.Row](0)
      .map(x => (x.getDouble(0), x.getLong(1)))
    assert(out == Seq((5.0, 10L), (5.0, 20L)))
  }
}
