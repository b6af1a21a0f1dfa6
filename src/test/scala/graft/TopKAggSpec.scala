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

  test("knn batch: every query's list is its true cosine top-k, self excluded") {
    val vecs = Tables.embeddings(spark, TestSpark.sfDir)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val got = SparkEntry.queries("q_knn_batch")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    val queryIds = vecs.keys.filter(_ % graft.engine.Similarity.KnnQueryStride == 0)
    assert(got.keySet == queryIds.toSet, "one list per panel query")
    got.foreach { case (q, rows) =>
      val truth = vecs.toSeq.filter(_._1 != q)
        .map { case (id, v) => (id, cos(vecs(q), v)) }
        .sortBy { case (id, c) => (-c, id) }
        .take(graft.engine.Similarity.KnnK)
      val gotList = rows.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(gotList == truth, s"query $q")
      assert(rows.map(_._2).sorted.toSeq == (1L to rows.length), s"query $q ranks")
    }
  }
}
