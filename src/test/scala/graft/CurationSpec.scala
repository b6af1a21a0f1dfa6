package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, Tables, TextAnalysis}

/** The graded curation composition (quality gate → set-normalized dedup)
  * must be internally consistent and agree with its standalone stages.
  */
class CurationSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val sfDir = "/root/testdata/sf0.01"

  test("per language: n_unique <= n_quality <= n_raw, totals cover the corpus") {
    val rows = TextAnalysis.queries("q_curation_pipeline")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (raw, q, u) = (r.getAs[Long]("n_raw"), r.getAs[Long]("n_quality"),
        r.getAs[Long]("n_unique"))
      assert(u <= q && q <= raw, s"${r.getString(0)}: $u / $q / $raw")
      assert(u > 0, s"${r.getString(0)}: quality gate drained the corpus — vacuous key")
    }
    val total = rows.map(_.getAs[Long]("n_raw")).sum
    assert(total == Tables.documents(spark, sfDir).count())
  }

  test("n_unique matches the standalone set-normalized dedup on the quality survivors") {
    val ws = split(col("text"), " ")
    val survivors = Tables.documents(spark, sfDir)
      .withColumn("n_tokens", size(ws).cast("long"))
      .withColumn("n_uniq", size(array_distinct(ws)).cast("long"))
      .where(col("n_tokens") >= 5 && col("n_uniq") * 10 >= col("n_tokens") * 3)
    val standalone = survivors
      .select(col("lang"), Dedup.normKey(col("text")).as("norm"))
      .groupBy("lang").agg(countDistinct("norm").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val composed = TextAnalysis.queries("q_curation_pipeline")(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("n_unique")).toMap
    assert(composed == standalone)
  }
}
