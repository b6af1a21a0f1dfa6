package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.engine.{Dedup, Tables}

object Dbg {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.1"
    val base = Tables.documents(spark, d)
      .where(length(col("text")) >= 3)
      .select(col("doc_id"), col("lang"),
        (col("n_chars") / 64).cast("long").as("len_bucket"),
        graft.functions.GraftExpressions.charShingles(col("text"), 3, barrier = true).as("grams"))
    val sigs = Dedup.signatures(base, "grams").localCheckpoint()
    println("docs: " + sigs.count())
    println("avg shingles/doc: " + sigs.select(avg(size(col("grams")))).first().getDouble(0))
    val banded = sigs.select(col("doc_id"), posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val collisions = banded.alias("a").join(banded.alias("b"),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.doc_id") < col("b.doc_id"))
    println("shingle band collisions: " + collisions.count())
    println("distinct colliding pairs: " +
      collisions.select(col("a.doc_id"), col("b.doc_id")).distinct().count())
    println("block-pair count: " + {
      val blocks = base.groupBy("lang", "len_bucket").agg(count(lit(1)).as("n"))
      blocks.select(sum(col("n") * (col("n") - 1) / 2)).first().getLong(0)
    })
    spark.stop()
  }
}
