package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage cardinality/timing of q_neardup_lsh. */
object DebugLsh {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[debug] $label: ${(System.nanoTime() - t0) / 1e9}%.1f s"); r
    }
    val sigs = graft.engine.Dedup.minhashBands(spark, sf)
    time("sigs noop")(sigs.write.format("noop").mode("overwrite").save())
    def explodeBands(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), col("bands"),
        posexplode(col("bands")).as(Seq("band_idx", "band_hash")))
    val bandedA = explodeBands(sigs.repartition(32))
    val bandedB = explodeBands(sigs)
    val joined = bandedA.alias("a").join(broadcast(bandedB.alias("b")),
      col("a.band_idx") === col("b.band_idx") &&
        col("a.band_hash") === col("b.band_hash") && col("a.doc_id") < col("b.doc_id"))
    time("collision count (bhj)")(println("collisions: " + joined.count()))
    val cands = joined.where(graft.functions.GraftExpressions.firstMatchIndex(
        col("a.bands"), col("b.bands")) === col("a.band_idx"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    time("cands count")(println("cands: " + cands.count()))
    val toks = sigs.select(col("doc_id"), col("toks"), size(col("toks")).as("n_toks"))
    val confirmed = cands
      .join(broadcast(toks.select(col("doc_id").as("doc_a"), col("toks").as("toks_a"),
        col("n_toks").as("n_a"))), "doc_a")
      .join(broadcast(toks.select(col("doc_id").as("doc_b"), col("toks").as("toks_b"),
        col("n_toks").as("n_b"))), "doc_b")
      .withColumn("inter", graft.functions.GraftExpressions.intersectSize(col("toks_a"), col("toks_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .where(col("jaccard") >= 0.9)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
    time("confirmed noop")(confirmed.write.format("noop").mode("overwrite").save())
    time("confirmed+orderBy noop")(confirmed.orderBy("doc_a", "doc_b")
      .write.format("noop").mode("overwrite").save())
    val full = graft.engine.Dedup.queries("q_neardup_lsh")(spark, sf)
    println(full.queryExecution.executedPlan.toString.take(4000))
    time("full query noop")(full.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
