package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** Corpus-unigram-LM score sanity beyond the hash oracle: the score must
  * actually RANK atypical text above typical text (the filtering use), and
  * reduce to the corpus entropy on the corpus itself.
  */
class LmScoreSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("rare-vocabulary docs score strictly higher than common-vocabulary docs") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-lm").toString
    // 20 docs of corpus-typical tokens, one doc of singleton gibberish.
    val docs = ((1 to 20).map(i => (i.toLong, "the data table join query")) :+
      (99L, "zxqv wkjy qqpl mmzn vvrt")).toDF("doc_id", "text")
    docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("q_lm_score")(spark, tmp)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val typical = out.filterNot(_._1 == 99L).values
    assert(typical.forall(_ < out(99L)),
      s"gibberish doc must out-score every typical doc: $out")
    // All-typical docs share one score (identical token multiset).
    assert(typical.toSet.size == 1)
  }

  test("weighted mean doc NLL equals corpus token entropy (consistency)") {
    // Σ_d n_d·nll_d / Σ_d n_d = ln N − Σ_t c_t·ln c_t / N — the corpus
    // unigram entropy; pins that the per-doc decomposition loses nothing.
    val out = SparkEntry.queries("q_lm_score")(spark, TestSpark.sfDir)
      .agg((sum(col("n_tokens") * col("nll")) / sum(col("n_tokens"))).as("w"))
      .head().getDouble(0)
    val counts = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select(explode(split(col("text"), " ")).as("t")).where(col("t") =!= "")
      .groupBy("t").agg(count(lit(1)).as("c"))
    val ent = counts.agg(
      (log(sum(col("c"))) - sum(col("c") * log(col("c"))) / sum(col("c"))).as("h"))
      .head().getDouble(0)
    assert(math.abs(out - ent) < 1e-4, s"weighted NLL $out vs entropy $ent")
  }
}
