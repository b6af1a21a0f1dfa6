package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.Quantize

/** Int8 scalar quantization: code range, reconstruction-error bound,
  * degenerate (constant) vectors, determinism, and the map-only plan.
  */
class QuantizeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val out = Quantize.queries("q_embed_quantize")(spark, TestSpark.sfDir)
    .collect().toSeq

  test("codes are within [0, 255] and one per dimension") {
    assert(out.nonEmpty)
    out.foreach { r =>
      val codes = r.getAs[String]("codes").split(",").map(_.toLong)
      assert(codes.length == 64, s"vec ${r.getLong(0)}: ${codes.length} codes")
      assert(codes.forall(c => c >= 0 && c <= 255), s"vec ${r.getLong(0)}: out-of-range code")
    }
  }

  test("midpoint reconstruction error is within the quantization bound") {
    // Per component the midpoint is within scale/2 = (mx-mn)/510 of the
    // original, so the L2 error is at most sqrt(dim)*(mx-mn)/510 (plus
    // rounding slack).
    out.foreach { r =>
      val (mn, mx, err) = (r.getAs[Double]("qmin"), r.getAs[Double]("qmax"),
        r.getAs[Double]("recon_err"))
      val bound = math.sqrt(64) * (mx - mn) / 510.0 + 1e-6
      assert(err <= bound, s"vec ${r.getLong(0)}: err $err > bound $bound")
    }
  }

  test("a constant vector quantizes to all-zero codes with zero error") {
    val df = Seq((1L, Seq.fill(64)(2.5f))).toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_q_").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val r = Quantize.queries("q_embed_quantize")(spark, dir).collect().head
    assert(r.getAs[String]("codes").split(",").forall(_ == "0"))
    assert(r.getAs[Double]("recon_err") == 0.0)
    assert(r.getAs[Double]("qmin") == 2.5 && r.getAs[Double]("qmax") == 2.5)
  }

  test("quantization is deterministic and map-only (no exchange below the sort)") {
    val again = Quantize.queries("q_embed_quantize")(spark, TestSpark.sfDir).collect().toSeq
    assert(again == out)
    val plan = Quantize.queries("q_embed_quantize")(spark, TestSpark.sfDir)
      .queryExecution.executedPlan.toString
    // The only exchange allowed is the final global orderBy's range
    // partitioning; the quantization itself must not shuffle.
    val shuffles = "Exchange".r.findAllIn(plan).size
    assert(shuffles <= 1, plan)
  }
}
