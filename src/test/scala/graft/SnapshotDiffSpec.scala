package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.engine.{Assembly, Tables}

/** Snapshot diff contracts: phase-1 pruning finds exactly the touched
  * partitions, the row-level diff matches an independent in-JVM diff,
  * and pruned ≡ unpruned (the prune is a cost lever, never a result
  * change).
  */
class SnapshotDiffSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // The graded key's construction, small enough to brute-force.
  private def v1 = Tables.documents(spark, TestSpark.sfDir)
    .select($"doc_id", pmod($"doc_id", lit(16L)).as("part"), $"text")
  private def v2 = v1.where($"doc_id" % 8 =!= 2)
    .withColumn("text", when($"doc_id" % 4 === 1,
      concat($"text", lit(" v2"))).otherwise($"text"))
    .unionByName(v1.where($"doc_id" % 16 === 6)
      .select(($"doc_id" + 400000L).as("doc_id"), $"part", $"text"))
  private def ck = Assembly.orderHash($"doc_id") * length($"text").cast("long")

  test("changedPartitionValues finds exactly the touched partitions") {
    val got = Tables.changedPartitionValues(v1, v2, "part", ck)
      .as[Long].collect().toSet
    // deletes → 2,10; updates → 1,5,9,13; inserts → 6.
    assert(got == Set(1L, 2L, 5L, 6L, 9L, 10L, 13L))
  }

  test("snapshotDiff ≡ in-JVM brute force, and pruned ≡ unpruned") {
    val a = v1.select($"part", $"doc_id", $"text").as[(Long, Long, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val b = v2.select($"part", $"doc_id", $"text").as[(Long, Long, String)]
      .collect().map(r => (r._1, r._2) -> r._3).toMap
    val expect = (a.keySet ++ b.keySet).flatMap { k =>
      (a.get(k), b.get(k)) match {
        case (None, Some(_)) => Some((k._1, k._2, "added"))
        case (Some(_), None) => Some((k._1, k._2, "removed"))
        case (Some(x), Some(y)) if x.length != y.length => Some((k._1, k._2, "changed"))
        case _ => None
      }
    }
    val pruned = Tables.snapshotDiff(v1, v2, "doc_id", "part", ck)
      .as[(Long, Long, String)].collect().toSet
    val unpruned = Tables.snapshotDiff(v1, v2, "doc_id", "part", ck,
      pruneUnchanged = false).as[(Long, Long, String)].collect().toSet
    assert(pruned == expect, s"pruned diff differs (got ${pruned.size}, want ${expect.size})")
    assert(unpruned == expect, "unpruned diff differs")
    assert(expect.exists(_._3 == "added") && expect.exists(_._3 == "removed") &&
      expect.exists(_._3 == "changed"), "fixture must exercise all three statuses")
  }

  test("identical snapshots: no changed partitions, empty diff") {
    assert(Tables.changedPartitionValues(v1, v1, "part", ck).isEmpty)
    assert(Tables.snapshotDiff(v1, v1, "doc_id", "part", ck).isEmpty)
  }
}
