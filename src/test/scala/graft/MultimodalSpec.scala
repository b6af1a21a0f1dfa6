package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.engine.Multimodal
import graft.engine.Multimodal.{MediaRecord, MediaFeatures}

/** The Dataset half of the multimodal path: binary payloads through the
  * per-partition decode contract (decodeStub is the documented
  * deterministic fake — the Spark-side plumbing is what's under test).
  */
class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val recs = Seq(
    MediaRecord(1L, "jpeg-ish-bytes".getBytes("UTF-8"), "image"),
    MediaRecord(2L, Array[Byte](0, 1, 2, 3, 4, 5), "audio"),
    MediaRecord(3L, Array.emptyByteArray, "video"))

  test("extractFeatures is a map-only, deterministic, per-record transform") {
    val ds = spark.createDataset(recs).repartition(3)
    val out1 = Multimodal.extractFeatures(ds).collect().sortBy(_.media_id)
    val out2 = Multimodal.extractFeatures(ds.repartition(2)).collect().sortBy(_.media_id)
    assert(out1.toSeq == out2.toSeq) // partitioning must not change results
    assert(out1.map(_.media_id).toSeq == Seq(1L, 2L, 3L))
    assert(out1.map(_.n_bytes).toSeq == recs.sortBy(_.media_id).map(_.payload.length.toLong))
    assert(out1.forall(f => f.width >= 64 && f.height >= 64 && f.n_frames >= 1))
  }

  test("sampleFrames fans out every Nth frame, deterministically across partitionings") {
    val ds = spark.createDataset(recs)
    val frames = Multimodal.sampleFrames(ds, 7).collect().sortBy(f => (f.media_id, f.frame_idx))
    val expectedCounts = recs.map(r => (r.media_id,
      (0 until Multimodal.decodeStub(r).n_frames by 7).size)).toMap
    assert(frames.groupBy(_.media_id).view.mapValues(_.length).toMap == expectedCounts)
    assert(frames.forall(f => f.frame_idx % 7 == 0))
    val again = Multimodal.sampleFrames(ds.repartition(3), 7).collect()
      .sortBy(f => (f.media_id, f.frame_idx))
    assert(frames.map(f => (f.media_id, f.frame_idx, f.payload.toSeq)).toSeq ==
      again.map(f => (f.media_id, f.frame_idx, f.payload.toSeq)).toSeq)
  }

  test("resizeFrames rewrites dimensions and keeps the frame identity") {
    val ds = spark.createDataset(recs)
    val resized = Multimodal.resizeFrames(Multimodal.sampleFrames(ds, 11), 224, 224).collect()
    assert(resized.nonEmpty)
    assert(resized.forall(f => f.width == 224 && f.height == 224))
  }

  test("graded q_multimodal_decode: one row per doc, deterministic, all-scalar schema") {
    val df1 = Multimodal.queries("q_multimodal_decode")(spark, TestSpark.sfDir)
    val nDocs = graft.engine.Tables.documents(spark, TestSpark.sfDir).count()
    assert(df1.count() == nDocs)
    assert(df1.schema.fields.forall(f => !f.dataType.typeName.startsWith("array") &&
      f.dataType.typeName != "binary"), df1.schema.treeString)
    val r1 = df1.collect().map(_.toSeq).toSeq
    val r2 = Multimodal.queries("q_multimodal_decode")(spark, TestSpark.sfDir)
      .collect().map(_.toSeq).toSeq
    assert(r1 == r2)
  }

  test("graded q_multimodal_frames: fan-out count is sum of ceil(n_frames/30) over docs") {
    val frames = Multimodal.queries("q_multimodal_frames")(spark, TestSpark.sfDir)
    val docs = graft.engine.Tables.documents(spark, TestSpark.sfDir)
      .select("doc_id", "text", "lang").collect()
    val want = docs.map { r =>
      val f = Multimodal.decodeStub(MediaRecord(r.getLong(0),
        r.getString(1).getBytes("UTF-8"), r.getString(2)))
      (0 until f.n_frames by 30).size.toLong
    }.sum
    assert(frames.count() == want)
    assert(frames.schema.fields.forall(f => f.dataType.typeName != "binary"),
      frames.schema.treeString)
  }

  test("decodeStub checksum depends on payload bytes") {
    val a = Multimodal.decodeStub(MediaRecord(1L, "abc".getBytes, "image"))
    val b = Multimodal.decodeStub(MediaRecord(1L, "abd".getBytes, "image"))
    assert(a.checksum != b.checksum)
    assert(a == Multimodal.decodeStub(MediaRecord(1L, "abc".getBytes, "image")))
  }
}
