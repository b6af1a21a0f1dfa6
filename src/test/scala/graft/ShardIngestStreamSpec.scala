package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.Streams
import graft.engine.Containers

/** Incremental shard ingest (Streams.shardIngestStream): the binaryFile
  * file-stream source over a landing directory of real `.warc.gz`
  * shards. What the spec pins:
  *  - parity: streamed rows ≡ the batch parse of the same files;
  *  - exactly-once discovery: restarting from the same checkpoint after
  *    MORE shards landed processes ONLY the new files (no re-parse, no
  *    duplicate rows for the old ones);
  *  - a shard failing the strict parse emits one visible
  *    `warc_type = "corrupt"` sentinel row rather than vanishing.
  */
class ShardIngestStreamSpec extends AnyFunSuite {
  private lazy val spark = Streams.sessionConf(TestSpark.spark)

  private def writeShard(dir: java.io.File, shard: Int, ids: Seq[Long]): Unit =
    java.nio.file.Files.write(
      new java.io.File(dir, f"shard-$shard%03d.warc.gz").toPath,
      Containers.warcShardBytes(ids)) // the production shard layout

  private def expectedRows(byShard: Map[Int, Seq[Long]]): Seq[(Long, Int, String, Long, Long)] =
    byShard.toSeq.flatMap { case (shard, ids) =>
      Containers.parseWarcGz(Containers.warcShardBytes(ids)).get.zipWithIndex.map {
        case (r, i) => (shard.toLong, i, r.warcType, r.bodyLen, r.bodySum)
      }
    }

  test("discovery is exactly-once across restart; new files only; corrupt shard is visible") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-shard-in").toFile
    val outDir = java.nio.file.Files.createTempDirectory("graft-shard-out").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-shard-ck").toString

    def run(): Unit = {
      val q = Streams.shardIngestStream(spark, dir.toString, maxFilesPerTrigger = Some(1))
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    def got(): Seq[(Long, Int, String, Long, Long)] =
      spark.read.parquet(outDir).as[(Long, Int, String, Long, Long)].collect().toSeq

    val first = Map(0 -> Seq(1L, 5L, 10L), 1 -> Seq(2L))
    first.foreach { case (s, ids) => writeShard(dir, s, ids) }
    run()
    val g1 = got()
    assert(g1.sorted == expectedRows(first).sorted) // parity AND no duplicates
    assert(g1.exists(_._3 == "warcinfo") && g1.exists(_._3 == "response"))

    // Two more shards land; the restarted stream must process ONLY them.
    val second = Map(2 -> Seq(7L, 8L, 9L), 3 -> Seq(4L))
    second.foreach { case (s, ids) => writeShard(dir, s, ids) }
    run()
    assert(got().sorted == expectedRows(first ++ second).sorted)

    // A corrupt shard is refused visibly: one sentinel row, exactly once.
    java.nio.file.Files.write(
      new java.io.File(dir, "shard-099.warc.gz").toPath,
      "definitely not gzip".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    run()
    val g3 = got()
    assert(g3.count(_ == ((99L, -1, "corrupt", 0L, 0L))) == 1)
    assert(g3.sorted == (expectedRows(first ++ second) :+
      ((99L, -1, "corrupt", 0L, 0L))).sorted)
  }
}
