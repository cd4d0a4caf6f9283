package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth
import graft.ops.SpatialOps

/** Streaming ingest agrees with the batch path on the same rows. */
class StreamingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("file-source ingest assigns identical cells to the batch path") {
    val nB = 8L
    val in = java.nio.file.Files.createTempDirectory("stream-in").toString
    val out = java.nio.file.Files.createTempDirectory("stream-out").toString
    val cp = java.nio.file.Files.createTempDirectory("stream-cp").toString
    val images = Synth.images(spark, 128L, nB).toDF
    images.write.mode("overwrite").parquet(in)

    val q = StreamingIngest.fileIngest(spark, in, out, cp, nB).start()
    q.awaitTermination(120000)

    val streamed = spark.read.parquet(out)
      .select("image_id", "cell_id").orderBy("image_id").collect()
    val batch = SpatialOps.imageCells(Synth.withAnchors(images, nB))
      .select("image_id", "cell_id").orderBy("image_id").collect()
    assert(streamed.length === 128)
    assert(streamed.map(_.toString).toSeq === batch.map(_.toString).toSeq)
  }

  test("watermarked windowed per-cell counts over a timestamped stream") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(String, Long, java.sql.Timestamp)]
    val df = mem.toDF().toDF("image_id", "phash", "event_time")
    val counts = StreamingIngest.cellCounts(df, 8L)
    val q = counts.writeStream.format("memory").queryName("cellcounts")
      .outputMode("append").start()
    val t0 = java.sql.Timestamp.valueOf("2026-01-01 00:00:10")
    val late = java.sql.Timestamp.valueOf("2026-01-01 00:10:00")
    mem.addData((0 until 32).map(i => (f"img$i%04d", Synth.mix64(i.toLong), t0)): _*)
    q.processAllAvailable()
    // advance watermark far past the first window so it closes
    mem.addData(("imgZZ", 1L, late))
    q.processAllAvailable()
    val rows = spark.sql("select * from cellcounts").collect()
    q.stop()
    assert(rows.nonEmpty)
    assert(rows.map(_.getLong(2)).sum === 32L) // first window emitted, late row's window still open
  }

  test("stateful streaming dedup suppresses duplicates across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, String)]
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = StreamingIngest.dedupStream(docs)
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode("append").start()
    // batch 1: in-batch duplicate (docs 1 and 2 share text)
    mem.addData((1L, "alpha beta"), (2L, "alpha beta"), (3L, "gamma"))
    q.processAllAvailable()
    // batch 2: cross-batch duplicate of "gamma" + one new text
    mem.addData((4L, "gamma"), (5L, "delta"))
    q.processAllAvailable()
    val rows = spark.sql("select keep_doc_id from dedupstream")
      .collect().map(_.getLong(0)).sorted.toSeq
    q.stop()
    // first arrivals only: min-id in batch for in-batch dups, earlier batch
    // wins across batches
    assert(rows === Seq(1L, 3L, 5L))
  }
}
