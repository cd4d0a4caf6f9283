package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** MosaicAgg (q87): brute-force per-pixel floor-mean equality, partition
  * invariance (merge path), mismatched-size payloads skipped.
  */
class MosaicSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def img(cell: Long, seed: Int, w: Int = 4, h: Int = 4) = {
    val px = Array.tabulate(w * h * 3)(i => ((i * 31 + seed * 97) % 256).toByte)
    (cell, ImageCodec.encodeRaw(px), w, h, "raw")
  }

  private def brute(cells: Seq[(Long, Array[Byte])]): Map[Long, (Long, Long, Long)] =
    cells.groupBy(_._1).map { case (c, imgs) =>
      val n = imgs.size.toLong
      val sums = new Array[Long](48)
      imgs.foreach { case (_, px) =>
        for (j <- 0 until 48) sums(j) += px(j) & 0xFF
      }
      var s = 0L; var ws = 0L
      for (j <- 0 until 48) { val a = sums(j) / n; s += a; ws += (j + 1) * a }
      c -> (n, s, ws)
    }

  test("per-cell floor-mean matches brute force at any partitioning") {
    val rows = (0 until 40).map(i => img(cell = (i % 5).toLong, seed = i))
    val raw = rows.map { case (c, bytes, _, _, _) =>
      (c, ImageCodec.decode(bytes, "raw", 4, 4))
    }
    val expect = brute(raw)
    for (parts <- Seq(1, 7)) {
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, parts))
        .toDF("cell_id", "bytes", "w", "h", "fmt")
      val got = ImageOps.mosaic(spark, df, size = 48).collect()
        .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3)))
        .toMap
      assert(got === expect, s"parts=$parts")
    }
  }

  test("mismatched-size payloads are skipped, not fatal") {
    val df = (Seq(img(1L, 0)) :+ img(1L, 1, w = 8, h = 8))
      .toDF("cell_id", "bytes", "w", "h", "fmt")
    val out = ImageOps.mosaic(spark, df, size = 48).collect()
    assert(out.length === 1 && out.head.getLong(1) === 1L)
  }
}
