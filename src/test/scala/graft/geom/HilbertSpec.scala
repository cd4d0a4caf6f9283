package graft.geom

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Hilbert index (q130). Pins (a) bijectivity on the full 8-bit grid,
  * (b) THE Hilbert property — consecutive indices are grid neighbors
  * (Manhattan distance exactly 1), which Morton order violates at every
  * seam, (c) d2xy/xy2d round-trip, (d) expression ≡ kernel through a
  * DataFrame, (e) hilbertWrite prunes range reads on both dimensions.
  */
class HilbertSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("bijective on the 256x256 grid") {
    val ds = for (x <- 0L until 256L; y <- 0L until 256L)
      yield Cells.hilbert(x, y, 8)
    assert(ds.toSet.size === 65536)
    assert(ds.min === 0L && ds.max === 65535L)
  }

  test("consecutive indices are always grid neighbors (Morton is not)") {
    val byD = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (Cells.hilbert(x, y, 6), (x, y))).sortBy(_._1).map(_._2)
    val gaps = byD.sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
      math.abs(x2 - x1) + math.abs(y2 - y1)
    }.toSeq
    assert(gaps.forall(_ === 1L))
    // contrast: Morton has seams (consecutive codes jump across the grid)
    val mGaps = (for (x <- 0L until 64L; y <- 0L until 64L)
      yield (Cells.interleave(x, y), (x, y))).sortBy(_._1).map(_._2)
      .sliding(2).map { case Seq((x1, y1), (x2, y2)) =>
        math.abs(x2 - x1) + math.abs(y2 - y1)
      }.toSeq
    assert(mGaps.exists(_ > 1L))
  }

  test("d2xy round-trips xy2d") {
    for (d <- 0L until 4096L)
      assert(Cells.hilbert(Cells.hilbertInv(d, 6)._1,
        Cells.hilbertInv(d, 6)._2, 6) === d)
  }

  test("expression equals the kernel through a DataFrame") {
    val rows = (0L until 500L).map(i => (i, i * 31 % 256, i * 17 % 256))
    val got = rows.toDF("id", "x", "y")
      .select(col("id"), graft.expr.GeomFunctions.hilbert_index(
        col("x"), col("y"), lit(8)).as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    rows.foreach { case (i, x, y) =>
      assert(got(i) === Cells.hilbert(x, y, 8))
    }
  }

  test("hilbertWrite prunes range reads on both dimensions") {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      "graft_hilbert_spec").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    val df = (0L until 4000L).map(i => (i, (i * 2654435761L) % 1000L))
      .toDF("a", "b")
    graft.sources.StatsManifest.hilbertWrite(df, dir, "a", "b", 16)
    val (ra, oa, ta) = graft.sources.StatsManifest
      .prunedRead(spark, dir, "a", 100L, 200L)
    assert(ra.count() === 101L && oa < ta)
    val (rb, ob, tb) = graft.sources.StatsManifest
      .prunedRead(spark, dir, "b", 0L, 50L)
    assert(rb.count() ===
      (0L until 4000L).count(i => (i * 2654435761L) % 1000L <= 50L).toLong
      && ob < tb)
  }
}
