package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom.Cells

/** Adaptive quadtree leaves (q128). Pins (a) equality with a literal
  * recursive top-down splitter on a skewed hand distribution, (b) the
  * leaf invariants — within cap or at maxLevel; parents of deep leaves
  * overflow the cap, (c) conservation (leaf counts sum to the corpus),
  * (d) partition invariance.
  */
class QuadtreeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Base = 10
  private val Max = 16
  private val Cap = 8L

  /** Literal recursion: split while over cap and above maxLevel. */
  private def brute(pts: Seq[(Double, Double)])
      : Map[(Int, Long), Long] = {
    val acc = scala.collection.mutable.Map.empty[(Int, Long), Long]
    def go(level: Int, pts: Seq[(Double, Double)]): Unit = {
      val byCell = pts.groupBy { case (x, y) => Cells.encode(x, y, level) }
      byCell.foreach { case (cell, members) =>
        if (members.size <= Cap || level == Max)
          acc((level, cell)) = acc.getOrElse((level, cell), 0L) + members.size
        else go(level + 1, members)
      }
    }
    go(Base, pts)
    acc.toMap
  }

  private def run(pts: Seq[(Double, Double)], parts: Int = 4)
      : Map[(Int, Long), Long] =
    SpatialOps.quadtreeLeaves(
      pts.zipWithIndex.map { case ((x, y), i) => (i.toLong, x, y) }
        .toDF("id", "x", "y").repartition(parts),
      "id", "x", "y", Base, Max, Cap)
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap

  private def skewed: Seq[(Double, Double)] = {
    val rnd = new scala.util.Random(7)
    // 300 points packed into a ~30 m hot block + 60 spread over ~100 km
    val hot = Seq.fill(300)((500.0 + rnd.nextDouble() * 30,
      500.0 + rnd.nextDouble() * 30))
    val cold = Seq.fill(60)((rnd.nextDouble() * 100000,
      rnd.nextDouble() * 100000))
    hot ++ cold
  }

  test("equals the literal recursive splitter on a skewed distribution") {
    assert(run(skewed) === brute(skewed))
  }

  test("leaf invariants and conservation") {
    val got = run(skewed)
    assert(got.values.sum === skewed.size.toLong)
    got.foreach { case ((level, _), n) =>
      assert(level == Max || n <= Cap, s"leaf at $level holds $n > $Cap")
    }
    // the hot block must be driven to maxLevel, the sparse ocean must not
    assert(got.keys.exists(_._1 == Max))
    assert(got.keys.exists(_._1 == Base))
  }

  test("a uniform sub-cap corpus stays at baseLevel") {
    val pts = (0 until 5).map(i => (i * 100000.0 + 50, 50.0))
    val got = run(pts)
    assert(got.keys.forall(_._1 == Base))
  }

  test("partition invariance") {
    assert(run(skewed, parts = 3) === run(skewed, parts = 17))
  }
}
