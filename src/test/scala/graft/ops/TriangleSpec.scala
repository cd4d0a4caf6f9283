package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: exact triangle counting (q165). Pins (a) brute-force
  * agreement on seeded random graphs (per-vertex counts, not just the
  * total — a wedge double-count or a missed closing direction shows up
  * per corner), (b) hand fixtures with known answers (K4, C5, two
  * triangles sharing an edge), (c) messy input normalization (self
  * loops, duplicate and reversed edges), (d) partition invariance.
  */
class TriangleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], parts: Int = 4): Map[Long, Long] =
    Clustering.triangleCounts(
        spark.createDataset(edges).repartition(parts).toDF("a", "b"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Brute force: distinct canonical edges, count closed triples. */
  private def brute(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val e = edges.filter(p => p._1 != p._2)
      .map(p => (math.min(p._1, p._2), math.max(p._1, p._2))).toSet
    val vs = e.flatMap(p => Seq(p._1, p._2)).toSeq.sorted
    val tris = for {
      x <- vs; y <- vs if y > x && e((x, y))
      z <- vs if z > y && e((x, z)) && e((y, z))
    } yield (x, y, z)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (v, c) => v -> c.size.toLong }
  }

  test("K4: every vertex in 3 triangles; C5: none") {
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    assert(run(k4) === Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
    val c5 = (0L to 4L).map(i => (i, (i + 1) % 5))
    assert(run(c5) === Map.empty)
  }

  test("two triangles sharing an edge: shared corners count 2") {
    // (0,1,2) and (0,1,3)
    val e = Seq((0L, 1L), (0L, 2L), (1L, 2L), (0L, 3L), (1L, 3L))
    assert(run(e) === Map(0L -> 2L, 1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("loops, duplicates and reversed edges are normalized away") {
    val clean = Seq((0L, 1L), (0L, 2L), (1L, 2L))
    val messy = clean ++ Seq((1L, 0L), (2L, 0L), (0L, 0L), (1L, 1L),
      (0L, 1L), (2L, 1L))
    assert(run(messy) === run(clean))
  }

  test("brute-force agreement on seeded random graphs") {
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 5) {
      val n = 20 + trial * 10
      val m = n * 3
      val edges = Seq.fill(m)(
        (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
      val expected = brute(edges)
      assert(run(edges) === expected, s"trial $trial")
      assert(expected.nonEmpty, s"trial $trial degenerate: no triangles")
    }
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(7)
    val edges = Seq.fill(150)((rnd.nextInt(40).toLong, rnd.nextInt(40).toLong))
    assert(run(edges, parts = 1) === run(edges, parts = 13))
  }
}
