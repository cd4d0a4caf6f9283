package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: distributed DBSCAN. Pins (a) exact agreement with a
  * brute-force all-pairs reference on seeded random corpora (roles AND
  * cluster labels, including the deterministic min-label border
  * assignment), (b) eps-boundary inclusivity, (c) minPts=1 (everything
  * core), (d) partition invariance, (e) the grid-blocking recall argument
  * at cell side = eps (pairs straddling cell boundaries).
  */
class DbscanSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** Brute-force reference with identical deterministic semantics. */
  private def brute(pts: Seq[(Long, Long, Long)], eps: Long,
                    minPts: Int): Map[Long, (String, Long)] = {
    val eps2 = eps * eps
    def close(a: (Long, Long, Long), b: (Long, Long, Long)) = {
      val dx = a._2 - b._2; val dy = a._3 - b._3
      dx * dx + dy * dy <= eps2
    }
    val nbrs = pts.map(p => p._1 ->
      pts.filter(q => q._1 != p._1 && close(p, q)).map(_._1).toSet).toMap
    val core = pts.map(_._1).filter(id => nbrs(id).size + 1 >= minPts).toSet
    // components of the core-core eps graph via union-find
    val coreSeq = core.toSeq.sorted
    val idx = coreSeq.zipWithIndex.toMap
    val parent = Array.tabulate(coreSeq.length)(identity)
    def find(x: Int): Int =
      if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
    for (a <- coreSeq; b <- nbrs(a) if core(b) && a < b)
      parent(find(idx(a))) = find(idx(b))
    val label = coreSeq.groupBy(id => find(idx(id)))
      .values.flatMap(g => { val m = g.min; g.map(_ -> m) }).toMap
    pts.map { p =>
      val id = p._1
      if (core(id)) id -> ("core", label(id))
      else {
        val coreNbrs = nbrs(id).filter(core)
        if (coreNbrs.nonEmpty) id -> ("border", coreNbrs.map(label).min)
        else id -> ("noise", -1L)
      }
    }.toMap
  }

  private def run(pts: Seq[(Long, Long, Long)], eps: Long, minPts: Int,
                  parts: Int = 4): Map[Long, (String, Long)] = {
    val df = spark.createDataFrame(pts).toDF("point_id", "x", "y")
      .repartition(parts)
    Dbscan.dbscan(df, eps, minPts).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
  }

  private def corpus(trial: Int, n: Int): Seq[(Long, Long, Long)] = {
    // clustered + noise: ~1/8 uniform noise over a wide domain, the rest
    // around 6 seeded centers with ±12 jitter
    (0 until n).map { i =>
      val h = graft.model.Synth.mix64(trial * 7919L + i)
      if (java.lang.Long.remainderUnsigned(h, 8L) == 0L) {
        (i.toLong,
          java.lang.Long.remainderUnsigned(graft.model.Synth.mix64(h + 1), 4000L),
          java.lang.Long.remainderUnsigned(graft.model.Synth.mix64(h + 2), 4000L))
      } else {
        val c = java.lang.Long.remainderUnsigned(h, 6L)
        val cx = 200L + 600L * c
        val cy = 150L + 550L * java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(c + 99L), 5L)
        (i.toLong,
          cx + java.lang.Long.remainderUnsigned(graft.model.Synth.mix64(h + 3), 25L),
          cy + java.lang.Long.remainderUnsigned(graft.model.Synth.mix64(h + 4), 25L))
      }
    }
  }

  test("seeded clustered corpora match the brute-force reference") {
    for (trial <- 0 until 6) {
      val pts = corpus(trial, 160)
      val want = brute(pts, eps = 15L, minPts = 4)
      val got = run(pts, eps = 15L, minPts = 4)
      assert(got === want, s"trial $trial diverged from brute force")
    }
  }

  test("eps boundary is inclusive and straddles grid cells") {
    // two points exactly eps apart, placed across a cell boundary
    // (x = eps-1 and 2*eps-1 land in adjacent cells)
    val eps = 10L
    val pts = Seq((0L, eps - 1, 5L), (1L, 2 * eps - 1, 5L), (2L, 500L, 500L))
    val got = run(pts, eps, minPts = 2)
    assert(got(0L) === ("core", 0L) && got(1L) === ("core", 0L),
      "dist == eps must count as a neighbor across the cell boundary")
    assert(got(2L) === ("noise", -1L))
  }

  test("minPts=1 makes every point core") {
    val pts = Seq((0L, 0L, 0L), (1L, 100L, 0L), (2L, 101L, 0L))
    val got = run(pts, eps = 5L, minPts = 1)
    assert(got.values.forall(_._1 == "core"))
    assert(got(0L)._2 === 0L && got(1L)._2 === 1L && got(2L)._2 === 1L)
  }

  test("border point takes the MIN cluster among its core neighbors") {
    // two 4-point unit-square cores (minPts=4, eps=2) with a lone point
    // within eps of one corner of each; the point has 3 neighbors
    // including itself (< minPts), so it is border, not core
    val pts = Seq(
      (0L, 0L, 0L), (1L, 1L, 0L), (2L, 0L, 1L), (3L, 1L, 1L),     // cluster 0
      (10L, 5L, 0L), (11L, 6L, 0L), (12L, 5L, 1L), (13L, 6L, 1L), // cluster 10
      (5L, 3L, 0L))                                  // border of both
    val got = run(pts, eps = 2L, minPts = 4)
    assert(got(5L) === ("border", 0L))
    assert(got(10L) === ("core", 10L) && got(13L) === ("core", 10L))
  }

  test("partition invariance") {
    val pts = corpus(99, 200)
    val a = run(pts, eps = 15L, minPts = 4, parts = 1)
    val b = run(pts, eps = 15L, minPts = 4, parts = 13)
    assert(a === b)
  }
}
