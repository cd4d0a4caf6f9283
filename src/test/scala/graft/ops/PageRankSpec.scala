package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth

/** Round-5 q103 operator: deterministic integer PageRank. Pins
  * (a) bit-identical agreement with a driver-side brute force carrying the
  * same integer div/floor chain over seeded random graphs (dangling nodes
  * and sinks included), (b) partitioning invariance (integer sums are
  * order-independent by construction), (c) the dangling-vertex contract
  * (no inflow → exactly the base mass).
  */
class PageRankSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val Scale = 1000000000000L

  /** Driver-side replay of the documented integer recurrence. */
  private def brute(n: Int, edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val odeg = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val base = (Scale * 15L / 100L) / n
    var rank = (0L until n.toLong).map(_ -> Scale / n).toMap
    for (_ <- 1 to iters) {
      val inflow = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _) => rank(s) / odeg(s) }.sum
      }
      rank = (0L until n.toLong).map { v =>
        v -> (base + 85L * inflow.getOrElse(v, 0L) / 100L)
      }.toMap
    }
    rank
  }

  test("seeded random graphs match the integer brute force bit for bit") {
    for (trial <- 0 until 8) {
      val n = 16 + (Synth.mix64(trial.toLong).toInt & 15) // 16..31
      // ~3 out-edges per node, but node 0 is forced DANGLING (no out edges)
      // and node 1 is made a pure source (no in edges land on it below)
      val edges = (for {
        s <- 1 until n; k <- 0 until 3
        d = java.lang.Long.remainderUnsigned(
          Synth.mix64(trial * 7919L + s * 131L + k), (n - 2).toLong) + 2L
      } yield (s.toLong, d)).toSeq
      val verts = spark.range(0, n).select(col("id"))
      val edf = edges.toDF("src", "dst")
      val got = Clustering.pageRank(verts, edf, iters = 4)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = brute(n, edges, 4)
      assert(got === want, s"trial $trial (n=$n, ${edges.length} edges)")
      // dangling node 0: base mass only after every iteration
      assert(got(0L) === (Scale * 15L / 100L) / n)
    }
  }

  test("partitioning invariance: 1-partition and 16-partition runs agree") {
    val n = 40
    val edges = (for { s <- 0 until n; k <- 0 until 2 } yield
      (s.toLong, java.lang.Long.remainderUnsigned(
        Synth.mix64(s * 31L + k), n.toLong))).toDF("src", "dst")
    val verts = spark.range(0, n).select(col("id"))
    val a = Clustering.pageRank(verts, edges.repartition(1), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = Clustering.pageRank(verts, edges.repartition(16), iters = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a === b)
  }

  test("zero iterations returns the uniform initial mass") {
    val verts = spark.range(0, 10).select(col("id"))
    val edges = Seq((0L, 1L)).toDF("src", "dst")
    val got = Clustering.pageRank(verts, edges, iters = 0).collect()
    assert(got.length === 10 && got.forall(_.getLong(1) === Scale / 10))
  }
}
