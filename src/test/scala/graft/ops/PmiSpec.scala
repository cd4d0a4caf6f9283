package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Skip-gram PMI (q139). Pins (a) brute-force pair counts and PMI on
  * hand documents, (b) distance-1/2 window semantics (no distance-3
  * pairs), (c) min-support filtering with marginals over ALL pairs,
  * (d) partition invariance.
  */
class PmiSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[String], minCount: Long)
      : Map[(String, String), (Long, Long)] = {
    val pairs = docs.flatMap { t =>
      val ts = t.split(" ").filter(_.nonEmpty)
      (0 until ts.length).flatMap(i =>
        Seq(1, 2).flatMap(d =>
          if (i + d < ts.length) Some((ts(i), ts(i + d))) else None))
    }
    val counts = pairs.groupBy(identity).map { case (p, l) => p -> l.size.toLong }
    val n = counts.values.sum
    val cl = counts.groupBy(_._1._1).map { case (a, m) => a -> m.values.sum }
    val cr = counts.groupBy(_._1._2).map { case (b, m) => b -> m.values.sum }
    counts.filter(_._2 >= minCount).map { case ((a, b), c) =>
      (a, b) -> ((c, math.round(
        math.log((c * n).toDouble / (cl(a) * cr(b)).toDouble) * 1e9)))
    }
  }

  private def run(docs: Seq[String], minCount: Long, parts: Int = 4)
      : Map[(String, String), (Long, Long)] =
    TextOps.pmiPairs(docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text").repartition(parts), minCount)
      .collect().map(r => (r.getString(0), r.getString(1)) -> (
        (r.getLong(2), r.getLong(3)))).toMap

  test("matches brute force on hand documents") {
    val docs = Seq(
      "the quick fox and the lazy dog and the quick fox",
      "the quick fox jumps while the lazy dog sleeps",
      "a b a b a b a b a b")
    assert(run(docs, 2L) === brute(docs, 2L))
  }

  test("window semantics: distance 3 never pairs") {
    val docs = Seq.fill(6)("w x y z")
    val got = run(docs, 2L)
    assert(got.contains(("w", "x")) && got.contains(("w", "y")))
    assert(!got.contains(("w", "z")))
    assert(got === brute(docs, 2L))
  }

  test("min support filters pairs but not marginals") {
    val docs = Seq.fill(5)("p q") ++ Seq("p r")
    val got = run(docs, 5L)
    assert(got.keySet === Set(("p", "q")))
    // PMI of (p,q) reflects p's marginal including the (p,r) pair
    assert(got === brute(docs, 5L))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(47)
    val docs = (0 until 200).map(_ =>
      (0 until 30).map(_ => s"t${rnd.nextInt(40)}").mkString(" "))
    assert(run(docs, 3L, 3) === run(docs, 3L, 17))
  }
}
