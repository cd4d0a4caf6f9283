package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: exact Jaccard similarity join via prefix filtering (q166).
  * Pins (a) brute-force agreement on seeded corpora — the prefix filter
  * must be COMPLETE (missed pairs are the classic AllPairs off-by-one),
  * (b) the inclusive integer threshold boundary, (c) identical docs at
  * J = 1.0 regardless of word order / duplicate words, (d) prefix length
  * 1 at t = 1 (only the single rarest word blocks), (e) partition
  * invariance.
  */
class JaccardJoinSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], num: Long, den: Long,
                  parts: Int = 4): Set[(Long, Long, Long)] =
    TextOps.jaccardJoin(
        spark.createDataset(docs).repartition(parts).toDF("doc_id", "text"),
        num, den)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def brute(docs: Seq[(Long, String)], num: Long,
                    den: Long): Set[(Long, Long, Long)] = {
    val sets = docs.map(d => d._1 -> d._2.split(" ", -1).toSet).toMap
    (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a < b
      ov = (sets(a) & sets(b)).size.toLong
      if ov * (den + num) >= num * (sets(a).size + sets(b).size)
    } yield (a, b, ov)).toSet
  }

  test("brute-force completeness on seeded corpora, several thresholds") {
    val rnd = new scala.util.Random(11)
    val vocab = (0 until 30).map(i => s"w$i")
    val base = (0L until 60L).map { i =>
      val n = 3 + rnd.nextInt(8)
      i -> Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // planted near-dups (one word appended) so every threshold tier has
    // true pairs — a pure random corpus has none at t ≥ 0.7
    val docs = base ++ (0L until 20L).map(i =>
      (100L + i) -> (base(i.toInt)._2 + " " + vocab(rnd.nextInt(vocab.size))))
    for ((num, den) <- Seq((1L, 2L), (7L, 10L), (19L, 20L))) {
      val expected = brute(docs, num, den)
      assert(run(docs, num, den) === expected, s"t=$num/$den")
      assert(expected.nonEmpty, s"degenerate fixture at t=$num/$den")
    }
  }

  test("identical word sets join at 1.0 despite order and duplicates") {
    val docs = Seq(1L -> "a b c", 2L -> "c b a", 3L -> "a a b c c", 4L -> "a b")
    val out = run(docs, 1L, 1L)
    assert(out === Set((1L, 2L, 3L), (1L, 3L, 3L), (2L, 3L, 3L)))
  }

  test("inclusive integer boundary: J exactly at threshold is kept") {
    // |a|=3, |b|=3, overlap=2 → J = 2/4 = 1/2 exactly
    val docs = Seq(1L -> "x y z", 2L -> "x y q")
    assert(run(docs, 1L, 2L) === Set((1L, 2L, 2L)))
    assert(run(docs, 51L, 100L) === Set.empty)
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(5)
    val vocab = (0 until 20).map(i => s"v$i")
    val docs = (0L until 40L).map { i =>
      i -> Seq.fill(4 + rnd.nextInt(5))(vocab(rnd.nextInt(vocab.size)))
        .mkString(" ")
    }
    assert(run(docs, 3L, 5L, parts = 1) === run(docs, 3L, 5L, parts = 13))
  }
}
