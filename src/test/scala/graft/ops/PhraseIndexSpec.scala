package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Positional phrase search (q141). Pins (a) brute-force equality
  * (substring-of-token-sequence semantics) on hand documents, (b) the
  * (count DESC, lexicographic) top-K tiebreak, (c) overlapping
  * occurrences all count, (d) partition invariance.
  */
class PhraseIndexSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], topK: Int)
      : Map[(String, Long), Long] = {
    val tris = docs.flatMap { case (id, t) =>
      val ts = t.split(" ").filter(_.nonEmpty)
      ts.sliding(3).filter(_.size == 3).map(w => (w.mkString(" "), id))
    }
    val counts = tris.groupBy(_._1).map { case (p, l) => p -> l.size }
    val top = counts.toSeq.sortBy { case (p, n) => (-n, p) }.take(topK)
      .map(_._1).toSet
    tris.filter(t => top(t._1)).groupBy(identity)
      .map { case (k, l) => k -> l.size.toLong }
  }

  private def run(docs: Seq[(Long, String)], topK: Int, parts: Int = 4)
      : Map[(String, Long), Long] =
    TextOps.phraseMatches(docs.toDF("doc_id", "text").repartition(parts),
      topK)
      .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
      .toMap

  test("matches brute force on hand documents") {
    val docs = Seq(
      (1L, "the red fox ran and the red fox hid"),
      (2L, "a blue bird saw the red fox run"),
      (3L, "the red cat sat on a warm mat"))
    assert(run(docs, 2) === brute(docs, 2))
  }

  test("overlapping occurrences all count") {
    val docs = Seq((1L, "go go go go go end"),
      (2L, "go go go stop here now"))
    val got = run(docs, 1)
    // "go go go" occurs 3x in doc 1 (positions 0,1,2) and 1x in doc 2
    assert(got === Map(("go go go", 1L) -> 3L, ("go go go", 2L) -> 1L))
    assert(got === brute(docs, 1))
  }

  test("count-then-lexicographic tiebreak") {
    val docs = Seq((1L, "z z z"), (2L, "a a a"), (3L, "m m m"))
    // all trigrams occur once: lexicographic order decides the top 2
    assert(run(docs, 2).keySet.map(_._1) === Set("a a a", "m m m"))
  }

  test("partition invariance") {
    val rnd = new scala.util.Random(61)
    val docs = (0L until 150L).map(i =>
      (i, (0 until 25).map(_ => s"t${rnd.nextInt(20)}").mkString(" ")))
    assert(run(docs, 5, 3) === run(docs, 5, 17))
  }
}
