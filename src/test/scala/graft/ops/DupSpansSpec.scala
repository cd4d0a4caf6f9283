package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Exact-substring span dedup (q125). Pins (a) coverage equality against a
  * brute-force duplicated-substring scan on hand corpora, (b) the planted
  * cross-doc copy, (c) within-doc repetition, (d) the gap-merge boundary
  * (separate spans iff the marked-position gap exceeds L), (e) partition
  * invariance.
  */
class DupSpansSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val L = 12

  /** Brute-force character coverage: union of [p, p+L-1] over every
    * position p whose exact L-gram occurs >= 2 times in the corpus.
    */
  private def bruteCover(docs: Seq[(Long, String)]): Map[Long, Set[Int]] = {
    val counts = scala.collection.mutable.Map.empty[String, Int]
    for ((_, t) <- docs; p <- 0 to t.length - L)
      counts(t.substring(p, p + L)) = counts.getOrElse(t.substring(p, p + L), 0) + 1
    docs.map { case (id, t) =>
      id -> (0 to t.length - L).filter(p => counts(t.substring(p, p + L)) >= 2)
        .flatMap(p => (p + 1) to (p + L)).toSet // 1-based chars
    }.toMap.filter(_._2.nonEmpty)
  }

  private def opCover(docs: Seq[(Long, String)]): Map[Long, Set[Int]] =
    TextOps.dupSpans(docs.toDF("doc_id", "text"), L).collect()
      .groupBy(_.getLong(0))
      .map { case (id, rs) =>
        id -> rs.flatMap(r => r.getInt(1) to r.getInt(2)).toSet
      }

  test("roll hash mode emits spans identical to md5 mode") {
    // dup detection sees only gram EQUALITY, so the production rolling
    // hash must reproduce the md5-mode spans exactly (r6: the ≥10× mode)
    val rnd = new scala.util.Random(47)
    val base = (0 until 30).map(i =>
      (i.toLong, (0 until 80).map(_ => ('a' + rnd.nextInt(6)).toChar).mkString))
    val docs = base ++ Seq(
      (100L, base(3)._2.substring(10, 50) + "xyzqw" + base(7)._2.take(30)),
      (101L, "unique-" + (0 until 70).map(_ => ('p' + rnd.nextInt(8)).toChar).mkString))
    val df = docs.toDF("doc_id", "text")
    val md5Rows = TextOps.dupSpans(df, L).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4))).toSet
    val rollRows = TextOps.dupSpans(df, L, hashMode = "roll").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4))).toSet
    assert(md5Rows.nonEmpty, "fixture produced no dup spans")
    assert(rollRows === md5Rows)
    val rollRepart = TextOps.dupSpans(df.repartition(7), L, hashMode = "roll")
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getLong(4))).toSet
    assert(rollRepart === md5Rows, "roll mode must be partition-invariant")
  }

  test("coverage equals brute force on a mixed hand corpus") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "prefix text alpha beta gamma delta unrelated suffix here"),
      (3L, "totally disjoint content qwerty uiop asdf ghjkl zxcvbnm"),
      (4L, "repeat me repeat me repeat me repeat me"),
      (5L, "short"))
    assert(opCover(docs) === bruteCover(docs))
  }

  test("planted cross-doc copy is found; disjoint doc is clean") {
    val shared = "the exact duplicated passage of considerable length"
    val docs = Seq(
      (1L, s"intro words $shared closing words one"),
      (2L, s"other beginning $shared different ending"),
      (3L, "nothing in common with either document at all klmnop"))
    val got = opCover(docs)
    assert(got.contains(1L) && got.contains(2L) && !got.contains(3L))
    assert(got === bruteCover(docs))
  }

  test("gap-merge boundary: gap > L splits spans, gap <= L merges") {
    // two duplicated islands inside one doc, separated by unique filler
    val dupA = "first duplicated island abc"
    val dupB = "second duplicated island xyz"
    // fillers must be non-self-repeating AND differ across docs, or the
    // filler's own L-grams become duplicated and bridge the gap
    val far = Seq(
      (1L, s"$dupA QWERTYUIOPASDFGHJKLZXCVBNM $dupB"),
      (2L, s"$dupA MNBVCXZLKJHGFDSAPOIUYTREWQ $dupB"))
    val farSpans = TextOps.dupSpans(far.toDF("doc_id", "text"), L)
      .where($"doc_id" === 1L).collect()
    assert(farSpans.length === 2, s"expected 2 spans, got ${farSpans.toSeq}")
    assert(opCover(far) === bruteCover(far))
    val near = Seq(
      (1L, s"$dupA $dupB tail one"),
      (2L, s"$dupA $dupB tail two"))
    val nearSpans = TextOps.dupSpans(near.toDF("doc_id", "text"), L)
      .where($"doc_id" === 1L).collect()
    assert(nearSpans.length === 1, s"expected 1 span, got ${nearSpans.toSeq}")
    assert(opCover(near) === bruteCover(near))
  }

  test("partition invariance") {
    val docs = (0L until 60L).map { i =>
      val boiler = "standard boilerplate header attached to many documents"
      (i, if (i % 3 == 0) s"$boiler unique tail marker m$i"
          else s"fully unique content stream number $i with words w${i * 7}")
    }
    val df = docs.toDF("doc_id", "text")
    val a = TextOps.dupSpans(df, L)
      .orderBy("doc_id", "span_start").collect().toSeq
    val b = TextOps.dupSpans(df.repartition(7), L)
      .orderBy("doc_id", "span_start").collect().toSeq
    assert(a === b && a.nonEmpty)
  }
}
