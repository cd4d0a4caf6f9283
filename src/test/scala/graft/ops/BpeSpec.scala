package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-5 item #5: the from-scratch BPE trainer/encoder. The distributed
  * trainer must equal a single-threaded reference implementation of
  * textbook BPE (exact counts, lexicographic tie-breaks), the encoder must
  * reproduce the trainer's own final segmentation, and everything must be
  * partitioning-invariant (the q63 gate then pins encode+packing against
  * the DuckDB recursive-CTE replay).
  */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // the classic Sennrich corpus plus a tie-bait word pair
  private val corpus: Seq[(String, Long)] = Seq(
    "low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L, "new" -> 2L)

  private def refTrain(words: Seq[(String, Long)],
                       nMerges: Int): Seq[(String, String)] = {
    var seg = words.map { case (w, f) => (f, w.map(_.toString): Seq[String]) }
    val out = mutable.ArrayBuffer.empty[(String, String)]
    var go = true
    while (go && out.length < nMerges) {
      val counts = mutable.Map.empty[(String, String), Long]
      seg.foreach { case (f, syms) =>
        syms.iterator.zip(syms.iterator.drop(1)).foreach { p =>
          counts(p) = counts.getOrElse(p, 0L) + f
        }
      }
      val best = counts.toSeq.sortBy { case ((a, b), n) => (-n, a, b) }.headOption
      best match {
        case Some((pair, n)) if n >= 2 =>
          out += pair
          seg = seg.map { case (f, syms) =>
            (f, BpeTokenizer.applyMergeAll(syms, pair._1, pair._2))
          }
        case _ => go = false
      }
    }
    out.toSeq
  }

  test("distributed trainer equals the reference trainer, any partitioning") {
    val ref = refTrain(corpus, 12)
    assert(ref.nonEmpty && ref.head === ("e", "s"), // freq 9 (newest+widest)
      s"reference sanity: got ${ref.headOption}")
    val words = corpus.toDF("w", "freq")
    assert(BpeTokenizer.train(words, 12) === ref)
    assert(BpeTokenizer.train(words.repartition(7), 12) === ref)
  }

  test("local and distributed trainers: identical merges on fuzz corpora") {
    // r6 cadence fix: train() now collects small vocabs and runs
    // driver-local — the merge sequence must match the distributed loop
    // EXACTLY (counts, UTF-8 tie-breaks, <2 stop) on tie-heavy corpora
    val rnd = new scala.util.Random(41)
    for (trial <- 0 until 5) {
      val words = (0 until 30 + rnd.nextInt(40)).map { _ =>
        (0 until 1 + rnd.nextInt(8))
          .map(_ => ('a' + rnd.nextInt(5)).toChar).mkString
      }.distinct.map(w => (w, (1 + rnd.nextInt(9)).toLong))
      val ref = refTrain(words, 25)
      val df = words.toDF("w", "freq")
      assert(BpeTokenizer.trainLocal(
        words.map { case (w, f) => (f, w) }.toArray, 25) === ref,
        s"trial $trial: local trainer diverged")
      assert(BpeTokenizer.trainDistributed(df, 25) === ref,
        s"trial $trial: distributed trainer diverged")
    }
  }

  test("encode reproduces the trainer's own final segmentation") {
    val merges = refTrain(corpus, 12)
    val ranks = BpeTokenizer.ranksOf(merges)
    corpus.foreach { case (w, _) =>
      val trained = merges.foldLeft(w.map(_.toString): Seq[String]) {
        case (syms, (a, b)) => BpeTokenizer.applyMergeAll(syms, a, b)
      }
      assert(BpeTokenizer.encode(w, ranks) === trained, s"word $w")
      assert(BpeTokenizer.encode(w, ranks).mkString === w, "lossless")
    }
  }

  test("countText: whitespace split semantics, empty-safe") {
    val ranks = BpeTokenizer.ranksOf(refTrain(corpus, 12))
    val perWord = corpus.map { case (w, _) =>
      w -> BpeTokenizer.encode(w, ranks).length.toLong }.toMap
    assert(BpeTokenizer.countText("low newest", ranks) ===
      perWord("low") + perWord("newest"))
    // double spaces yield empty split tokens → 0 symbols, like Spark's
    // split(text, " ") feeding a per-token encode
    assert(BpeTokenizer.countText("low  newest", ranks) ===
      perWord("low") + perWord("newest"))
    assert(BpeTokenizer.countText("", ranks) === 0L)
    // unseen characters stay as single-char symbols (open vocabulary)
    assert(BpeTokenizer.countText("zq", ranks) === 2L)
  }

  test("bpe_count expression matches the driver encode row-for-row") {
    val merges = refTrain(corpus, 12)
    val ranks = BpeTokenizer.ranksOf(merges)
    val docs = Seq((1L, "low lower newest"), (2L, "widest new low"),
      (3L, "newest newest zz")).toDF("doc_id", "text")
    val got = BpeTokenizer.tokenCounts(docs, merges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val want = Map(
      1L -> BpeTokenizer.countText("low lower newest", ranks),
      2L -> BpeTokenizer.countText("widest new low", ranks),
      3L -> BpeTokenizer.countText("newest newest zz", ranks))
    assert(got === want)
  }
}
