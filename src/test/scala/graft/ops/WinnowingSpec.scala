package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Winnowing fingerprints + overlap matching (q124). Pins (a) a
  * brute-force replica of the selection (k-gram hash, w-window rightmost
  * min) on hand documents, (b) the winnowing guarantee — a shared
  * substring of length ≥ w+k−1 yields ≥ 1 shared fingerprint, (c) the
  * containment matcher finds a planted copy and rejects disjoint text,
  * (d) partition invariance.
  */
class WinnowingSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val K = 12
  private val W = 8

  private def h40(g: String): Long = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(g.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16) % 1099511627776L
  }

  private def bruteFps(text: String): Set[Long] = {
    if (text.length < K) return Set.empty
    val ng = text.length - K + 1
    val keys = (1 to ng).map(pos =>
      h40(text.substring(pos - 1, pos - 1 + K)) * 1048576L + (1048575L - pos))
    (1 to ng - W + 1).map(t => keys.slice(t - 1, t - 1 + W).min)
      .toSet.map((k: Long) => k / 1048576L)
  }

  test("matches the brute-force selection on hand documents") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog repeatedly today"),
      (2L, "completely different content with nothing shared at all here"),
      (3L, "tiny"))
    val got = TextOps.winnowFingerprints(docs.toDF("doc_id", "text"), K, W)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert(got.getOrElse(1L, Set.empty) === bruteFps(docs(0)._2))
    assert(got.getOrElse(2L, Set.empty) === bruteFps(docs(1)._2))
    assert(!got.contains(3L), "below-k doc must yield no fingerprints")
  }

  test("winnowing guarantee: shared substring >= w+k-1 shares a fingerprint") {
    val shared = "zqxjkvwpylmzqxjkvwpylm" // 22 chars >= 8+12-1
    val a = s"aaaaaaaaaaaaaaaa $shared bbbbbbbbbbbbbbbb"
    val b = s"cccccccccccccccc $shared dddddddddddddddd"
    val fps = TextOps.winnowFingerprints(
      Seq((1L, a), (2L, b)).toDF("doc_id", "text"), K, W)
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
  }

  test("containment matcher finds a planted copy, rejects disjoint text") {
    val base = "the shared corpus sentence that appears verbatim in " +
      "both documents of interest without any modification whatsoever"
    val docs = Seq(
      (1L, base),
      (2L, base + " plus a short unique tail xyzzy"),
      (3L, "entirely unrelated words qwerty asdfgh zxcvbn uiophj klmnbv " +
        "plus more filler so the length is comparable overall"))
    val got = TextOps.winnowMatches(docs.toDF("doc_id", "text"), K, W)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
  }

  test("partition invariance") {
    val docs = (0L until 40L).map(i =>
      (i, s"document number $i with some shared boilerplate text " +
        s"and a unique marker m$i${"x" * (i % 5).toInt}"))
    val df = docs.toDF("doc_id", "text")
    val a = TextOps.winnowMatches(df, K, W)
      .orderBy("doc_a", "doc_b").collect().toSeq
    val b = TextOps.winnowMatches(df.repartition(7), K, W)
      .orderBy("doc_a", "doc_b").collect().toSeq
    assert(a === b)
  }

  test("roll hash mode: guarantee, planted copy, partition invariance") {
    // production mode selects DIFFERENT (equally valid) fingerprints, so
    // the pins are the winnowing PROPERTIES, not md5-value equality
    val shared = "zqxjkvwpylmzqxjkvwpylm"
    val fps = TextOps.winnowFingerprints(
      Seq((1L, s"aaaaaaaaaaaaaaaa $shared bbbbbbbbbbbbbbbb"),
        (2L, s"cccccccccccccccc $shared dddddddddddddddd"))
        .toDF("doc_id", "text"), K, W, hashMode = "roll")
      .collect().groupBy(_.getLong(0))
      .map { case (id, rs) => id -> rs.map(_.getLong(1)).toSet }
    assert((fps(1L) intersect fps(2L)).nonEmpty)
    val base = "the shared corpus sentence that appears verbatim in " +
      "both documents of interest without any modification whatsoever"
    val docs = Seq(
      (1L, base),
      (2L, base + " plus a short unique tail xyzzy"),
      (3L, "entirely unrelated words qwerty asdfgh zxcvbn uiophj klmnbv " +
        "plus more filler so the length is comparable overall"))
    val df = docs.toDF("doc_id", "text")
    val got = TextOps.winnowMatches(df, K, W, hashMode = "roll")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 2L)))
    val re = TextOps.winnowMatches(df.repartition(5), K, W, hashMode = "roll")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(re === got)
  }

  test("fused roll selection equals brute-force winnowing of direct hashes") {
    // r6: roll mode fuses hashing + deque selection into one pass — pin it
    // against an independent per-window min over DIRECT polynomial hashes
    // on a 4-letter alphabet (dense gram collisions stress the tiebreak)
    val M = BigInt(2).pow(61) - 1
    val B = BigInt(1000003)
    def direct(g: String): Long =
      g.foldLeft(BigInt(0))((acc, c) => (acc * B + c.toInt) mod M).toLong
    val rnd = new scala.util.Random(11)
    val docs = (0 until 25).map(i => (i.toLong,
      (0 until 30 + rnd.nextInt(150))
        .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString))
    val expect = docs.flatMap { case (id, t) =>
      val ng = t.length - K + 1
      if (ng < W) Nil
      else {
        val keys = (1 to ng).map(p =>
          direct(t.substring(p - 1, p - 1 + K)) % 1099511627776L * 1048576L +
            (1048575L - p))
        (0 to ng - W).map(s => keys.slice(s, s + W).min / 1048576L)
          .distinct.map(fh => (id, fh))
      }
    }.toSet
    val got = TextOps.winnowFingerprints(
        docs.toDF("doc_id", "text"), K, W, hashMode = "roll")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === expect)
  }

  test("rolling hash equals a direct per-gram polynomial evaluation") {
    // pins the O(1) slide against the O(L) definition: h(g) =
    // sum g(i)·B^(L-1-i) mod 2^61-1, for every position of every doc
    val M = BigInt(2).pow(61) - 1
    val B = BigInt(1000003)
    def direct(g: String): Long =
      g.foldLeft(BigInt(0))((acc, c) => (acc * B + c.toInt) mod M).toLong
    val docs = Seq((7L, "abcdefghijklmnopqrstuvwxyz0123456789"),
      (8L, "aaaaaaaaaaaaaaaaaaaa"))
    val got = TextOps.gramRows(docs.toDF("doc_id", "text"), K, "roll")
      .collect().map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    for ((id, t) <- docs; p <- 1 to t.length - K + 1)
      assert(got((id, p)) === direct(t.substring(p - 1, p - 1 + K)),
        s"doc $id pos $p")
  }
}
