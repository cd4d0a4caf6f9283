package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** ragChunks (q94): chunk count arithmetic, overlap layout, short-doc and
  * exact-window edges, hash determinism.
  */
class RagChunksSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, n: Int): (Long, String) =
    (id, (0 until n).map(i => s"t$i").mkString(" "))

  private def chunksOf(id: Long, n: Int, w: Int, s: Int): Seq[(Long, Int)] = {
    // (chunk_idx, expected n_chunk_tokens) by brute force
    val nch = if (n <= w) 1 else (n - w + s - 1) / s + 1
    (0 until nch).map(i => (i.toLong, math.min(w, n - i * s)))
  }

  test("chunk layout matches brute force across sizes incl. edges") {
    val sizes = Seq(1, 31, 32, 33, 56, 57, 80, 200)
    val df = sizes.zipWithIndex.map { case (n, i) => doc(i.toLong, n) }
      .toDF("doc_id", "text")
    val out = TextOps.ragChunks(df, window = 32, step = 24)
      .orderBy("doc_id", "chunk_idx").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expect = sizes.zipWithIndex.flatMap { case (n, i) =>
      chunksOf(i.toLong, n, 32, 24).map { case (c, k) => (i.toLong, c, k.toLong) }
    }
    assert(out.toSeq === expect)
  }

  test("chunk hash = hash of the exact overlapping token window") {
    val df = Seq(doc(7L, 56)).toDF("doc_id", "text")
    val out = TextOps.ragChunks(df, 32, 24)
      .orderBy("chunk_idx").collect()
    assert(out.length === 2)
    // second chunk starts at token 24 and covers 32 tokens: t24..t55
    val text2 = (24 until 56).map(i => s"t$i").mkString(" ")
    val h2 = java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(text2.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(15), 16)
    assert(out(1).getAs[Long]("chunk_hash") === h2)
    assert(out(1).getAs[Long]("n_chunk_tokens") === 32L)
  }
}
