package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** bm25TopK (q76), unigramLogProb (q77), paragraphDedup (q78): brute-force
  * equality on seeded corpora, OOV floor, boilerplate drop semantics,
  * partition invariance.
  */
class TextRelevanceSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  private val rnd = new scala.util.Random(11)
  private val words = Vector("spark", "join", "scan", "vector", "merge", "row")
  private val docs = (0L until 60L).map { i =>
    (i, (0 until (5 + rnd.nextInt(20))).map(_ => words(rnd.nextInt(words.size)))
      .mkString(" "))
  }

  test("bm25TopK matches brute-force Lucene BM25 at any partitioning") {
    val terms = Seq("spark", "vector")
    val (k1, b) = (1.2, 0.75)
    val byDoc = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }.toMap
    val n = docs.size.toLong
    val avgdl = byDoc.values.map(_.size.toLong).sum.toDouble / n
    def brute(id: Long): Double = {
      val tks = byDoc(id)
      round6(terms.map { t =>
        val df = byDoc.values.count(_.contains(t)).toLong
        val idf = round6(math.log(1.0 + (n - df + 0.5) / (df + 0.5)))
        val tf = tks.count(_ == t).toDouble
        idf * ((tf * (k1 + 1.0)) /
          (tf + k1 * ((1.0 - b) + (b * tks.size) / avgdl)))
      }.sum)
    }
    val expectTop = docs.map(_._1).sortBy(id => (-brute(id), id)).take(7)
    for (parts <- Seq(1, 8)) {
      val got = TextOps.bm25TopK(
        docs.toDF("doc_id", "text").repartition(parts), terms, k = 7)
        .collect().sortBy(_.getAs[Int]("rank"))
      assert(got.map(_.getAs[Long]("doc_id")).toSeq === expectTop, s"parts=$parts")
      got.foreach { r =>
        assert(math.abs(r.getAs[Double]("score") -
          brute(r.getAs[Long]("doc_id"))) < 1e-9)
      }
    }
  }

  test("unigramLogProb matches brute-force micro-nat sums") {
    val toks = docs.flatMap(_._2.split(" ", -1))
    val total = toks.size.toLong
    val counts = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    def micro(t: String): Long =
      BigDecimal(math.log(counts(t).toDouble / total) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = TextOps.unigramLogProb(docs.toDF("doc_id", "text").repartition(5))
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("sum_micro")))).toMap
    docs.foreach { case (id, t) =>
      val tk = t.split(" ", -1)
      assert(got(id) === ((tk.length.toLong, tk.map(micro).sum)), s"doc $id")
    }
  }

  test("unigramLogProb topV truncation scores tail tokens at the OOV floor") {
    val d = Seq((0L, "a a a b b c"), (1L, "c c b a a a")).toDF("doc_id", "text")
    // topV=1 keeps only 'a' (freq 6... a=6,b=3,c=3 in 12 tokens)
    val total = 12L
    def m(p: Double): Long =
      BigDecimal(math.log(p) * 1000000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    val got = TextOps.unigramLogProb(d, topV = 1)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("sum_micro")).toMap
    val expect = 3 * m(6.0 / total) + 3 * m(1.0 / total) // 3×'a' + 3×OOV per doc
    assert(got === Map(0L -> expect, 1L -> expect))
  }

  test("paragraphDedup drops corpus-wide boilerplate, keeps unique paras in order") {
    val boiler = "x1 x2 x3"
    val d = Seq(
      (0L, Seq("u1 u2", boiler, "u3 u4")),
      (1L, Seq(boiler, "v1 v2")),
      (2L, Seq("w1 w2", boiler)),
      (3L, Seq(boiler))). // fully boilerplate → disappears
      toDF("doc_id", "paras")
      .selectExpr("doc_id", "array_join(paras, '|') AS text")
    val got = TextOps.paragraphDedup(d,
      t => org.apache.spark.sql.functions.split(t, "\\|"), maxDocs = 2L)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_paras"), r.getAs[String]("clean_text")))).toMap
    assert(got === Map(
      0L -> ((2L, "u1 u2 u3 u4")),
      1L -> ((1L, "v1 v2")),
      2L -> ((1L, "w1 w2"))))
  }

  test("tokenChunks yields disjoint k-token chunks, partial tail, no empties") {
    val d = Seq((0L, "a b c d e"), (1L, "")).toDF("doc_id", "text")
    val got = d.select($"doc_id",
      TextOps.tokenChunks(2)($"text").as("ch"))
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getSeq[String](1)).toMap
    assert(got(0L) === Seq("a b", "c d", "e"))
    assert(got(1L) === Seq.empty)
  }
}
