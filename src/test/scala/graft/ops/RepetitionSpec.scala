package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** repetitionStats (q68): the zero-shuffle run-length fold must agree with
  * a brute-force gram count on adversarial shapes — heavy repetition,
  * count ties (lexicographically smallest must win), short docs (0/1/2
  * tokens), and seeded random word soup.
  */
class RepetitionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(text: String): (Long, String, Long, Double, Double) = {
    val tk = text.split(" ", -1)
    val n = tk.length.toLong
    def grams(k: Int): Seq[String] =
      if (tk.length < k) Seq.empty
      else tk.sliding(k).map(_.mkString(" ")).toSeq
    val bi = grams(2)
    val (bg, bc) =
      if (bi.isEmpty) ("", 0L)
      else {
        val counts = bi.groupBy(identity).view.mapValues(_.size.toLong)
        // max count, ties -> lexicographically smallest gram
        val best = counts.toSeq.minBy { case (g, c) => (-c, g) }
        (best._1, best._2)
      }
    val frac2 =
      if (text.isEmpty) 0.0 else bc * bg.length.toDouble / text.length.toDouble
    val tri = grams(3)
    val frac3 =
      if (n < 3) 0.0
      else (tri.size - tri.distinct.size).toDouble / (n - 2).toDouble
    (n, bg, bc, frac2, frac3)
  }

  private def check(texts: Seq[String]): Unit = {
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextOps.repetitionStats(df).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(got(i.toLong) === brute(t), s"doc $i: '$t'")
    }
  }

  test("adversarial shapes match brute force") {
    check(Seq(
      "a b a b a b a b",           // dominant bigram "a b"
      "x y y x x y x x",           // ties between several bigrams
      "a a a a a a",               // single-token runs, tri dups
      "one",                       // no bigrams
      "one two",                   // exactly one bigram
      "",                          // single empty token
      "z y x w v u t s r q"))      // all distinct
  }

  test("seeded random word soup matches brute force") {
    val rnd = new scala.util.Random(7)
    val words = Vector("the", "cat", "sat", "on", "mat", "dog", "ran")
    val texts = (0 until 60).map { _ =>
      (0 until (1 + rnd.nextInt(40))).map(_ => words(rnd.nextInt(words.size)))
        .mkString(" ")
    }
    check(texts)
  }
}
