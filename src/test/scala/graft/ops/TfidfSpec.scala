package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: exact sparse TF-IDF cosine pairs. Pins (a) agreement with a
  * brute-force reference using the identical milli-nat idf quantization,
  * (b) identical documents ranking first at sim 1.0, (c) the df cap
  * dropping corpus-wide stopwords from weights AND norms, (d) partition
  * invariance.
  */
class TfidfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def brute(docs: Seq[(Long, String)], k: Int,
                    maxDfRatio: Double = 0.5): Seq[(Long, Long, Double)] = {
    val n = docs.size
    val tf = docs.map { case (id, t) =>
      id -> t.split(" ", -1).groupBy(identity).view.mapValues(_.length.toLong).toMap
    }.toMap
    val df = tf.values.flatMap(_.keys).groupBy(identity).view
      .mapValues(_.size.toLong).toMap
    val idf = df.collect { case (t, d) if d.toDouble <= maxDfRatio * n =>
      t -> BigDecimal(math.log((n + 1.0) / (d + 1.0)) * 1000.0)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
    }.toMap
    val w = tf.view.mapValues(_.collect { case (t, c) if idf.contains(t) =>
      t -> c * idf(t) }.toMap).toMap
    val nrm = w.view.mapValues(v => v.values.map(x => x * x).sum).toMap
    val sims = for {
      (a, wa) <- w.toSeq; (b, wb) <- w.toSeq if a < b
      dot = wa.keys.filter(wb.contains).map(t => wa(t) * wb(t)).sum
      if dot != 0L
    } yield (a, b, dot.toDouble / math.sqrt(nrm(a).toDouble * nrm(b).toDouble))
    sims.sortBy { case (a, b, s) => (-s, a, b) }.take(k)
      .map { case (a, b, s) =>
        (a, b, BigDecimal(s).setScale(6, BigDecimal.RoundingMode.HALF_UP)
          .toDouble + 0.0) }
  }

  private def run(docs: Seq[(Long, String)], k: Int,
                  parts: Int = 4): Seq[(Long, Long, Double)] = {
    val df = spark.createDataFrame(docs).toDF("doc_id", "text")
      .repartition(parts)
    TextOps.tfidfCosinePairs(df, k)
      .orderBy(col("sim").desc, col("doc_a"), col("doc_b"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
  }

  private def corpus(trial: Int, n: Int): Seq[(Long, String)] = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (0 until n).map { i =>
      val h0 = graft.model.Synth.mix64(trial * 31337L + i)
      val len = 4 + (java.lang.Long.remainderUnsigned(h0, 5L)).toInt
      val text = (0 until len).map { j =>
        val h = graft.model.Synth.mix64(h0 + 7L * j)
        // gid-local vocabulary bias so near-dups exist
        words((java.lang.Long.remainderUnsigned(h, 6L).toInt + i % 3) % words.length)
      }.mkString(" ")
      (i.toLong, text)
    }
  }

  test("seeded corpora match the brute-force reference") {
    for (trial <- 0 until 5) {
      val docs = corpus(trial, 40)
      assert(run(docs, 15) === brute(docs, 15), s"trial $trial")
    }
  }

  test("identical documents rank first at sim 1.0") {
    val docs = Seq((0L, "quick brown fox jumps"), (1L, "quick brown fox jumps"),
      (2L, "slow green turtle rests"), (3L, "quick green fox rests"))
    val got = run(docs, 3)
    assert(got.head._1 === 0L && got.head._2 === 1L)
    assert(got.head._3 === 1.0)
  }

  test("df cap drops corpus-wide stopwords from weights and norms") {
    // 'the' is in every doc -> capped out; the pair similarity must equal
    // the same corpus with 'the' removed entirely
    val withStop = Seq((0L, "the alpha beta"), (1L, "the alpha beta"),
      (2L, "the gamma delta"), (3L, "the epsilon zeta"))
    val without = withStop.map { case (id, t) =>
      (id, t.split(" ").filterNot(_ == "the").mkString(" ")) }
    assert(run(withStop, 6) === run(without, 6))
  }

  test("partition invariance") {
    val docs = corpus(9, 60)
    assert(run(docs, 20, parts = 1) === run(docs, 20, parts = 11))
  }
}
