package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: JL ±1 random projection. Pins (a) the projection math against
  * a plain-Scala fold (ordering and all), (b) the JL property itself —
  * mean norm ratio Σy²/(m·‖x‖²) near 1 over a seeded batch, pairwise
  * distance ratios in a loose (1±ε) band on average, (c) sign balance,
  * (d) partition invariance.
  */
class JlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val dim = 64
  private val m = 8

  private def vecs(trial: Int, n: Int): Seq[(Long, Seq[Float])] =
    (0L until n).map { v =>
      v -> Seq.tabulate(dim) { i =>
        ((java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(trial * 7727L + v * 131L + i), 2001L)
          - 1000L) / 1000.0f)
      }
    }

  private def run(vs: Seq[(Long, Seq[Float])], parts: Int = 4)
      : Map[(Long, Int), Double] = {
    import spark.implicits._
    val df = vs.toDF("vec_id", "embedding").repartition(parts)
    AnnOps.jlProject(df, dim, m, seed = 7L).collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getDouble(2)).toMap
  }

  test("matches a plain-Scala ordered fold") {
    val vs = vecs(1, 20)
    val signs = AnnOps.jlSigns(dim, m, 7L)
    val got = run(vs)
    for ((v, emb) <- vs; j <- 0 until m) {
      var acc = 0.0
      var i = 0
      while (i < dim) { acc += emb(i).toDouble * signs(j)(i); i += 1 }
      val want = BigDecimal(acc)
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble + 0.0
      assert(got((v, j)) === want, s"vec $v dim $j")
    }
  }

  test("JL property: norms and pairwise distances preserved on average") {
    val vs = vecs(3, 60)
    val got = run(vs)
    def norm2(e: Seq[Float]) = e.map(x => x.toDouble * x).sum
    val ratios = vs.map { case (v, emb) =>
      val y2 = (0 until m).map(j => got((v, j)) * got((v, j))).sum
      y2 / (m * norm2(emb))
    }
    val mean = ratios.sum / ratios.size
    assert(mean > 0.8 && mean < 1.2, s"mean norm ratio $mean")
    val dr = (for (a <- 0 until 20; b <- a + 1 until 20) yield {
      val (va, ea) = vs(a); val (vb, eb) = vs(b)
      val dx = ea.zip(eb).map { case (p, q) =>
        (p - q).toDouble * (p - q) }.sum
      val dy = (0 until m).map(j =>
        (got((va, j)) - got((vb, j))) * (got((va, j)) - got((vb, j)))).sum
      dy / (m * dx)
    })
    val dmean = dr.sum / dr.size
    assert(dmean > 0.8 && dmean < 1.2, s"mean distance ratio $dmean")
  }

  test("sign matrix is balanced-ish") {
    val signs = AnnOps.jlSigns(dim, m, 7L)
    val pos = signs.flatten.count(_ > 0)
    assert(pos > dim * m / 4 && pos < dim * m * 3 / 4)
  }

  test("partition invariance") {
    val vs = vecs(5, 30)
    assert(run(vs, parts = 1) === run(vs, parts = 9))
  }
}
