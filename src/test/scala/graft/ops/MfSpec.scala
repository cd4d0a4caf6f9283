package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: distributed matrix-factorization GD. Pins (a) bit-identical
  * agreement with a plain-Scala replication of the integer GD (factors
  * AND the per-item summary), (b) training reduces the exact Σ|e|
  * reconstruction error on planted rank-2 data, (c) partition
  * invariance, (d) init bounds.
  */
class MfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val S = 1000000L

  /** Plain-Scala replication of mfTrain's integer math. */
  private def bruteTrain(ratings: Seq[(Long, Long, Long)],
                         initU: Map[Long, Array[Long]],
                         initV: Map[Long, Array[Long]],
                         rank: Int, iters: Int, lr: Long)
      : (Map[Long, Array[Long]], Map[Long, Array[Long]]) = {
    var u = initU.view.mapValues(_.clone()).toMap
    var v = initV.view.mapValues(_.clone()).toMap
    for (_ <- 1 to iters) {
      val errs = ratings.map { case (uu, ii, r) =>
        val e = r - (0 until rank).map(k => u(uu)(k) * v(ii)(k)).sum / S
        (uu, ii, e)
      }
      val nu = u.map { case (uu, fu) =>
        val mine = errs.filter(_._1 == uu)
        uu -> Array.tabulate(rank) { k =>
          val g = mine.map { case (_, ii, e) => (e * v(ii)(k)) / S }.sum
          fu(k) + (lr * g) / mine.size
        }
      }
      val nv = v.map { case (ii, fv) =>
        val mine = errs.filter(_._2 == ii)
        ii -> Array.tabulate(rank) { k =>
          val g = mine.map { case (uu, _, e) => (e * u(uu)(k)) / S }.sum
          fv(k) + (lr * g) / mine.size
        }
      }
      u = nu; v = nv
    }
    (u, v)
  }

  private def ratingsFixture(nu: Int, ni: Int): Seq[(Long, Long, Long)] =
    for {
      uu <- 0L until nu; ii <- 0L until ni
      if graft.model.Synth.mix64(uu * 1000 + ii) % 3 == 0
    } yield {
      def t(id: Long, salt: Long) =
        java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(id + salt), 600001L) - 300000L
      val r = (t(uu, 1) * t(ii, 2) + t(uu, 3) * t(ii, 4)) / S +
        java.lang.Long.remainderUnsigned(
          graft.model.Synth.mix64(uu * 77 + ii), 20001L) - 10000L
      (uu, ii, r)
    }

  private def toDf(rs: Seq[(Long, Long, Long)], parts: Int) = {
    import spark.implicits._
    rs.toDF("user_id", "item_id", "rating").repartition(parts)
  }

  test("bit-identical to the plain-Scala replication") {
    val rs = ratingsFixture(12, 8)
    val rdf = toDf(rs, 4)
    val (u, v) = MlOps.mfTrain(rdf, rank = 2, iters = 3, lr = 2L, seed = 5L)
    // pull the engine's own init (deterministic column math) as the brute
    // starting point
    def collectF(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) ->
        Array(r.getLong(1), r.getLong(2))).toMap
    val iu = collectF(MlOps.mfInit(
      rdf.select("user_id").distinct(), "user_id", 2, 5L))
    val iv = collectF(MlOps.mfInit(
      rdf.select("item_id").distinct(), "item_id", 2, 1005L))
    val (bu, bv) = bruteTrain(rs, iu, iv, rank = 2, iters = 3, lr = 2L)
    assert(collectF(u).view.mapValues(_.toSeq).toMap ===
      bu.view.mapValues(_.toSeq).toMap)
    assert(collectF(v).view.mapValues(_.toSeq).toMap ===
      bv.view.mapValues(_.toSeq).toMap)
  }

  test("training reduces the exact reconstruction error") {
    val rdf = toDf(ratingsFixture(24, 12), 4)
    def totalErr(iters: Int): Long = {
      val (u, v) = MlOps.mfTrain(rdf, rank = 2, iters = iters, lr = 2L,
        seed = 5L)
      MlOps.mfItemSummary(rdf, u, v)
        .agg(sum("abs_err")).head().getLong(0)
    }
    val e0 = totalErr(0); val e3 = totalErr(3)
    assert(e3 < e0, s"GD must reduce error: init $e0 -> trained $e3")
  }

  test("partition invariance") {
    val rs = ratingsFixture(16, 10)
    def summary(parts: Int) = {
      val rdf = toDf(rs, parts)
      val (u, v) = MlOps.mfTrain(rdf, 2, 3, 2L, 5L)
      MlOps.mfItemSummary(rdf, u, v).orderBy("item_id").collect()
        .map(_.toSeq).toSeq
    }
    assert(summary(1) === summary(9))
  }

  test("init bounds stay in ±100000 micro") {
    import spark.implicits._
    val ids = (0L until 500L).toDF("user_id")
    val mm = MlOps.mfInit(ids, "user_id", 3, 9L)
      .agg(min(least(col("f0"), col("f1"), col("f2"))),
        max(greatest(col("f0"), col("f1"), col("f2")))).head()
    assert(mm.getLong(0) >= -100000L && mm.getLong(1) <= 100000L)
  }
}
