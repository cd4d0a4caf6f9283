package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** semDedup (q79): brute-force union-find equality on a clustered fixture,
  * isolated vectors keep themselves, partition invariance.
  */
class SemDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // 3 tight clusters of 6 near-identical vectors + 6 isolated vectors,
  // dim 8; within-cluster cosine ≈ 0.999, across ≪ 0.9
  private val rnd = new scala.util.Random(7)
  private val base = Seq(
    Array(1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0, 0.0),
    Array(0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0, 0.0),
    Array(0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 1.0, 0.0))
  private val vecs: Seq[(Long, Seq[Float])] =
    (for (c <- base.indices; j <- 0 until 6) yield {
      val v = base(c).map(x => (x + rnd.nextGaussian() * 0.01).toFloat)
      (c * 6 + j).toLong -> v.toSeq
    }) ++ (0 until 6).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat)
      (100 + i).toLong -> v.toSeq
    }

  private def cosD(a: Seq[Float], b: Seq[Float]): Double = {
    val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
    val d = ad.zip(bd).map { case (x, y) => x * y }.sum
    d / (math.sqrt(ad.map(x => x * x).sum) * math.sqrt(bd.map(x => x * x).sum))
  }

  test("matches brute-force union-find over cluster-bounded pairs") {
    for (parts <- Seq(1, 7)) {
      val df = vecs.toDF("vec_id", "embedding").repartition(parts)
      val cents = AnnOps.ivfTrain(df, dim = 8, nlist = 4, iters = 2)
      // brute force: assign = max cosine (ties → smaller list), pairs
      // within list at >= 0.9, components by union-find
      val byId = vecs.toMap
      def cosVC(v: Seq[Float], c: Array[Double]): Double = {
        val vd = v.map(_.toDouble)
        val d = vd.zip(c).map { case (x, y) => x * y }.sum
        d / (math.sqrt(vd.map(x => x * x).sum) * math.sqrt(c.map(x => x * x).sum))
      }
      def assign(v: Seq[Float]): Int =
        cents.indices.minBy(j => (-cosVC(v, cents(j)), j))
      val ids = vecs.map(_._1)
      val parent = scala.collection.mutable.Map(ids.map(i => i -> i): _*)
      def find(x: Long): Long =
        if (parent(x) == x) x else { val r = find(parent(x)); parent(x) = r; r }
      for {
        a <- ids; b <- ids if a < b
        if assign(byId(a)) == assign(byId(b)) && cosD(byId(a), byId(b)) >= 0.9
      } {
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expect = ids.map(i => i -> find(i)).toMap
      val got = AnnOps.semDedup(df, cents, threshold = 0.9)
        .collect().map(r => r.getAs[Long]("vec_id") ->
          ((r.getAs[Long]("component"), r.getAs[Boolean]("is_keep")))).toMap
      assert(got.keySet === ids.toSet, s"parts=$parts")
      ids.foreach { i =>
        assert(got(i) === ((expect(i), expect(i) == i)), s"vec $i parts=$parts")
      }
    }
  }

  test("tight clusters dedup to one keeper; isolated vectors keep themselves") {
    val df = vecs.toDF("vec_id", "embedding")
    val cents = AnnOps.ivfTrain(df, dim = 8, nlist = 4, iters = 2)
    val keep = AnnOps.semDedup(df, cents, threshold = 0.9)
      .where($"is_keep").collect().map(_.getAs[Long]("vec_id")).toSet
    // every isolated vector survives
    assert((100L until 106L).forall(keep.contains))
    // each tight cluster collapses (at most 2 keepers if a straggler fell
    // into a neighboring k-means cell; never all 6 survive)
    for (c <- base.indices) {
      val members = (c * 6 until c * 6 + 6).map(_.toLong).toSet
      assert((keep & members).size <= 2, s"cluster $c keepers: ${keep & members}")
    }
  }
}
