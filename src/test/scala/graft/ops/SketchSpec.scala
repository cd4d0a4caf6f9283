package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** SketchOps (q70/q71): HLL register state must equal a brute-force
  * single-threaded sketch at any partitioning (the merge is max, so
  * partial aggregation must be invisible); the estimate's raw branch must
  * land within HLL's theoretical error on a large distinct set. Bloom:
  * zero false negatives ever, and the bitset must equal a brute-force
  * build bit for bit (false positives deterministic).
  */
class SketchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // brute-force 60-bit-hash HLL
  private def bruteRegs(hashes: Seq[Long]): Array[Int] = {
    val r = new Array[Int](256)
    hashes.foreach { h =>
      val idx = ((h >>> 52) & 255).toInt
      val w = h & ((1L << 52) - 1)
      val rho = if (w == 0) 53 else java.lang.Long.numberOfTrailingZeros(w) + 1
      if (rho > r(idx)) r(idx) = rho
    }
    r
  }

  private def md5h(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).take(8).map("%02x".format(_)).mkString
        .take(15), 16)

  test("HLL registers equal brute force at any partitioning") {
    val values = (0 until 5000).map(i => s"tok${i % 700}")
    val hashes = values.map(md5h)
    val expect = bruteRegs(hashes).toSeq
    for (parts <- Seq(1, 4, 13)) {
      val got = values.toDF("tok").repartition(parts)
        .withColumn("h",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
        .agg(SketchOps.hll(col("h")).as("regs"))
        .collect()(0).getSeq[Int](0)
      assert(got === expect, s"parts=$parts")
    }
  }

  test("estimate raw branch within theoretical error on 20k distinct") {
    val n = 20000
    val df = spark.range(n).select(
      conv(substring(md5(concat(lit("v"), col("id"))), 1, 15), 16, 10)
        .cast("long").as("h"))
    val est = df.agg(SketchOps.hll(col("h")).as("regs"))
      .select(SketchOps.hllEstimate(col("regs")).as("e"))
      .collect()(0).getDouble(0)
    // raw branch: est > 2.5m = 640; sigma = 1.04/sqrt(256) = 6.5%
    assert(est > 640.0, s"expected raw branch, got $est")
    assert(math.abs(est - n) / n < 0.2, s"estimate $est vs $n")
  }

  test("small-range branch engages for tiny cardinalities") {
    val df = spark.range(10).select(
      conv(substring(md5(concat(lit("w"), col("id"))), 1, 15), 16, 10)
        .cast("long").as("h"))
    val row = df.agg(SketchOps.hll(col("h")).as("regs"))
      .select(SketchOps.hllZeros(col("regs")).as("z"),
        SketchOps.hllEstimate(col("regs")).as("e"))
      .collect()(0)
    val (z, e) = (row.getLong(0), row.getDouble(1))
    assert(z === 246L)
    assert(math.abs(e - 256.0 * math.log(256.0 / z)) < 1e-9)
  }

  test("CMS counters equal brute force at any partitioning; est >= exact") {
    val rnd = new scala.util.Random(11)
    // 600 distinct tokens over width 256 → guaranteed collisions, so the
    // >= in est >= exact is strict somewhere (overestimation exercised)
    val values = (0 until 4000).map(_ => s"w${rnd.nextInt(600)}")
    val brute = new Array[Long](SketchOps.CmsD * SketchOps.CmsW)
    values.foreach { t =>
      (0 until SketchOps.CmsD).foreach(j =>
        brute(j * SketchOps.CmsW + SketchOps.cmsPos(t, j)) += 1L)
    }
    for (parts <- Seq(1, 7)) {
      val sk = values.toDF("tok").repartition(parts)
        .agg(SketchOps.cms(col("tok")).as("sk"))
        .collect()(0).getSeq[Long](0)
      assert(sk === brute.toSeq, s"parts=$parts")
    }
    val exact = values.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val probed = (0 until 600).map(i => s"w$i")
    val sk = brute
    var strictly = 0
    probed.foreach { t =>
      val est = (0 until SketchOps.CmsD)
        .map(j => sk(j * SketchOps.CmsW + SketchOps.cmsPos(t, j))).min
      val ex = exact.getOrElse(t, 0L)
      assert(est >= ex, s"$t: est $est < exact $ex")
      if (est > ex) strictly += 1
    }
    assert(strictly > 0, "expected at least one collision-driven overestimate")
  }

  test("bloom: bitset equals brute force; zero false negatives; FP reduction") {
    val m = 1024; val k = 4
    val keys = (0L until 150L).map(_ * 7L + 3L)
    val keysDf = keys.toDF("key")
    val bits = SketchOps.bloomBuild(keysDf, "key", m, k)

    // brute-force build with the same md5 position derivation
    val brute = new Array[Long](m / 64)
    for (key <- keys; j <- 0 until k) {
      val pos = (md5h(s"$key#$j") % m + m) % m
      brute((pos / 64).toInt) |= 1L << (pos % 64).toInt
    }
    assert(bits.toSeq === brute.toSeq)

    val probe = (0L until 3000L).toDF("key")
      .withColumn("pass", SketchOps.bloomMightContain(bits, col("key"), m, k))
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val keySet = keys.toSet
    keys.foreach(key => assert(probe(key), s"false negative for $key"))
    val fps = probe.count { case (key, p) => p && !keySet.contains(key) }
    assert(fps < 600, s"fp count $fps out of 2850 negatives") // filter filters
  }
}
