package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** StatsManifest (q82): pruned read ≡ full-scan filter, real skipping on a
  * range-partitioned layout, boundary inclusivity, empty range.
  */
class StatsManifestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = new java.io.File(
    sys.props("java.io.tmpdir"), "graft_manifest_spec").getAbsolutePath

  private val rows = (0L until 4000L).map(i => (i, i % 997, s"s${i % 5}"))

  test("pruned read equals full-scan filter AND opens fewer files") {
    val df = rows.toDF("id", "v", "src")
    StatsManifest.write(df.repartitionByRange(8, col("v")), dir, Seq("v"))
    val (pruned, opened, total) = StatsManifest.prunedRead(spark, dir, "v", 100L, 220L)
    assert(total === 8L)
    assert(opened < total, s"no skipping: $opened/$total")
    val got = pruned.select("id").collect().map(_.getLong(0)).sorted
    val expect = rows.filter(r => r._2 >= 100 && r._2 <= 220).map(_._1).sorted
    assert(got.toSeq === expect)
  }

  test("bounds are inclusive") {
    val (pruned, _, _) = StatsManifest.prunedRead(spark, dir, "v", 150L, 150L)
    assert(pruned.select("v").distinct().collect().map(_.getLong(0)).toSeq === Seq(150L))
  }

  test("empty range opens nothing and returns nothing") {
    val (pruned, opened, _) = StatsManifest.prunedRead(spark, dir, "v", 5000L, 6000L)
    assert(opened === 0L)
    assert(pruned.count() === 0L)
  }

  private val zdir = new java.io.File(
    sys.props("java.io.tmpdir"), "graft_zorder_spec").getAbsolutePath

  test("z-order layout prunes on BOTH columns from one layout") {
    // decorrelated second dimension: v = (id * 7919) mod 4001
    val df = (0L until 4000L).map(i => (i, (i * 7919L) % 4001L))
      .toDF("id", "v")
    StatsManifest.zorderWrite(df, zdir, "id", "v", 16)
    val (pa, oa, ta) = StatsManifest.prunedRead(spark, zdir, "id", 500L, 899L)
    val (pb, ob, tb) = StatsManifest.prunedRead(spark, zdir, "v", 100L, 499L)
    assert(ta === 16L && tb === 16L)
    assert(oa < ta, s"no skipping on id: $oa/$ta")
    assert(ob < tb, s"no skipping on v: $ob/$tb")
    assert(pa.count() === 400L)
    val expectB = (0L until 4000L).count(i => { val v = (i * 7919L) % 4001L
      v >= 100L && v <= 499L }).toLong
    assert(pb.count() === expectB)
  }
}
