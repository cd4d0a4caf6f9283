package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Round-6: per-file bloom skipping. Pins (a) the driver-side hash twin
  * against Spark's md5/conv chain, (b) zero false negatives — every
  * present key's rows are returned intact, (c) real skipping on a
  * hash-partitioned layout where min/max stats cannot prune, (d) absent
  * keys returning no rows regardless of false-positive opens.
  */
class BloomSkipSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("driver-side bloom positions equal the Spark expression chain") {
    import spark.implicits._
    val keys = Seq("0", "17", "987654", "hello")
    val got = keys.toDF("k").select(
      (0 until 3).map(j => pmod(conv(substring(md5(concat(col("k"),
        lit(s"#bloom$j"))), 1, 15), 16, 10).cast("long"),
        lit(256L)).as(s"p$j")): _*).collect()
    keys.zip(got).foreach { case (k, row) =>
      val want = StatsManifest.bloomPositions(k, 256, 3)
      assert((0 until 3).map(row.getLong) === want, s"key $k")
    }
  }

  test("no false negatives, real skipping, clean misses") {
    import spark.implicits._
    val dir = new java.io.File(
      sys.props("java.io.tmpdir"), s"bloomspec_${System.nanoTime()}")
      .getAbsolutePath
    val docs = (0L until 400L).map(i => (i, s"text of $i"))
      .toDF("doc_id", "text")
    StatsManifest.write(docs.repartition(8, col("doc_id")), dir,
      Seq("doc_id"))
    StatsManifest.writeBloom(spark, dir, "doc_id", bits = 256, k = 3)
    var sumOpened = 0L
    for (pk <- Seq(0L, 13L, 211L, 399L)) {
      val (df, opened, total) = StatsManifest.bloomPrunedRead(
        spark, dir, "doc_id", pk.toString)
      val rows = df.collect()
      assert(rows.length === 1 && rows.head.getLong(0) === pk,
        s"present key $pk must come back intact")
      assert(total === 8L)
      assert(opened >= 1L)
      sumOpened += opened
    }
    assert(sumOpened < 4 * 8, "bloom must actually skip files")
    val (miss, _, _) = StatsManifest.bloomPrunedRead(
      spark, dir, "doc_id", "999999")
    assert(miss.count() === 0L)
  }
}
