package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** StatsManifest.compact (q91): bin-packed rewrite of the small-file fleet —
  * rows preserved, file count drops, big files untouched (same paths in the
  * refreshed manifest), pruning still works, repeat run converges.
  */
class CompactionSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = new java.io.File(
    sys.props("java.io.tmpdir"), "graft_compact_spec").getAbsolutePath

  private val rows = (0L until 2000L).map(i => (i, i % 701, s"s${i % 5}"))

  test("compact packs small files, keeps big ones, preserves every row") {
    val df = rows.toDF("id", "v", "src")
    // 2 big base files + 10 small incremental appends
    StatsManifest.write(df.where(col("id") < 1600)
      .repartitionByRange(2, col("v")), dir, Seq("v"))
    StatsManifest.append(df.where(col("id") >= 1600)
      .repartition(10, col("id")), dir, Seq("v"))
    val man0 = spark.read.parquet(dir + "_manifest")
    assert(man0.count() === 12L)
    val bigFiles = man0.orderBy(desc("file_bytes")).select("file")
      .collect().take(2).map(_.getString(0)).toSet
    val smallMax = man0.orderBy(desc("file_bytes"))
      .collect().drop(2).map(_.getAs[Long]("file_bytes")).max
    val bigMin = man0.orderBy(desc("file_bytes"))
      .collect().take(2).map(_.getAs[Long]("file_bytes")).min
    assert(smallMax < bigMin, "fixture must separate big and small files")
    val threshold = (smallMax + bigMin) / 2

    val (before, after) =
      StatsManifest.compact(spark, dir, Seq("v"), threshold, 1L << 20)
    assert(before === 12L)
    assert(after < before, s"no compaction: $after/$before")
    val man1 = spark.read.parquet(dir + "_manifest")
    assert(man1.count() === after)
    val keptFiles = man1.select("file").collect().map(_.getString(0)).toSet
    assert(bigFiles.subsetOf(keptFiles), "big files must be untouched")

    // every row survives, readable through the manifest's file list
    val all = spark.read.parquet(keptFiles.toIndexedSeq: _*)
    assert(all.count() === 2000L)
    assert(all.agg(sum("id")).head.getLong(0) === rows.map(_._1).sum)

    // pruning still equals a full-scan filter on the compacted layout
    val (pruned, opened, total) =
      StatsManifest.prunedRead(spark, dir, "v", 100L, 160L)
    assert(opened <= total)
    val got = pruned.select("id").collect().map(_.getLong(0)).sorted
    val expect = rows.filter(r => r._2 >= 100 && r._2 <= 160).map(_._1).sorted
    assert(got.toSeq === expect)

    // repeat run converges (no-op or strictly fewer files, rows intact)
    val (b2, a2) =
      StatsManifest.compact(spark, dir, Seq("v"), threshold, 1L << 20)
    assert(b2 === after && a2 <= b2)
    val files2 = spark.read.parquet(dir + "_manifest")
      .select("file").collect().map(_.getString(0)).toIndexedSeq
    assert(spark.read.parquet(files2: _*).count() === 2000L)
  }
}
