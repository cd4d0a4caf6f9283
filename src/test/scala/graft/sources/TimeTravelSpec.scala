package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.TestSpark

/** Snapshots + timeTravelRead + vacuum (q93): every commit (write/append/
  * compact) is a numbered snapshot; AS OF reads survive compaction;
  * vacuum reclaims superseded files and forfeits history by design.
  */
class TimeTravelSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = new java.io.File(
    sys.props("java.io.tmpdir"), "graft_timetravel_spec").getAbsolutePath

  private val rows = (0L until 1000L).map(i => (i, i % 307))

  test("write/append/compact commit v1/v2/v3; AS OF reads are exact") {
    val df = rows.toDF("id", "v")
    StatsManifest.write(df.where(col("id") < 800)
      .repartitionByRange(2, col("v")), dir, Seq("v"))
    assert(StatsManifest.latestVersion(spark, dir) === 1L)
    StatsManifest.append(df.where(col("id") >= 800)
      .repartition(8, col("id")), dir, Seq("v"))
    assert(StatsManifest.latestVersion(spark, dir) === 2L)
    val man = spark.read.parquet(dir + "_manifest")
      .orderBy(desc("file_bytes")).collect()
    val thr = (man.drop(2).map(_.getAs[Long]("file_bytes")).max +
      man.take(2).map(_.getAs[Long]("file_bytes")).min) / 2
    val (b, a) = StatsManifest.compact(spark, dir, Seq("v"), thr, 1L << 20)
    assert(a < b)
    assert(StatsManifest.latestVersion(spark, dir) === 3L)

    def ids(version: Long): Seq[Long] =
      StatsManifest.timeTravelRead(spark, dir, version)
        .select("id").collect().map(_.getLong(0)).sorted.toSeq
    assert(ids(1L) === (0L until 800L))
    assert(ids(2L) === (0L until 1000L))
    assert(ids(3L) === (0L until 1000L)) // compaction preserves content
  }

  test("vacuum reclaims superseded files; current read intact") {
    val manFiles = spark.read.parquet(dir + "_manifest")
      .select("file").collect().map(_.getString(0)).toIndexedSeq
    val deleted = StatsManifest.vacuum(spark, dir)
    assert(deleted > 0L, "compaction must have left superseded files")
    assert(StatsManifest.latestVersion(spark, dir) === 3L)
    assert(spark.read.parquet(manFiles: _*).count() === 1000L)
    // history is forfeited by design
    intercept[Exception] {
      StatsManifest.timeTravelRead(spark, dir, 1L).count()
    }
    // re-vacuum is a no-op
    assert(StatsManifest.vacuum(spark, dir) === 0L)
  }
}
