package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Equality-delete merge-on-read (q126). Pins the Iceberg-v2 sequencing
  * contract: deletes hit strictly-lower-sequence rows only, re-inserts
  * survive, delete commits accumulate, compaction folds the log away
  * without changing content, and sequence numbers are recovered from file
  * names.
  */
class MergeOnReadSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val dir = new java.io.File(sys.props("java.io.tmpdir"),
      s"graft_mor_$tag").getAbsolutePath
    val p = new org.apache.hadoop.fs.Path(dir)
    p.getFileSystem(spark.sessionState.newHadoopConf()).delete(p, true)
    dir
  }

  private def liveSet(dir: String): Set[(Long, String, Long)] =
    MergeOnRead.read(spark, dir, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"),
        r.getAs[Long]("src_seq"))).toSet

  test("delete hits lower sequences only; re-insert survives") {
    val dir = freshDir("basic")
    assert(MergeOnRead.commitData(
      Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir) === 1L)
    assert(MergeOnRead.commitData(
      Seq((3L, "c")).toDF("k", "v"), dir) === 2L)
    assert(MergeOnRead.commitDeletes(
      Seq(1L, 3L).toDF("k"), dir, "k") === 3L)
    assert(MergeOnRead.commitData(
      Seq((1L, "a2")).toDF("k", "v"), dir) === 4L)
    assert(liveSet(dir) === Set((2L, "b", 1L), (1L, "a2", 4L)))
  }

  test("delete commits accumulate; later delete hits earlier re-insert") {
    val dir = freshDir("accum")
    MergeOnRead.commitData(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    MergeOnRead.commitDeletes(Seq(1L).toDF("k"), dir, "k")
    MergeOnRead.commitData(Seq((1L, "a2")).toDF("k", "v"), dir)
    MergeOnRead.commitDeletes(Seq(1L).toDF("k"), dir, "k")
    assert(liveSet(dir) === Set((2L, "b", 1L)))
  }

  test("read without any delete commit is the plain scan") {
    val dir = freshDir("nodel")
    MergeOnRead.commitData(Seq((7L, "x")).toDF("k", "v"), dir)
    assert(liveSet(dir) === Set((7L, "x", 1L)))
  }

  test("compactAway preserves content, clears the log, bumps the sequence") {
    val dir = freshDir("compact")
    MergeOnRead.commitData(
      (0L until 30L).map(i => (i, s"v$i")).toDF("k", "v"), dir)
    MergeOnRead.commitDeletes(
      (0L until 30L by 3L).toDF("k"), dir, "k")
    val before = liveSet(dir).map(t => (t._1, t._2))
    val newSeq = MergeOnRead.compactAway(spark, dir, "k")
    assert(newSeq === 3L)
    val after = MergeOnRead.read(spark, dir, "k").collect()
      .map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(after === before && before.size === 20)
    // log folded: every surviving row now carries the compaction sequence
    val seqs = MergeOnRead.read(spark, dir, "k")
      .select("src_seq").distinct().collect().map(_.getLong(0)).toSet
    assert(seqs === Set(3L))
  }

  test("partition invariance of the merge-on-read join") {
    val dir = freshDir("part")
    MergeOnRead.commitData((0L until 100L).map(i => (i, s"v$i"))
      .toDF("k", "v").repartition(7), dir)
    MergeOnRead.commitDeletes(
      (0L until 100L by 2L).toDF("k").repartition(5), dir, "k")
    assert(liveSet(dir).map(_._1) === (1L until 100L by 2L).toSet)
  }

  test("readAsOf reconstructs intermediate snapshots") {
    val dir = freshDir("asof")
    MergeOnRead.commitData(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), dir)
    MergeOnRead.commitDeletes(Seq(1L).toDF("k"), dir, "k")
    MergeOnRead.commitData(Seq((1L, "a2"), (3L, "c")).toDF("k", "v"), dir)
    def asOf(s: Long) = MergeOnRead.readAsOf(spark, dir, "k", s)
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[String]("v"))).toSet
    assert(asOf(1L) === Set((1L, "a"), (2L, "b")))
    assert(asOf(2L) === Set((2L, "b")))
    assert(asOf(3L) === Set((2L, "b"), (1L, "a2"), (3L, "c")))
  }

  test("changesBetween classifies insert/delete/update, drops unchanged") {
    val dir = freshDir("cdc")
    MergeOnRead.commitData(
      Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "v"), dir)
    MergeOnRead.commitDeletes(Seq(1L, 2L).toDF("k"), dir, "k")
    MergeOnRead.commitData(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"), dir)
    val got = MergeOnRead.changesBetween(spark, dir, "k", Seq("v"), 1L, 3L)
      .collect().map(r => r.getAs[Long]("k") ->
        r.getAs[String]("change_type")).toMap
    // 4 is live in both snapshots with identical payload: no row
    assert(got === Map(1L -> "delete", 2L -> "update", 3L -> "insert"))
  }
}
