package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** scd2Apply (q86): close/open on change, no-op suppression, inserts,
  * history immutability across a second epoch.
  */
class MergeOpsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def snap(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("doc_id", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getBoolean(4)))
      .toSeq

  test("change closes + opens; no-op suppressed; insert opens") {
    val seed = MergeOps.scd2Seed(
      Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text"),
      "doc_id", "text", ts = 1L)
    val upd = Seq((1L, "a2"), (2L, "b"), (9L, "z")).toDF("doc_id", "text")
    val out = MergeOps.scd2Apply(seed, upd, "doc_id", "text", ts = 2L)
    assert(snap(out) === Seq(
      (1L, "a", 1L, 2L, false), (1L, "a2", 2L, MergeOps.OpenTo, true),
      (2L, "b", 1L, MergeOps.OpenTo, true),
      (3L, "c", 1L, MergeOps.OpenTo, true),
      (9L, "z", 2L, MergeOps.OpenTo, true)))
  }

  test("second epoch never touches closed history rows") {
    val seed = MergeOps.scd2Seed(Seq((1L, "a")).toDF("doc_id", "text"),
      "doc_id", "text", 1L)
    val e2 = MergeOps.scd2Apply(seed,
      Seq((1L, "a2")).toDF("doc_id", "text"), "doc_id", "text", 2L)
    val e3 = MergeOps.scd2Apply(e2,
      Seq((1L, "a3")).toDF("doc_id", "text"), "doc_id", "text", 3L)
    assert(snap(e3) === Seq(
      (1L, "a", 1L, 2L, false),
      (1L, "a2", 2L, 3L, false),
      (1L, "a3", 3L, MergeOps.OpenTo, true)))
    // re-applying the SAME payload is a global no-op
    val e3b = MergeOps.scd2Apply(e3,
      Seq((1L, "a3")).toDF("doc_id", "text"), "doc_id", "text", 4L)
    assert(snap(e3b) === snap(e3))
  }
}
