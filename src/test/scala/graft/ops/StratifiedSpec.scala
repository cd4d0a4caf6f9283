package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** stratifiedSample (q74): per-stratum size = min(n, |stratum|), members
  * identical at any partitioning (no RNG state), different seeds pick
  * different members, and undersized strata keep everything.
  */
class StratifiedSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus = (0L until 300L).map(i => (i, s"s${i % 4}"))
    .toDF("doc_id", "source")
    // stratum s3 is tiny: only 3 rows survive this filter
    .where(col("source") =!= "s3" || col("doc_id") < 12)

  test("sizes, determinism across partitionings, undersized strata") {
    def run(parts: Int): Map[String, Seq[Long]] =
      TextOps.stratifiedSample(corpus.repartition(parts),
        "source", "doc_id", n = 10, seed = 7L)
        .collect()
        .groupBy(_.getAs[String]("source"))
        .view.mapValues(_.map(_.getAs[Long]("doc_id")).sorted.toSeq).toMap
    val a = run(1); val b = run(9)
    assert(a === b, "sample membership must be partition-invariant")
    assert(a("s0").size === 10 && a("s1").size === 10 && a("s2").size === 10)
    assert(a("s3").size === 3, "undersized stratum keeps all rows")
  }

  test("different seeds pick different members") {
    def members(seed: Long) =
      TextOps.stratifiedSample(corpus, "source", "doc_id", 10, seed)
        .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(members(7L) !== members(8L))
  }

  test("ranks are dense 1..k per stratum") {
    val ranks = TextOps.stratifiedSample(corpus, "source", "doc_id", 10, 7L)
      .groupBy("source").agg(collect_list("sample_rank").as("rs"))
      .collect()
      .map(r => r.getAs[String]("source") -> r.getSeq[Int](1).sorted)
      .toMap
    assert(ranks("s0") === (1 to 10))
    assert(ranks("s3") === (1 to 3))
  }
}
