package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** contaminationHits (q69): planted eval snippets must be found in every
  * document that contains them (multiple positions, multiple grams),
  * clean documents must not appear, and the corpus side must not shuffle
  * (broadcast semi-join plan).
  */
class DecontamSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val snippet = "alpha beta gamma delta"   // n=4 grams below
  private val docs = Seq(
    (0L, s"x y $snippet z w"),                     // one hit
    (1L, s"$snippet q $snippet"),                  // same gram at two positions
    (2L, "totally clean text with many words here"),
    (3L, s"p alpha beta gamma delta epsilon")      // overlapping region
  ).toDF("doc_id", "text")

  private def evalHashes = Seq(snippet).toDF("gram")
    .select(conv(substring(md5(col("gram")), 1, 15), 16, 10)
      .cast("long").as("h"))

  test("planted contamination found; clean docs absent") {
    val got = TextOps.contaminationHits(docs, evalHashes, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got === Set((0L, 1L, 1L), (1L, 2L, 1L), (3L, 1L, 1L)))
  }

  test("corpus side broadcasts, never shuffles") {
    val plan = TextOps.contaminationHits(docs, evalHashes, n = 4)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"expected broadcast join, got:\n$plan")
  }

  test("multi-gram eval set counts distinct grams") {
    val ev = Seq("alpha beta gamma delta", "beta gamma delta epsilon")
      .toDF("gram")
      .select(conv(substring(md5(col("gram")), 1, 15), 16, 10)
        .cast("long").as("h"))
    val got = TextOps.contaminationHits(docs, ev, n = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // doc 3 contains both grams once each
    assert(got === Set((0L, 1L, 1L), (1L, 2L, 1L), (3L, 2L, 2L)))
  }
}
