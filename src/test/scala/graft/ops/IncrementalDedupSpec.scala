package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** incrementalDedup (q83): routing of a crawl increment against a frozen
  * history — verbatim replant → exact_dup, head-trimmed replant → near_dup
  * (band-count evidence), unique-token doc → new; near_match is the MIN
  * matching historical id.
  */
class IncrementalDedupSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def doc(id: Long, seed: String): (Long, String) =
    (id, (0 until 30).map(j => s"${seed}_$j").mkString(" "))

  test("exact / near / new routing against history") {
    val history = Seq(doc(1L, "alpha"), doc(2L, "beta"), doc(3L, "gamma"))
      .toDF("doc_id", "text")
    val nearText = doc(0L, "beta")._2.split(" ").drop(2).mkString(" ")
    val increment = Seq(
      (101L, doc(0L, "alpha")._2), // verbatim → exact_dup
      (102L, nearText),            // trimmed beta → near_dup vs 2
      (103L, doc(0L, "zeta")._2)   // fresh tokens → new
    ).toDF("doc_id", "text")

    val out = TextOps.incrementalDedup(increment, history)
      .orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(3))).toSeq ===
      Seq((101L, "exact_dup"), (102L, "near_dup"), (103L, "new")))
    val near = out.find(_.getLong(0) == 102L).get
    assert(near.getLong(2) === 2L)       // near_match = historical id
    val fresh = out.find(_.getLong(0) == 103L).get
    assert(fresh.getLong(1) === 0L && fresh.getLong(2) === -1L)
  }

  test("exact beats near when both fire; multiple exact copies counted") {
    val history = Seq(doc(1L, "alpha"), doc(2L, "alpha")).toDF("doc_id", "text")
    val increment = Seq((201L, doc(0L, "alpha")._2)).toDF("doc_id", "text")
    val r = TextOps.incrementalDedup(increment, history).collect().head
    assert(r.getLong(1) === 2L)          // two verbatim copies in history
    assert(r.getString(3) === "exact_dup")
  }
}
