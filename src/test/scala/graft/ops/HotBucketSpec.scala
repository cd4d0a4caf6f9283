package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Degenerate-corpus hardening (round-4 item #3): a crawl corpus with
  * thousands of IDENTICAL signatures (flat images, boilerplate docs) must
  * not degenerate to a |bucket|² chunk self-join. The defense pre-aggregates
  * identical signatures into member→rep dup-group edges and joins DISTINCT
  * signatures only — verified here both structurally (the join inputs are
  * the post-aggregation rep table) and behaviorally (O(n) output, exact
  * edges).
  */
class HotBucketSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("10k identical signatures: O(n) dup-group edges, no clique") {
    val n = 10000
    val sigs = spark.range(0, n).select(
      format_string("doc%05d", col("id")).as("doc_id"),
      lit(0xDEADBEEFL).as("sim"))
    val pairs = HammingBlocking.nearDupPairs(sigs, "doc_id", "sim",
      "doc_a", "doc_b", maxHamming = 3)
    val rows = pairs.collect()
    // n-1 member→rep edges, all hamming 0, rep = min id — NOT n(n-1)/2
    assert(rows.length === n - 1)
    assert(rows.forall(_.getInt(2) === 0))
    assert(rows.forall(_.getString(0) === "doc00000"))
    // structural assert: the chunk self-join consumes the DISTINCT-signature
    // rep table (an Aggregate sits below every join), so a hot bucket can
    // hold at most one row per distinct signature
    val plan = pairs.queryExecution.optimizedPlan.toString
    assert(plan.contains("Aggregate"), "rep pre-aggregation missing from plan")
  }

  test("mixed corpus: group edges + rep cross edges span the same components") {
    // group A: sigs all 0b0000 (docs a0..a2); group B: sig 0b0001 (b0, b1);
    // C: far signature (c0)
    val sigs = Seq(
      ("a0", 0L), ("a1", 0L), ("a2", 0L),
      ("b0", 1L), ("b1", 1L),
      ("c0", 0xFFFFFFFFFFFFFFFL)).toDF("doc_id", "sim")
    val pairs = HammingBlocking.nearDupPairs(sigs, "doc_id", "sim",
      "doc_a", "doc_b", maxHamming = 3)
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2))).toSet
    assert(pairs === Set(
      ("a0", "a1", 0), ("a0", "a2", 0), // group A member→rep
      ("b0", "b1", 0),                  // group B member→rep
      ("a0", "b0", 1)))                 // rep→rep cross edge (hamming 1)
  }

  test("maxBucket cap drops oversized distinct-signature buckets only") {
    // 40 distinct sigs sharing chunk 0 (low 16 bits = 7): a hot bucket of
    // distinct signatures; cap 10 drops that bucket's candidates, but pairs
    // still surface via their OTHER chunks when those match
    val sigs = (0 until 40).map(i =>
      (f"d$i%02d", (i.toLong << 16) | 7L)).toDF("doc_id", "sim")
    val capped = HammingBlocking.nearDupPairs(sigs, "doc_id", "sim",
      "doc_a", "doc_b", maxHamming = 3, maxBucket = 10)
    // chunks 1..3 differ pairwise (i<<16 differs in chunk 1; chunks 2,3 all
    // zero → one giant bucket there too — also capped), chunk 0 capped →
    // candidates only from chunk 1 buckets (all singleton) → no pairs
    assert(capped.count() === 0L)
    val uncapped = HammingBlocking.nearDupPairs(sigs, "doc_id", "sim",
      "doc_a", "doc_b", maxHamming = 3, maxBucket = 0)
    // uncapped: distinct sigs differing only in chunk 1 → hamming ≤ 3 pairs
    // exist for i,j whose xor has ≤ 3 bits (e.g. 1^2=3 → 2 bits)
    assert(uncapped.count() > 0L)
  }
}
