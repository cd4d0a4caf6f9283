package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pigeonhole-blocked near-dup pairs over 64-bit signatures (SimHash dHash),
  * hardened for degenerate corpora (round-4 item #3).
  *
  * Real crawl corpora contain millions of IDENTICAL signatures (boilerplate
  * documents, near-black/flat images): a naive chunk self-join degenerates to
  * |bucket|² candidate pairs on those. Defense: identical signatures
  * pre-aggregate into dup GROUPS first — each member pairs with the group
  * representative (min id), O(m) rows instead of the m(m−1)/2 clique — and
  * only DISTINCT signatures enter the 4×16-bit chunk self-join (within
  * hamming ≤ 3, at least one 16-bit chunk is equal — pigeonhole, recall-
  * lossless). Connectivity is preserved for clustering consumers:
  * member→rep edges plus rep→rep cross edges span exactly the same
  * components as the full clique.
  *
  * Residual edge: adversarially many DISTINCT signatures sharing one 16-bit
  * chunk still produce a hot bucket (inherent to pigeonhole blocking).
  * `maxBucket > 0` opts into dropping (chunk_idx, chunk) buckets larger than
  * the cap — documented recall loss on exactly those buckets, never wrong
  * pairs.
  */
object HammingBlocking {

  /** `sigs` must have columns (idCol: string, sigCol: long). Returns
    * (aName, bName, hamming) with aName < bName per row: hamming-0 edges
    * member→rep for identical-signature groups, and exact-hamming edges
    * rep→rep for distinct signatures within `maxHamming`.
    */
  def nearDupPairs(sigs: DataFrame, idCol: String, sigCol: String,
                   aName: String, bName: String, maxHamming: Int,
                   longHamming: Boolean = false,
                   maxBucket: Int = 0): DataFrame = {
    val zero = if (longHamming) lit(0L) else lit(0)
    val s = sigs.select(col(idCol).as("id"), col(sigCol).cast("long").as("sig"))
    // one representative per distinct signature (min id — deterministic)
    val reps = s.groupBy(col("sig")).agg(min(col("id")).as("rep"))
    // identical-signature groups: member→rep edges, hamming 0
    val groupPairs = s.join(reps, Seq("sig"))
      .where(col("id") =!= col("rep"))
      .select(col("rep").as(aName), col("id").as(bName), zero.as("hamming"))
    // distinct signatures: chunk pigeonhole blocking + exact verify
    val chunked0 = reps.select(col("rep"), col("sig"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("sig"), i * 16).bitwiseAND(0xFFFFL)): _*))
        .as(Seq("chunk_idx", "chunk")))
    val chunked =
      if (maxBucket > 0) {
        val big = chunked0.groupBy(col("chunk_idx"), col("chunk"))
          .agg(count(lit(1)).as("bucket_n"))
          .where(col("bucket_n") > maxBucket)
          .select(col("chunk_idx"), col("chunk"))
        chunked0.join(big, Seq("chunk_idx", "chunk"), "left_anti")
      } else chunked0
    val a = chunked.select(col("chunk_idx"), col("chunk"),
      col("rep").as("rep_a"), col("sig").as("sig_a"))
    val b = chunked.select(col("chunk_idx"), col("chunk"),
      col("rep").as("rep_b"), col("sig").as("sig_b"))
    val ham0 = bit_count(col("sig_a").bitwiseXOR(col("sig_b")))
    val ham = if (longHamming) ham0.cast("long") else ham0
    val crossPairs = a.join(b, Seq("chunk_idx", "chunk"))
      .where(col("rep_a") < col("rep_b"))
      .select(col("rep_a").as(aName), col("rep_b").as(bName),
        ham.as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
    groupPairs.unionByName(crossPairs)
  }
}
