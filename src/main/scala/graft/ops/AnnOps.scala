package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.model.Synth

/** Similarity search over the `embeddings` table (vec_id, embedding:
  * array<float>, label).
  *
  * Two paths (SURVEY-mandated training-pipeline ops):
  *  - brute-force cosine top-k: broadcast the (small) query set against the
  *    full corpus — exact baseline;
  *  - LSH-bucketed: deterministic random-hyperplane signatures → candidates
  *    share a bucket → exact re-rank within buckets. The scale path: the
  *    corpus shuffles once on a short bucket key instead of crossing with
  *    every query.
  *
  * Dot products use `zip_with` + `aggregate` (codegen'd, no UDF).
  */
object AnnOps {

  private def dot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  private def norm(a: org.apache.spark.sql.Column) =
    sqrt(aggregate(transform(a, x => x * x), lit(0.0d), (acc, v) => acc + v))

  /** Cosine over DOUBLE-cast arrays: float32 inputs are upcast BEFORE the
    * products so every op is f64 — better numerics, and the DuckDB oracle
    * mirrors the exact fold (bit-identical, no ulp drift in rank order).
    */
  def cosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    val ad = transform(a, _.cast("double"))
    val bd = transform(b, _.cast("double"))
    dot(ad, bd) / (norm(ad) * norm(bd))
  }

  /** Exact cosine top-k of each query vector (queries = vec_id ∈ queryIds)
    * against the corpus. Query side is broadcast — no corpus shuffle at all.
    */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val q = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    embeddings.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  /** Deterministic hyperplane for (bit, dim): unit-free ±component derived
    * from splitmix64 — reproducible across sessions, no RNG state.
    */
  private def planeComponent(bit: Int, dim: Int): Double = {
    val h = Synth.mix64(bit.toLong * 131071L + dim.toLong)
    // map to (-1, 1)
    (h >>> 11).toDouble / (1L << 53).toDouble * 2.0 - 1.0
  }

  /** Sign-random-projection signature with `bits` hyperplanes over `dim`
    * dimensions, as a column (long, bits ≤ 63). `tableIdx` selects an
    * independent hyperplane set, so multi-table LSH gets genuinely
    * independent buckets (an XOR salt would preserve equality and add no
    * recall).
    */
  def srpSignature(emb: org.apache.spark.sql.Column, dim: Int, bits: Int,
                   tableIdx: Int = 0) = {
    val terms = (0 until bits).map { b =>
      val proj = aggregate(
        zip_with(emb,
          array((0 until dim).map(d => lit(planeComponent(tableIdx * bits + b, d))): _*),
          (x, p) => x * p),
        lit(0.0d), (acc, v) => acc + v)
      when(proj >= 0, lit(1L << b)).otherwise(lit(0L))
    }
    terms.reduce((a, b) => a.bitwiseOR(b))
  }

  /** LSH-bucketed ANN: bucket = SRP signature; candidates share a bucket in
    * any of `tables` independent signature tables; exact cosine re-rank
    * within candidates. Recall < 1 by construction (approximate); the
    * brute-force op above is the exactness baseline.
    */
  /** Distinct (query_id, vec_id) candidate pairs sharing an SRP bucket in
    * any of `tables` independent signature tables — the bucketing stage of
    * [[lshTopK]], exposed so Verify can dump it as an oracle input (the
    * exact-cosine re-rank is then SQL-recomputable from embeddings).
    */
  def lshCandidates(embeddings: DataFrame, queryIds: Seq[Long], dim: Int,
                    bits: Int, tables: Int): DataFrame = {
    val withSigs = embeddings.select(
      col("vec_id"),
      array((0 until tables).map(t =>
        srpSignature(col("embedding"), dim, bits, t)): _*).as("sigs"))
    val bucketed = withSigs.select(col("vec_id"),
      posexplode(col("sigs")).as(Seq("table_idx", "bucket")))
    val q = bucketed.where(col("vec_id").isin(queryIds: _*))
      .select(col("table_idx"), col("bucket"), col("vec_id").as("query_id"))
    bucketed.join(q, Seq("table_idx", "bucket"))
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
      .distinct()
  }

  def lshTopK(embeddings: DataFrame, queryIds: Seq[Long], dim: Int = 64,
              bits: Int = 12, tables: Int = 4, k: Int = 10): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    lshCandidates(embeddings, queryIds, dim, bits, tables)
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .join(broadcast(embeddings.where(col("vec_id").isin(queryIds: _*))
        .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"))),
        Seq("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"), round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (dedup flavor of
    * the same machinery): pairs in a shared bucket with cosine ≥ threshold.
    */
  /** Distinct (vec_a < vec_b) pairs sharing an SRP bucket — the blocking
    * stage of [[cosineNearDups]], exposed as an oracle input (the exact
    * cosine threshold filter is then SQL-recomputable from embeddings).
    */
  def cosineCandidates(embeddings: DataFrame, dim: Int, bits: Int): DataFrame = {
    val sigs = embeddings.select(col("vec_id"),
      srpSignature(col("embedding"), dim, bits).as("bucket"))
    val a = sigs.select(col("bucket"), col("vec_id").as("vec_a"))
    val b = sigs.select(col("bucket"), col("vec_id").as("vec_b"))
    a.join(b, Seq("bucket"))
      .where(col("vec_a") < col("vec_b"))
      .select(col("vec_a"), col("vec_b"))
      .distinct()
  }

  def cosineNearDups(embeddings: DataFrame, dim: Int = 64, bits: Int = 10,
                     threshold: Double = 0.95): DataFrame = {
    val e = embeddings.select(col("vec_id"), col("embedding"))
    cosineCandidates(embeddings, dim, bits)
      .join(e.select(col("vec_id").as("vec_a"), col("embedding").as("emb_a")), Seq("vec_a"))
      .join(e.select(col("vec_id").as("vec_b"), col("embedding").as("emb_b")), Seq("vec_b"))
      .withColumn("cos", cosine(col("emb_a"), col("emb_b")))
      .where(col("cos") >= threshold)
      .select(col("vec_a"), col("vec_b"), round(col("cos"), 6).as("cos"))
  }
}
