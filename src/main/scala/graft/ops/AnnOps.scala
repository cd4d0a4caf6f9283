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
    *
    * r7: the double-cast arrays and the two norm folds are PRECOMPUTED once
    * per row on each side instead of once per (corpus, query) PAIR — the
    * per-pair work drops from 3 array folds + 4 transforms to 1 zip_with
    * fold + 1 multiply + 1 divide. Bit-identical result: the same IEEE
    * fold over the same doubles, evaluated in a projection instead of
    * inside the pair expression (cos = dot(ad, bd) / (norm(ad)·norm(bd))
    * with identical operand values and operation order).
    */
  def bruteForceTopK(embeddings: DataFrame, queryIds: Seq[Long], k: Int = 10): DataFrame = {
    val ed = transform(col("embedding"), _.cast("double"))
    val corpus = embeddings
      .select(col("vec_id"), ed.as("ed"))
      .withColumn("nd", norm(col("ed")))
    val q = embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), ed.as("qd"))
      .withColumn("nq", norm(col("qd")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    corpus.crossJoin(broadcast(q))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", dot(col("ed"), col("qd")) / (col("nd") * col("nq")))
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

  // ---- IVF-Flat (the index-backed scale path complementing SRP-LSH) ----

  /** Cosine of an embedding column against a LITERAL centroid — the same
    * fold shape as [[cosine]] (zip_with + aggregate from 0.0), so the DuckDB
    * oracle's list_reduce mirrors it bit-for-bit.
    */
  private def cosineToLit(emb: org.apache.spark.sql.Column,
                          c: Array[Double]) = {
    val ed = transform(emb, _.cast("double"))
    val cd = array(c.map(lit): _*)
    aggregate(zip_with(ed, cd, (x, y) => x * y), lit(0.0d), (a, v) => a + v) /
      (norm(ed) * lit(math.sqrt(c.map(x => x * x).sum)))
  }

  /** Train `nlist` coarse IVF centroids: hash-min seeded (the nlist corpus
    * vectors with the smallest xxhash64(vec_id)) + `iters` Lloyd rounds.
    * Assignment is PURE COLUMN MATH against centroid literals — centroids
    * are metadata (nlist×dim doubles, like translation params), so the
    * corpus is never joined or shuffled to assign; the only shuffle per
    * round is the nlist-group mean aggregation. Component sums go through
    * exact decimals, so the trained centroids are bit-identical at any
    * partitioning (the oracle consumes the dumped table).
    * Returns the centroids as Array(list_id → components).
    */
  def ivfTrain(embeddings: DataFrame, dim: Int, nlist: Int,
               iters: Int): Array[Array[Double]] = {
    val seed = embeddings
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(nlist)
      .select(transform(col("embedding"), _.cast("double")).as("c"))
      .collect().map(_.getSeq[Double](0).toArray)
    var cents = seed
    for (_ <- 0 until iters) {
      val assigned = embeddings.withColumn("list_id", ivfAssignExpr(col("embedding"), cents))
      val means = assigned.groupBy("list_id").agg(
        count(lit(1)).as("n"),
        array((0 until dim).map(i =>
          (sum(element_at(col("embedding"), i + 1).cast("decimal(28,16)"))
            / count(lit(1))).cast("double")): _*).as("c"))
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](2).toArray).toMap
      // empty lists keep their previous centroid (standard Lloyd handling)
      cents = cents.indices.map(j => means.getOrElse(j, cents(j))).toArray
    }
    cents
  }

  /** list_id of the nearest centroid (max cosine, ties → smaller id) as a
    * single codegen'd expression over centroid literals — no join, no
    * shuffle, evaluated map-side wherever the corpus already lives.
    */
  def ivfAssignExpr(emb: org.apache.spark.sql.Column,
                    cents: Array[Array[Double]]) = {
    val packed = cents.zipWithIndex.map { case (c, j) =>
      struct(cosineToLit(emb, c).as("cos"), lit(-j).as("nid"))
    }
    (-array_max(array(packed.toIndexedSeq: _*)).getField("nid")).cast("int")
  }

  /** (query_id, q_emb, list_id) — each query's `nprobe` nearest lists by
    * centroid cosine (nlist struct literals sorted per row). Broadcast side
    * of every IVF search join.
    */
  private def probeLists(embeddings: DataFrame, queryIds: Seq[Long],
                         cents: Array[Array[Double]], nprobe: Int): DataFrame =
    embeddings.where(col("vec_id").isin(queryIds: _*))
      .select(col("vec_id").as("query_id"), col("embedding").as("q_emb"),
        slice(reverse(array_sort(array(cents.zipWithIndex.map { case (c, j) =>
          struct(cosineToLit(col("embedding"), c).as("cos"), lit(-j).as("nid"))
        }.toIndexedSeq: _*))), 1, nprobe).as("near"))
      .select(col("query_id"), col("q_emb"),
        explode(transform(col("near"), s => -s.getField("nid"))).as("list_id"))

  /** IVF-Flat top-k search: assign the corpus to lists map-side, pick each
    * query's `nprobe` nearest lists (by centroid cosine), exact-rerank only
    * inside those lists. One equi-join on the short list_id key — the same
    * shuffle discipline as the LSH path, but with data-adapted buckets
    * (higher recall on clustered corpora at the same candidate fraction).
    */
  def ivfTopK(embeddings: DataFrame, queryIds: Seq[Long],
              cents: Array[Array[Double]], nprobe: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    val corpus = embeddings
      .withColumn("list_id", ivfAssignExpr(col("embedding"), cents))
    corpus.join(broadcast(probeLists(embeddings, queryIds, cents, nprobe)),
        Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cos"))
  }

  // ---- IVF-SQ8 ("IVF-PQ-lite"): 8-bit scalar-quantized list payloads ----

  /** Per-dimension (min, max) quantizer stats — metadata like the IVF
    * centroids (2×dim doubles); min/max are order-independent, so the stats
    * are exact at any partitioning and the oracle recomputes them in SQL.
    */
  def sqTrain(embeddings: DataFrame, dim: Int): (Array[Double], Array[Double]) = {
    val row = embeddings.agg(
      array((0 until dim).map(i =>
        min(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mn"),
      array((0 until dim).map(i =>
        max(element_at(col("embedding"), i + 1).cast("double"))): _*).as("mx"))
      .head()
    (row.getSeq[Double](0).toArray, row.getSeq[Double](1).toArray)
  }

  /** SQ8 encode: per-dim `floor((x − mn) · scale)` clamped to [0, 255],
    * scale = 255/(mx−mn) (0 for a constant dimension). Deterministic
    * integer math — SQL-recomputable term for term.
    */
  def sqEncodeExpr(emb: org.apache.spark.sql.Column,
                   mn: Array[Double], mx: Array[Double]) =
    array(mn.indices.map { i =>
      val scale = if (mx(i) > mn(i)) 255.0 / (mx(i) - mn(i)) else 0.0
      least(greatest(floor((element_at(emb, i + 1).cast("double") - lit(mn(i)))
        * lit(scale)), lit(0.0)), lit(255.0)).cast("int")
    }: _*)

  /** SQ8 reconstruction: per-dim `mn + (code + 0.5) · ((mx − mn)/256)`. */
  def sqDecodeExpr(codes: org.apache.spark.sql.Column,
                   mn: Array[Double], mx: Array[Double]) =
    array(mn.indices.map { i =>
      val inv = (mx(i) - mn(i)) / 256.0
      lit(mn(i)) + (element_at(codes, i + 1).cast("double") + lit(0.5)) * lit(inv)
    }: _*)

  /** IVF-SQ8 top-k: the list payload is (vec_id, list_id, codes) — one byte
    * per dimension instead of 4 (float) or 8 (double), which is what
    * dominates IVF storage and scan bandwidth at 100 TB. Search probes
    * `nprobe` lists, ranks candidates by APPROXIMATE cosine against the
    * dequantized codes, and exact-reranks only the `shortlist` best per
    * query from the full-precision table (a vec_id equi-join sized
    * queries×shortlist). Quantization is deterministic integer math, so the
    * oracle replays encode, reconstruction, shortlist, and re-rank in SQL.
    */
  def ivfSqTopK(embeddings: DataFrame, queryIds: Seq[Long],
                cents: Array[Array[Double]], mn: Array[Double],
                mx: Array[Double], nprobe: Int, k: Int,
                shortlist: Int): DataFrame = {
    val index = embeddings.select(col("vec_id"),
      ivfAssignExpr(col("embedding"), cents).as("list_id"),
      sqEncodeExpr(col("embedding"), mn, mx).as("codes"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_approx").desc, col("vec_id").asc)
    val short = index
      .join(broadcast(probeLists(embeddings, queryIds, cents, nprobe)),
        Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_approx",
        cosine(sqDecodeExpr(col("codes"), mn, mx), col("q_emb")))
      .withColumn("ark", row_number().over(wA))
      .where(col("ark") <= shortlist)
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("cos_approx"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    short
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(wE))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cos"),
        round(col("cos_approx"), 6).as("cos_approx"))
  }

  // ---- IVF-PQ: product-quantized list payloads (round 5) ----

  /** Subvector of subspace `s` (sub-dim `d`) as a double array column. */
  private def pqSub(emb: org.apache.spark.sql.Column, s: Int, d: Int) =
    slice(transform(emb, _.cast("double")), s * d + 1, d)

  /** L2² of a subvector column against a literal sub-centroid — the
    * standard PQ assignment metric; same fold shape as [[cosine]] (zip_with
    * + aggregate from 0.0), so the oracle's list_reduce mirrors it
    * bit-for-bit.
    */
  private def l2ToLit(sub: org.apache.spark.sql.Column, c: Array[Double]) =
    aggregate(zip_with(sub, array(c.map(lit): _*), (x, y) => (x - y) * (x - y)),
      lit(0.0d), (a, v) => a + v)

  /** Code of the nearest sub-centroid (min L2², ties → smaller code) as
    * pure column math over codebook literals — map-side, like
    * [[ivfAssignExpr]].
    */
  private def pqAssignCode(sub: org.apache.spark.sql.Column,
                           book: Array[Array[Double]]) =
    array_min(array(book.zipWithIndex.map { case (c, j) =>
      struct(l2ToLit(sub, c).as("dist"), lit(j).as("j"))
    }.toIndexedSeq: _*)).getField("j")

  /** Train per-subspace PQ codebooks: `m` subspaces of `dim/m` dims, `ksub`
    * centroids each, seeded by the ksub corpus vectors with the smallest
    * xxhash64(vec_id) (same deterministic init as [[ivfTrain]]) + `iters`
    * Lloyd rounds with exact-decimal mean sums — bit-identical at any
    * partitioning; the codebooks are metadata (m×ksub×(dim/m) doubles),
    * dumped for the oracle like the IVF centroids.
    */
  def pqTrain(embeddings: DataFrame, dim: Int, m: Int, ksub: Int,
              iters: Int): Array[Array[Array[Double]]] = {
    require(dim % m == 0, "dim must divide into m subspaces")
    val d = dim / m
    val seed = embeddings
      .withColumn("h", xxhash64(col("vec_id")))
      .orderBy(col("h"), col("vec_id")).limit(ksub)
      .select(transform(col("embedding"), _.cast("double")).as("c"))
      .collect().map(_.getSeq[Double](0).toArray)
    var books = Array.tabulate(m)(s => seed.map(_.slice(s * d, s * d + d)))
    for (_ <- 0 until iters) {
      books = books.zipWithIndex.map { case (book, s) =>
        val sub = pqSub(col("embedding"), s, d)
        val means = embeddings
          .select(sub.as("sub"), pqAssignCode(sub, book).as("code"))
          .groupBy("code").agg(
            array((0 until d).map(i =>
              (sum(element_at(col("sub"), i + 1).cast("decimal(28,16)"))
                / count(lit(1))).cast("double")): _*).as("c"))
          .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
        // empty codes keep their previous centroid (standard Lloyd handling)
        book.indices.map(j => means.getOrElse(j, book(j))).toArray
      }
    }
    books
  }

  /** PQ encode: the m nearest-sub-centroid codes as an int array — at
    * ksub ≤ 256 this is ONE BYTE per subspace (m bytes per vector; with
    * m = dim/8 that is 8× smaller than SQ8's dim bytes — the storage tier
    * below SQ8 in the brute → LSH → IVF-Flat → SQ8 → PQ ladder).
    */
  def pqEncodeExpr(emb: org.apache.spark.sql.Column,
                   books: Array[Array[Array[Double]]]) = {
    val d = books.head.head.length
    array(books.zipWithIndex.map { case (book, s) =>
      pqAssignCode(pqSub(emb, s, d), book)
    }.toIndexedSeq: _*)
  }

  /** PQ reconstruction: concatenate each subspace's coded sub-centroid —
    * a literal table lookup per subspace, SQL-recomputable.
    */
  def pqDecodeExpr(codes: org.apache.spark.sql.Column,
                   books: Array[Array[Array[Double]]]) =
    flatten(array(books.zipWithIndex.map { case (book, s) =>
      element_at(
        array(book.map(c => array(c.map(lit): _*)).toIndexedSeq: _*),
        element_at(codes, s + 1) + 1)
    }.toIndexedSeq: _*))

  /** IVF-PQ top-k: coarse IVF lists + product-quantized payloads
    * (vec_id, list_id, m codes). Search probes `nprobe` lists, ranks
    * candidates by APPROXIMATE cosine against the PQ reconstruction, and
    * exact-reranks the `shortlist` best per query from the full-precision
    * table — the ivfSqTopK contract with an 8×-smaller list payload.
    */
  def ivfPqTopK(embeddings: DataFrame, queryIds: Seq[Long],
                cents: Array[Array[Double]],
                books: Array[Array[Array[Double]]],
                nprobe: Int, k: Int, shortlist: Int): DataFrame = {
    val index = embeddings.select(col("vec_id"),
      ivfAssignExpr(col("embedding"), cents).as("list_id"),
      pqEncodeExpr(col("embedding"), books).as("codes"))
    val wA = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_approx").desc, col("vec_id").asc)
    val short = index
      .join(broadcast(probeLists(embeddings, queryIds, cents, nprobe)),
        Seq("list_id"))
      .where(col("vec_id") =!= col("query_id"))
      .withColumn("cos_approx",
        cosine(pqDecodeExpr(col("codes"), books), col("q_emb")))
      .withColumn("ark", row_number().over(wA))
      .where(col("ark") <= shortlist)
      .select(col("query_id"), col("q_emb"), col("vec_id"), col("cos_approx"))
    val wE = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("vec_id").asc)
    short
      .join(embeddings.select(col("vec_id"), col("embedding")), Seq("vec_id"))
      .withColumn("cos", cosine(col("embedding"), col("q_emb")))
      .withColumn("rk", row_number().over(wE))
      .where(col("rk") <= k)
      .select(col("query_id"), col("rk"), col("vec_id"),
        round(col("cos"), 6).as("cos"),
        round(col("cos_approx"), 6).as("cos_approx"))
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

  /** SemDeDup (Abbas et al. 2023, public method): semantic deduplication by
    * k-means-cluster-bounded pairwise cosine — vectors land in their
    * nearest-centroid cluster, pairs are scored only WITHIN a cluster, and
    * pairs at/above `threshold` become near-dup edges feeding the q62
    * connected-components keep-list (keep = min vec_id per component).
    *
    * 100 TB design: cluster assignment is map-side literal math (no join —
    * [[ivfAssignExpr]]); the single corpus shuffle is the list_id exchange
    * for pairing; the quadratic is bounded per cluster, which is the whole
    * point of the method — nlist is sized so |corpus|/nlist rows fit a
    * task, and oversize clusters split recursively at scale (documented
    * cap, same discipline as HammingBlocking). Edges carry only ids, and
    * the component pass is the O(log diameter) label-propagation operator.
    */
  def semDedup(embeddings: DataFrame, cents: Array[Array[Double]],
               threshold: Double): DataFrame = {
    val asg = embeddings.select(col("vec_id"), col("embedding"),
      ivfAssignExpr(col("embedding"), cents).as("list_id"))
    val a = asg.select(col("list_id"), col("vec_id").as("vec_a"),
      col("embedding").as("emb_a"))
    val b = asg.select(col("list_id"), col("vec_id").as("vec_b"),
      col("embedding").as("emb_b"))
    val edges = a.join(b, Seq("list_id"))
      .where(col("vec_a") < col("vec_b"))
      .where(cosine(col("emb_a"), col("emb_b")) >= threshold)
      .select(col("vec_a"), col("vec_b"))
    Clustering.keepList(embeddings.select(col("vec_id")), edges,
      idCol = "vec_id", aCol = "vec_a", bCol = "vec_b")
  }


  /** Seeded ±1 sign matrix for [[jlProject]] — md5-derived (first 15 hex
    * chars of md5("seed#j#i") parsed as a long, parity picks the sign) so
    * the matrix is reproducible anywhere; dumped by the gate for the
    * oracle (ivf_centroids precedent).
    */
  def jlSigns(dim: Int, m: Int, seed: Long): Array[Array[Double]] =
    Array.tabulate(m, dim) { (j, i) =>
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$seed#$j#$i".getBytes("UTF-8"))
      val hex = d.map(b => f"${b & 0xff}%02x").mkString.substring(0, 15)
      if (java.lang.Long.parseLong(hex, 16) % 2 == 0) 1.0 else -1.0
    }

  /** Johnson–Lindenstrauss random projection to `m` dimensions with
    * seeded ±1 signs (Achlioptas 2003, database-friendly projections):
    * E‖y‖² = m·‖x‖², pairwise distances preserved within (1±ε) for
    * m = O(log n / ε²) — the cheap dimensionality reducer in front of
    * ANN/clustering when 64-dim exact math is overkill.
    *
    * Determinism: the sign matrix is literal metadata (no join); each
    * output coordinate is ONE fixed-order fold over the embedding array
    * (zip_with + aggregate from 0.0 — IEEE-identical to the oracle's
    * ordered list_reduce), so values gate bit-for-bit. Unnormalized: the
    * 1/√m factor is a consumer-side constant (keeps the op
    * transcendental-free).
    *
    * Plan: ZERO-shuffle — m codegen'd folds + one posexplode per row.
    */
  def jlProject(embeddings: DataFrame, dim: Int, m: Int,
                seed: Long = 7L): DataFrame = {
    require(dim >= 1 && m >= 1)
    val signs = jlSigns(dim, m, seed)
    val ys = (0 until m).map { j =>
      aggregate(
        zip_with(col("embedding"), typedlit(signs(j).toSeq),
          (x, s) => x.cast("double") * s),
        lit(0.0), (a, v) => a + v)
    }
    embeddings
      .select(col("vec_id"), posexplode(array(ys: _*)).as(Seq("j", "y")))
      .select(col("vec_id"), col("j"),
        (round(col("y"), 6) + 0.0).as("y"))
  }
}
