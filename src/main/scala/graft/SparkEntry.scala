package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.GeomFunctions._
import graft.model.Synth
import graft.ops._

/** Driver contract (SURVEY.md §7; builder prompt).
  *
  * Each `queries` entry is one operator family from SURVEY.md §2 or a
  * training-pipeline op; SQL-expressible ones carry a DuckDB oracle in
  * `oracleSql` (names and column aliases MUST match — the driver sorts
  * columns by name and hashes values).
  *
  * Determinism discipline for oracle-checked float aggregates: sums go
  * through an exact DECIMAL cast in BOTH engines (order-independent), then
  * back to double — bit-identical regardless of partitioning.
  */
object SparkEntry {

  private def p(dir: String, t: String) = s"$dir/$t.parquet"

  /** Per-run-unique scratch dir for lakehouse fixtures that are deleted
    * and rewritten each run: two concurrent harness invocations on one
    * host must never share (and corrupt) a fixture path, so the name is
    * suffixed with the Spark application id — unique per session, stable
    * within a run, no RNG (r5 ADVICE). */
  private def fixtureDir(s: SparkSession, name: String): String =
    new java.io.File(sys.props("java.io.tmpdir"),
      s"${name}_${s.sparkContext.applicationId}").getAbsolutePath

  /** Parse scale factor from ".../sfX.Y" for the synth geometry tables. */
  def sfOf(dir: String): Double = {
    val m = "sf([0-9.]+)".r.findFirstMatchIn(dir)
    m.map(_.group(1).toDouble).getOrElse(0.001)
  }

  def nBuildings(sf: Double): Long = math.max(16L, (4000 * sf).toLong)
  def nImages(sf: Double): Long = math.max(256L, (400000 * sf).toLong)
  def nOther(sf: Double): Long = math.max(16L, nBuildings(sf) / 2)
  // q114 mosaic: side×side 16-px tiles (3 at smoke scale, 6 at the sf0.01
  // gate, capped 12 — the oracle's transitive-closure CTE is quadratic in
  // blob size, so gate-scale stays deliberately bounded)
  def mosaicSide(sf: Double): Int = math.max(3, math.min(12, (sf * 600).toInt))

  private def synthSurfaces(s: SparkSession, dir: String): DataFrame =
    Synth.surfaces(s, nBuildings(sfOf(dir))).toDF()

  private def synthImages(s: SparkSession, dir: String): DataFrame = {
    val sf = sfOf(dir)
    Synth.withAnchors(Synth.images(s, nImages(sf), nBuildings(sf)).toDF(), nBuildings(sf))
  }


  /** Seeded integer-coordinate segment layer for the q129 overlay join:
    * endpoints on a [0, 4096)^2 grid, per-axis extent <= 192 so the
    * level-13 (128 m) cell cover of any segment AABB stays O(1). Pure
    * column math; the dump carries the values, so the oracle never
    * re-derives the generator.
    */
  private[graft] def synthSegments(s: SparkSession, n: Long,
                                   salt: Long): DataFrame = {
    val h = (k: Long) => xxhash64(col("id"), lit(salt + k))
    s.range(n).select(col("id").as("seg_id"),
        pmod(h(0), lit(4096L)).as("x1"), pmod(h(1), lit(4096L)).as("y1"),
        (pmod(h(2), lit(385L)) - 192L).as("dx"),
        (pmod(h(3), lit(385L)) - 192L).as("dy"))
      .select(col("seg_id"), col("x1"), col("y1"),
        greatest(lit(0L), least(lit(4095L), col("x1") + col("dx"))).as("x2"),
        greatest(lit(0L), least(lit(4095L), col("y1") + col("dy"))).as("y2"))
  }


  /** Seeded integer point layer for the q132 snap join (same grid as the
    * segment layers).
    */
  private[graft] def synthPoints(s: SparkSession, n: Long,
                                 salt: Long): DataFrame =
    s.range(n).select(col("id").as("point_id"),
      pmod(xxhash64(col("id"), lit(salt)), lit(4096L)).as("x"),
      pmod(xxhash64(col("id"), lit(salt + 1)), lit(4096L)).as("y"))


  /** Seeded clustered point cloud for the q154 DBSCAN gate: ~7/8 of the
    * points jitter ±30 around one of 24 seeded cluster centers on a
    * [2000, 62000)² domain, ~1/8 are uniform noise over [0, 65536)² —
    * at eps=25/minPts=4 the gate corpus yields a genuine core/border/noise
    * mix. Values carried by the input dump; the oracle replays DBSCAN
    * itself (all-pairs + recursive CTE), never this generator.
    */
  private[graft] def synthClusterPoints(s: SparkSession, n: Long): DataFrame =
    s.range(n).select(col("id").as("point_id"),
        pmod(xxhash64(col("id"), lit(901L)), lit(8L)).as("nz"),
        pmod(xxhash64(col("id"), lit(902L)), lit(24L)).as("c"))
      .select(col("point_id"),
        when(col("nz") === 0L,
          pmod(xxhash64(col("point_id"), lit(904L)), lit(65536L)))
          .otherwise(pmod(xxhash64(col("c"), lit(905L)), lit(60000L)) + 2000L
            + pmod(xxhash64(col("point_id"), lit(906L)), lit(61L)) - 30L)
          .as("x"),
        when(col("nz") === 0L,
          pmod(xxhash64(col("point_id"), lit(907L)), lit(65536L)))
          .otherwise(pmod(xxhash64(col("c"), lit(908L)), lit(60000L)) + 2000L
            + pmod(xxhash64(col("point_id"), lit(909L)), lit(61L)) - 30L)
          .as("y"))

  private[graft] def dbscanN(sf: Double): Long =
    math.max(160L, (40000 * sf).toLong)

  /** Seeded rating triples for the q158 matrix-factorization gate:
    * ~1/3 of the user×item grid rated, rating = planted rank-2 integer
    * micro-unit structure (tu·ti div Scale) + ±10000 micro noise. Values
    * carried by the dump; the oracle replays TRAINING, never this
    * generator.
    */
  private[graft] def synthRatings(s: SparkSession, nUsers: Long,
                                  nItems: Long): DataFrame =
    s.range(nUsers * nItems)
      .selectExpr(s"id div $nItems AS user_id", s"id % $nItems AS item_id")
      .where("pmod(xxhash64(user_id, item_id, 55), 3) = 0")
      .selectExpr("user_id", "item_id",
        s"""((pmod(xxhash64(user_id, 31), 1000001) - 500000)
            * (pmod(xxhash64(item_id, 41), 1000001) - 500000)
          + (pmod(xxhash64(user_id, 32), 1000001) - 500000)
            * (pmod(xxhash64(item_id, 42), 1000001) - 500000)) div 1000000
          + pmod(xxhash64(user_id, item_id, 66), 20001) - 10000
          AS rating""")

  private[graft] def mfUsers(sf: Double): Long =
    math.max(48L, (6000 * sf).toLong)
  private[graft] def mfItems(sf: Double): Long =
    math.max(24L, (3000 * sf).toLong)

  /** Seeded walker tracks for the q133 dwell op: 30 s steps, per-walker
    * 20-step blocks where ~1/3 freeze in place (planted stops), positions
    * offset to stay positive (the `div`-vs-`//` floor contract).
    */
  private[graft] def synthTracks(s: SparkSession, nWalkers: Long,
                                 nSteps: Long): DataFrame = {
    val byW = org.apache.spark.sql.expressions.Window
      .partitionBy("walker_id").orderBy("seq")
    s.range(nWalkers * nSteps)
      .select((col("id") / nSteps).cast("long").as("walker_id"),
        pmod(col("id"), lit(nSteps)).as("seq"))
      .withColumn("pause",
        pmod(xxhash64(col("walker_id"), expr("seq div 20"), lit(77L)),
          lit(3L)) === 0L)
      .withColumn("dx", when(col("pause"), lit(0L)).otherwise(
        pmod(xxhash64(col("walker_id"), col("seq"), lit(501L)), lit(21L))
          - 10L))
      .withColumn("dy", when(col("pause"), lit(0L)).otherwise(
        pmod(xxhash64(col("walker_id"), col("seq"), lit(502L)), lit(21L))
          - 10L))
      .select(col("walker_id"), col("seq"),
        (lit(1700000000000000L) + col("seq") * 30000000L).as("ts_us"),
        (lit(100000L) + pmod(xxhash64(col("walker_id"), lit(1000L)),
          lit(4096L)) + sum(col("dx")).over(byW.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))).as("x"),
        (lit(100000L) + pmod(xxhash64(col("walker_id"), lit(1001L)),
          lit(4096L)) + sum(col("dy")).over(byW.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding,
          org.apache.spark.sql.expressions.Window.currentRow))).as("y"))
  }


  /** Seeded 16×16 road-grid DAG for q135: node (i,j) = i*16+j, right and
    * down edges with integer weights 1..9. Fixed size — the oracle's
    * relaxation-round CTE chain must cover the hop diameter (30), and 32
    * generated rounds do.
    */
  private[graft] def synthGridEdges(s: SparkSession, n: Int): DataFrame = {
    val nodes = s.range(n.toLong * n)
      .select(col("id"), (col("id") / n).cast("long").as("i"),
        pmod(col("id"), lit(n.toLong)).as("j"))
    val right = nodes.where(col("j") < n - 1)
      .select(col("id").as("src"), (col("id") + 1L).as("dst"),
        (pmod(xxhash64(col("id"), lit(900L)), lit(9L)) + 1L).as("w"))
    val down = nodes.where(col("i") < n - 1)
      .select(col("id").as("src"), (col("id") + n.toLong).as("dst"),
        (pmod(xxhash64(col("id"), lit(901L)), lit(9L)) + 1L).as("w"))
    right.unionByName(down)
  }


  /** Segment layer in the walker-track domain (q150): the q129 generator
    * re-based onto [96000, 96000 + 16384)^2 so tracks and roads share a
    * world.
    */
  private[graft] def synthTrackSegments(s: SparkSession,
                                        n: Long): DataFrame = {
    val h = (k: Long) => xxhash64(col("id"), lit(900L + k))
    s.range(n).select(col("id").as("seg_id"),
        (lit(96000L) + pmod(h(0), lit(16384L))).as("x1"),
        (lit(96000L) + pmod(h(1), lit(16384L))).as("y1"),
        (pmod(h(2), lit(385L)) - 192L).as("dx"),
        (pmod(h(3), lit(385L)) - 192L).as("dy"))
      .select(col("seg_id"), col("x1"), col("y1"),
        greatest(lit(96000L), least(lit(96000L + 16383L),
          col("x1") + col("dx"))).as("x2"),
        greatest(lit(96000L), least(lit(96000L + 16383L),
          col("y1") + col("dy"))).as("y2"))
  }

  /** q62 fixtures (shared by the query and dumpInputs so the dumped edge
    * table is in lockstep with what the engine clusters): a chained
    * near-dup corpus and the union of minhash + simhash near-dup edge
    * tables over it — the exact shape a production dedup pipeline feeds
    * into clustering.
    */
  private[graft] def q62Corpus(s: SparkSession, dir: String): DataFrame =
    Synth.chainDocs(s, math.max(8L, (2000 * sfOf(dir)).toLong))

  /** q83 crawl increment (shared by the query and dumpInputs), pure column
    * math over the frozen corpus: every 50th doc replanted verbatim
    * (exact dup), every 50th+1 with its first two tokens trimmed (near
    * dup — high Jaccard, many shared bands), plus fresh unique-token docs.
    */
  private[graft] def q83Increment(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(p(dir, "documents"))
    val exact = docs.where(col("doc_id") % 50 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = docs.where(col("doc_id") % 50 === 1)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        concat_ws(" ", slice(split(col("text"), " "), 3, Int.MaxValue))
          .as("text"))
    val fresh = s.range(3000000L, 3000020L).select(col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(25)),
        j => concat(lit("f"), col("id"), lit("_"), j))).as("text"))
    exact.unionByName(near).unionByName(fresh)
  }

  /** q85 oracle helper: integer BT.601 luma (×1000, floor-divided) of the
    * 0-based pixel index expression `j` over the 1-based dumped px list —
    * the exact mirror of the Scala `(299r + 587g + 114b) / 1000`.
    */
  private def q85Lum(j: String): String =
    s"((299*px[($j)*3+1] + 587*px[($j)*3+2] + 114*px[($j)*3+3]) // 1000)"

  /** q63 merge table (shared by the query and dumpInputs): BPE merges
    * trained on a deterministic 10% doc_id slice — sampled trainer, full
    * corpus encode, the production shape.
    */
  private[graft] def q63Merges(s: SparkSession, dir: String): Seq[(String, String)] =
    BpeTokenizer.trainFromDocs(
      s.read.parquet(p(dir, "documents"))
        .where(pmod(col("doc_id"), lit(10L)) === 0),
      nMerges = 24)

  /** q65 near-dup edges (shared by the query and dumpInputs): simhash
    * pairs over the exact-dedup survivors — the recipe's clustering input.
    */
  private[graft] def q65Edges(s: SparkSession, dir: String): DataFrame = {
    val docs = s.read.parquet(p(dir, "documents"))
    val kept1 = docs.join(
      TextOps.dedupExact(docs).select(col("keep_doc_id").as("doc_id")),
      "doc_id")
    TextOps.simhashNearDups(kept1).select("doc_a", "doc_b")
  }

  private[graft] def q62Edges(docs: DataFrame): DataFrame = {
    val mh = TextOps.minhashNearDups(docs, k = 3, bands = 16, rows = 2,
      threshold = 0.6).select(col("doc_a"), col("doc_b"))
    val sh = TextOps.simhashNearDups(docs, maxHamming = 3)
      .select(col("doc_a"), col("doc_b"))
    mh.unionByName(sh).distinct()
  }

  /** q153 fixture: 600 16×16 striped images in three orientation classes
    * (0 vertical / 1 horizontal / 2 diagonal stripes) with deterministic
    * per-image phase, level, amplitude, ±11 pseudo-noise, AND a weaker
    * CONFUSER stripe at one of the two non-label orientations — the class
    * is linearly recoverable from the global HOG orientation histogram
    * (vertical → bins 3/7, horizontal → 4/6, diagonal → 1/7) but no
    * single bin is pure (measured probe accuracy 0.927, not 1.0).
    */
  private[graft] def probeImages(s: SparkSession): DataFrame = {
    import s.implicits._
    s.range(0L, 600L, 1L, 8).map { id =>
      val label = (id % 3).toInt
      val phase = ((id / 3) % 4).toInt
      val base = 60 + ((id * 7) % 30).toInt
      val amp = 80 + ((id * 13) % 50).toInt
      val conf = (label + 1 + ((id / 3) % 2)).toInt % 3
      val amp2 = 45 + ((id * 11) % 40).toInt
      val phase2 = ((id / 7) % 4).toInt
      val px = new Array[Byte](16 * 16 * 3)
      var j = 0
      while (j < 256) {
        val x = j % 16; val y = j / 16
        def dir(o: Int): Int = o match {
          case 0 => x
          case 1 => y
          case _ => x + y
        }
        val stripe = if (((dir(label) + phase) / 2) % 2 == 0) amp else 0
        val stripe2 = if (((dir(conf) + phase2) / 2) % 2 == 0) amp2 else 0
        val noise = ((id * 31 + j * 17) % 23).toInt - 11
        val v = math.max(0, math.min(255, base + stripe + stripe2 + noise))
        px(3 * j) = v.toByte; px(3 * j + 1) = v.toByte
        px(3 * j + 2) = v.toByte
        j += 1
      }
      (f"p$id%04d", id, label.toLong,
        graft.model.ImageCodec.encodeRaw(px), 16, 16, "raw")
    }.toDF("image_id", "img_no", "label", "bytes", "w", "h", "fmt")
  }

  /** Global 8-bin HOG orientation proportions of the q153 fixture in
    * micro-units (one 16×16 cell per image — hogCells at cellSize 16),
    * plus the label: the feature table the linear probes train on and the
    * `probe_feats` oracle input dump.
    */
  private[graft] def probeFeats(s: SparkSession): DataFrame = {
    val S = MlOps.Scale
    val imgs = probeImages(s)
    val agg = ImageOps.hogCells(s, imgs, cellSize = 16)
      .groupBy("image_id")
      .agg(sum(when(col("bin") === 0, col("mag")).otherwise(0L)).as("m0"),
        (1 until 8).map(b =>
          sum(when(col("bin") === b, col("mag")).otherwise(0L)).as(s"m$b")): _*)
    imgs.select("image_id", "img_no", "label")
      .join(agg, Seq("image_id"))
      .select(col("img_no") +: col("label") +:
        (0 until 8).map(b =>
          expr(s"(m$b * $S) div greatest(m0+m1+m2+m3+m4+m5+m6+m7, 1)")
            .as(s"r${b + 1}")): _*)
  }

  /** Dump the synthetic INPUT tables under `<outDir>/inputs/` so the DuckDB
    * oracles can recompute the geometry/engine queries from first principles
    * (see [[OracleSql]]). Parameters (k/bands/bits/…) stay in lockstep with
    * the corresponding `queries` entries.
    */
  def dumpInputs(s: SparkSession, sfDir: String, outDir: String): Unit = {
    import s.implicits._
    def w(df: DataFrame, name: String): Unit =
      df.coalesce(1).write.mode("overwrite").parquet(s"$outDir/inputs/$name.parquet")
    val surf = synthSurfaces(s, sfDir)
    w(surf, "surfaces")
    val imgs = synthImages(s, sfDir)
    w(imgs.drop("bytes"), "images")
    // decoded source pixels (int 0..255) — lets SQL recompute resize math
    w(imgs.select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"))
      .as[(String, Array[Byte], Int, Int, String)]
      .map { case (id, bytes, wd, ht, fmt) =>
        (id, fmt, graft.model.ImageCodec.decode(bytes, fmt, wd, ht)
          .map(b => b & 0xFF).toSeq)
      }.toDF("image_id", "fmt", "px"), "pixels")
    // perturbed near-dup companions' decoded pixels (q51's oracle recomputes
    // the dHash of ORIGINALS from `pixels` and of dups from here — the whole
    // feature+join path is SQL, only the lossless decode is shared)
    w(ImageOps.perturbedDups(s, imgs)
      .select(col("image_id"), col("bytes"), col("w"), col("h"), col("fmt"))
      .as[(String, Array[Byte], Int, Int, String)]
      .map { case (id, bytes, wd, ht, fmt) =>
        (id, wd, ht, graft.model.ImageCodec.decode(bytes, fmt, wd, ht)
          .map(b => b & 0xFF).toSeq)
      }.toDF("image_id", "w", "h", "px"), "dup_pixels")
    val (ok, _) = ObjPipeline.validated(surf)
    w(SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))
      .select(col("building_id"), col("surface_id"), col("surface_class"),
        col("poly_ord"), col("tri_idx"),
        col("tri.a.x").as("ax"), col("tri.a.y").as("ay"), col("tri.a.z").as("az"),
        col("tri.b.x").as("bx"), col("tri.b.y").as("by"), col("tri.b.z").as("bz"),
        col("tri.c.x").as("cx"), col("tri.c.y").as("cy"), col("tri.c.z").as("cz")),
      "triangles")
    val docs = s.read.parquet(p(sfDir, "documents"))
    w(TextOps.minhashBandTable(docs, k = 3, bands = 16, rows = 2), "minhash_bands")
    w(docs.select(col("doc_id"), TextOps.simhash(col("text")).as("sim")), "simhash_sigs")
    val emb = s.read.parquet(p(sfDir, "embeddings"))
    w(AnnOps.lshCandidates(emb, Seq(0L, 1L, 2L), dim = 64, bits = 5, tables = 8),
      "ann_candidates")
    w(AnnOps.cosineCandidates(emb, dim = 64, bits = 8), "cos_candidates")
    // IVF coarse centroids (nlist=16, iters=2 — lockstep with q45): training
    // is decimal-summed, so this dump and q45's own training are
    // bit-identical at any partitioning
    val ivf = AnnOps.ivfTrain(emb, dim = 64, nlist = 16, iters = 2)
    w(s.createDataFrame(ivf.toSeq.zipWithIndex.map { case (c, j) => (j, c.toSeq) })
      .toDF("list_id", "centroid"), "ivf_centroids")
    w(Synth.envelopes(s, 16L), "envelopes")
    // PII-planted corpus: q80's oracle replays counts + redaction from this
    w(Synth.piiDocs(s, 315L), "pii_docs")
    // q83 crawl increment + its band table (history bands = minhash_bands,
    // same k/bands/rows): the oracle replays both dedup joins from these
    val incr = q83Increment(s, sfDir)
    w(incr, "incr_docs")
    w(TextOps.minhashBandTable(incr, k = 3, bands = 16, rows = 2), "incr_bands")
    // mixed-city PRE-RENDER surfaces: q53's oracle recomputes the round
    // trip's per-kind counts/checksums and the -tC translation from these
    w(Synth.mixedCity(s, nBuildings(sfOf(sfDir)), nOther(sfOf(sfDir)))
      .select(col("building_id"), col("surface_id"), col("surface_class"),
        col("ext"), col("holes"), col("object_kind"), col("feature_id"),
        col("implicit_geom")),
      "mixed_surfaces")
    // per-frame pixel-sum truth from the SOURCE pixels (pre-encode): q57's
    // oracle replays frame sampling from this, independent of the decoder
    w(VideoOps.synthVideos(s, nOther(sfOf(sfDir)), nFrames = 12)._2,
      "video_frames")
    // per-window |sample| sums from the SOURCE samples (pre-pack): q58
    w(AudioOps.synthClips(s, nOther(sfOf(sfDir)), nSamples = 1600,
      window = 400)._2, "audio_windows")
    // near-dup vertex/edge tables for the q62 clustering oracle: edge
    // GENERATION is gated by q21/q22 (minhash/simhash oracles replay it in
    // SQL); here the oracle replays the CLUSTERING — components + keep
    // flags via a recursive CTE over these dumps
    val cdocs = q62Corpus(s, sfDir)
    // n_chars rides along for q105's keep-by-quality argmax (q62/q99 read
    // only doc_id)
    w(cdocs.select(col("doc_id"),
      length(col("text")).cast("long").as("n_chars")), "neardup_vertices")
    w(q62Edges(cdocs), "neardup_edges")
    // trained BPE merge table for q63 (precedent: ivf_centroids — training
    // output dumped, its deterministic math pinned by BpeSpec; the oracle
    // replays ENCODE + packing from this table in SQL)
    val bm = q63Merges(s, sfDir)
    w(s.createDataFrame(bm.zipWithIndex.map { case ((a, b), i) => (i, a, b) })
      .toDF("rank", "a", "b"), "bpe_merges")
    // near-dup edges over the exact-dedup survivors — the q65 recipe's
    // clustering input (pair generation gated by q22; the oracle replays
    // the clustering + the rest of the chain from this dump)
    w(q65Edges(s, sfDir), "recipe_edges")
    // PQ codebooks (m=8 × ksub=16, lockstep with q66): decimal-summed
    // Lloyd training is deterministic, so this dump and q66's own training
    // are bit-identical at any partitioning (ivf_centroids precedent)
    val books = AnnOps.pqTrain(emb, dim = 64, m = 8, ksub = 16, iters = 2)
    w(s.createDataFrame(for {
      (book, si) <- books.zipWithIndex.toSeq
      (c, code) <- book.zipWithIndex.toSeq
    } yield (si, code, c.toSeq)).toDF("sub_idx", "code", "centroid"),
      "pq_codebooks")
    // q129 segment layers (values carried by the dump — the oracle's
    // cross-join replay is blocking-independent)
    w(synthSegments(s, math.max(64L, (40000 * sfOf(sfDir)).toLong), 11L),
      "seg_a")
    w(synthSegments(s, math.max(96L, (60000 * sfOf(sfDir)).toLong), 77L),
      "seg_b")
    w(synthPoints(s, math.max(128L, (200000 * sfOf(sfDir)).toLong), 401L),
      "snap_points")
    w(synthTracks(s, math.max(16L, (20000 * sfOf(sfDir)).toLong), 200L),
      "tracks")
    w(synthGridEdges(s, 16), "grid_edges")
    w(synthTrackSegments(s, math.max(256L, (160000 * sfOf(sfDir)).toLong)),
      "seg_t")
    // stitched-mosaic tile pixels (world tile coords ride along): q114's
    // oracle rebuilds the whole-raster pixel graph from this dump
    w(Synth.mosaicTiles(s, mosaicSide(sfOf(sfDir)))
      .select(col("tile_x"), col("tile_y"), col("bytes"), col("w"),
        col("h"), col("fmt"))
      .as[(Int, Int, Array[Byte], Int, Int, String)]
      .map { case (tx, ty, bytes, wd, ht, fmt) =>
        (tx, ty, graft.model.ImageCodec.decode(bytes, fmt, wd, ht)
          .map(b => b & 0xFF).toSeq)
      }.toDF("tile_x", "tile_y", "px"), "mosaic_pixels")
    // SOURCE audio samples (same 7919 formula as synthClips, pre-encode):
    // q122/q123 oracles replay resampling + features from these
    w(AudioOps.synthSampleTable(s, nOther(sfOf(sfDir)), 1600),
      "audio_samples")
    // q153 linear-probe feature table (HOG orientation proportions, gated
    // feature extraction precedent: q64 recomputes hogCells from pixels;
    // here the oracle replays CENTERING + the whole grouped TRAINING RUN +
    // scoring from this dump)
    w(probeFeats(s), "probe_feats")
    // q154 DBSCAN point cloud: the dump carries the coordinates, the
    // oracle replays the clustering (all-pairs + recursive CTE)
    w(synthClusterPoints(s, dbscanN(sfOf(sfDir))), "dbscan_points")
    // q158 MF-GD: ratings + the exact init factor tables the training run
    // starts from (ivf_centroids precedent) — the oracle replays every GD
    // iteration relationally from these
    val mfr = synthRatings(s, mfUsers(sfOf(sfDir)), mfItems(sfOf(sfDir)))
    w(mfr, "mf_ratings")
    w(MlOps.mfInit(mfr.select("user_id").distinct(), "user_id", 2, 77L),
      "mf_u0")
    w(MlOps.mfInit(mfr.select("item_id").distinct(), "item_id", 2, 1077L),
      "mf_v0")
    // q160 bloom skipping: the file→rows assignment of the hash-partitioned
    // fixture layout (deterministic — repartition(8, doc_id) hashes), so
    // the oracle can replay the per-file bloom membership DECISION
    // relationally (bit P set ⟺ some row hashes to P — no bit arithmetic)
    val bdir = fixtureDir(s, "graft_q160_data")
    graft.sources.StatsManifest.write(
      s.read.parquet(p(sfDir, "documents")).repartition(8, col("doc_id")),
      bdir, Seq("doc_id"))
    w(s.read.parquet(bdir)
      .select(col("_metadata.file_path").as("file"), col("doc_id")),
      "bloom_files")
    // q163 JL sign matrix (literal metadata dumped for the oracle — the
    // ivf_centroids precedent; generation determinism is JlSpec business)
    w(s.createDataFrame(for {
      (row, j) <- AnnOps.jlSigns(64, 8, 7L).zipWithIndex.toSeq
      (sv, i) <- row.zipWithIndex.toSeq
    } yield (j, i, sv)).toDF("j", "i", "s"), "jl_signs")
  }

  /** Flagship: the SURVEY §7.3 minimum slice — salted PIP spatial join of
    * captioned images against triangulated LoD2 surfaces, counted per cell.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val (ok, _) = ObjPipeline.validated(synthSurfaces(spark, dir))
    val triCells = SpatialOps.triangleCells(
      SpatialOps.triangles(ObjPipeline.withoutOpenings(ok)))
    val imgCells = SpatialOps.imageCells(synthImages(spark, dir))
    SpatialOps.cellCounts(SpatialOps.spatialJoin(imgCells, triCells))
  }

  // exact decimal-sum helper: deterministic across engines and partitionings
  private def dsum(c: org.apache.spark.sql.Column) =
    sum(c.cast("decimal(28,6)")).cast("double")

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // ---- relational core (oracle-checked) ----
    "q01_pricing_agg" -> ((s, d) => {
      s.read.parquet(p(d, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_price"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
          count(lit(1)).as("n_rows"))
        .orderBy("l_returnflag", "l_linestatus")
    }),
    "q02_join_topn" -> ((s, d) => {
      val o = s.read.parquet(p(d, "orders"))
      val c = s.read.parquet(p(d, "customer"))
      o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .select(col("o_orderkey"), col("c_name"), col("o_totalprice"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(10)
    }),
    "q03_revenue_by_nation" -> ((s, d) => {
      val li = s.read.parquet(p(d, "lineitem"))
      val o = s.read.parquet(p(d, "orders"))
      val c = s.read.parquet(p(d, "customer"))
      val n = s.read.parquet(p(d, "nation"))
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .groupBy(col("n_name"))
        .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("n_name")
    }),
    "q04_anti_join" -> ((s, d) => {
      // customers with no large order — anti-join with a residual predicate
      val c = s.read.parquet(p(d, "customer"))
      val o = s.read.parquet(p(d, "orders"))
      c.join(o, c("c_custkey") === o("o_custkey") && o("o_totalprice") > 450000.0,
          "left_anti")
        .select(col("c_custkey"), col("c_name"))
        .orderBy("c_custkey")
    }),
    "q05_semi_join" -> ((s, d) => {
      val pt = s.read.parquet(p(d, "part"))
      val li = s.read.parquet(p(d, "lineitem"))
      pt.join(li, pt("p_partkey") === li("l_partkey"), "left_semi")
        .groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    }),
    "q06_window_topk" -> ((s, d) => {
      val o = s.read.parquet(p(d, "orders"))
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      o.withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy("o_custkey", "rk")
    }),
    "q07_rollup" -> ((s, d) => {
      s.read.parquet(p(d, "lineitem"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
          coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
          col("n_rows"), col("sum_qty"))
        .orderBy("rf", "ls")
    }),
    "q08_events_daily" -> ((s, d) => {
      s.read.parquet(p(d, "events"))
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n_events"), dsum(col("value")).as("sum_value"))
        .orderBy("event_type", "day")
    }),
    "q09_sessionize" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      s.read.parquet(p(d, "events"))
        .withColumn("prev_ts", lag(col("ts"), 1).over(w))
        .withColumn("new_session",
          when(col("prev_ts").isNull ||
            unix_micros(col("ts").cast("timestamp")) -
              unix_micros(col("prev_ts").cast("timestamp")) > 3600L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy(col("user_id"))
        .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy("user_id")
    }),
    // ---- dedup / text analysis (training-pipeline ops; oracle-checked) ----
    "q10_dedup_exact" -> ((s, d) => {
      s.read.parquet(p(d, "documents"))
        .groupBy(md5(col("text")).as("text_hash"))
        .agg(min(col("doc_id")).as("keep_doc_id"), count(lit(1)).as("n_dups"))
        .orderBy("keep_doc_id")
    }),
    "q11_token_count" -> ((s, d) => {
      s.read.parquet(p(d, "documents")).select(
        col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tokens"),
        length(col("text")).cast("long").as("n_chars_calc"))
        .orderBy("doc_id")
    }),
    "q12_quality" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val nTok = size(toks).cast("double")
      val stop = size(filter(toks, t => t.isin("the", "a", "of", "and", "to"))).cast("double")
      s.read.parquet(p(d, "documents")).select(
        col("doc_id"),
        size(toks).cast("long").as("n_tokens"),
        round(length(col("text")).cast("double") / nTok, 4).as("mean_word_len"),
        round(stop / nTok, 4).as("stopword_ratio"),
        round(size(array_distinct(toks)).cast("double") / nTok, 4).as("distinct_ratio"))
        .orderBy("doc_id")
    }),
    "q13_langid" -> ((s, d) => {
      val toks = split(col("text"), " ")
      val hits = size(filter(toks, t => t.isin("the", "a", "of", "and", "to", "in")))
      val score = round(hits.cast("double") / size(toks).cast("double"), 4)
      s.read.parquet(p(d, "documents")).select(
        col("doc_id"), col("lang"), score.as("en_score"),
        when(score >= 0.05, "en-like").otherwise("unk").as("pred_lang"))
        .orderBy("doc_id")
    }),
    "q14_source_stats" -> ((s, d) => {
      s.read.parquet(p(d, "documents"))
        .where(col("text").contains("spark"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), dsum(col("n_chars")).as("sum_chars"))
        .orderBy("source")
    }),
    // ---- similarity search (oracle-checked via list_cosine_similarity) ----
    "q15_ann_bruteforce" -> ((s, d) => {
      val e = s.read.parquet(p(d, "embeddings"))
        .select(col("vec_id"), transform(col("embedding"), _.cast("double")).as("emb"))
      val q = e.where(col("vec_id") < 5)
        .select(col("vec_id").as("query_id"), col("emb").as("q_emb"))
      val dot = aggregate(zip_with(col("emb"), col("q_emb"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v)
      val na = sqrt(aggregate(transform(col("emb"), x => x * x), lit(0.0d), (a, v) => a + v))
      val nb = sqrt(aggregate(transform(col("q_emb"), x => x * x), lit(0.0d), (a, v) => a + v))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("cos_raw").desc, col("vec_id").asc)
      e.crossJoin(broadcast(q))
        .where(col("vec_id") =!= col("query_id"))
        .withColumn("cos_raw", dot / (na * nb))
        .withColumn("rk", row_number().over(w).cast("long"))
        .where(col("rk") <= 3)
        .select(col("query_id"), col("rk"), col("vec_id"),
          round(col("cos_raw"), 4).as("cos"))
        .orderBy("query_id", "rk")
    }),
    // ---- geometry / spatial engine (not SQL-expressible → rows-only) ----
    "q16_spatial_join_cells" -> ((s, d) => {
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val triCells = SpatialOps.triangleCells(
        SpatialOps.triangles(ObjPipeline.withoutOpenings(ok)))
      val imgCells = SpatialOps.imageCells(synthImages(s, d))
      SpatialOps.cellCounts(SpatialOps.spatialJoin(imgCells, triCells))
        .orderBy("cell_id")
    }),
    "q17_knn" -> ((s, d) => {
      SpatialOps.knnAssign(synthImages(s, d), synthSurfaces(s, d), k = 3)
        .orderBy("image_id", "rk")
    }),
    "q18_triangulate" -> ((s, d) => {
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))
        .groupBy("surface_class").agg(
          count(lit(1)).as("n_triangles"),
          countDistinct(col("surface_id")).as("n_surfaces"))
        .orderBy("surface_class")
    }),
    "q19_obj_encode" -> ((s, d) => {
      val (v, f, _) = ObjPipeline.run(s, synthSurfaces(s, d), semantics = true)
      v.groupBy("cls").agg(
        max("ordinal").as("n_vertices"),
        dsum(col("x") + col("y") + col("z")).as("coord_checksum"))
        .join(f.groupBy("cls").agg(count(lit(1)).as("n_faces")), "cls")
        .orderBy("cls")
    }),
    "q20_tiles" -> ((s, d) => {
      val imgCells = SpatialOps.imageCells(synthImages(s, d))
      ImageOps.tileMetrics(ImageOps.materializeTiles(s, imgCells))
        .orderBy("cell_id")
    }),
    "q21_minhash_neardups" -> ((s, d) => {
      TextOps.minhashNearDups(s.read.parquet(p(d, "documents")),
        k = 3, bands = 16, rows = 2, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),
    "q22_simhash" -> ((s, d) => {
      TextOps.simhashNearDups(s.read.parquet(p(d, "documents")), maxHamming = 3)
        .orderBy("doc_a", "doc_b")
    }),
    "q23_fingerprints" -> ((s, d) => {
      TextOps.fingerprints(s.read.parquet(p(d, "documents"))).orderBy("doc_id")
    }),
    "q24_bbox_join" -> ((s, d) => {
      val boxes = SpatialOps.buildingBBoxes(synthSurfaces(s, d))
      SpatialOps.bboxJoin(synthImages(s, d), boxes)
        .groupBy("building_id").agg(count(lit(1)).as("n_hits"))
        .orderBy("building_id")
    }),
    "q25_translate" -> ((s, d) => {
      // O-44/O-61: exact-decimal params + per-coordinate translation; the
      // oracle recomputes both from the dumped envelopes table, so emit a
      // per-surface coordinate checksum of the TRANSLATED ring
      val params = Translate.translationParams(Synth.envelopes(s, 16L)).head()
      val t = Translate.applySurfaces(synthSurfaces(s, d),
        params.getDecimal(1).doubleValue(), params.getDecimal(0).doubleValue(), 0.0)
      t.select(col("surface_id"), size(col("ext")).as("n_pts"),
        round(aggregate(col("ext"), lit(0.0),
          (acc, p) => acc + p.getField("x") + p.getField("y")), 6).as("xy_checksum"))
        .orderBy("surface_id")
    }),
    "q26_classify_angles" -> ((s, d) => {
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      ok.select(col("surface_id"), col("surface_class"),
        poly_angles(col("ext")).as("ang"))
        .select(col("surface_id"), col("surface_class"),
          // azimuth is unrounded in Geom.angles (reference parity); round it
          // here so the DuckDB oracle's libm atan2 can't drift a ulp past us
          round(col("ang.azimuth"), 6).as("azimuth"), col("ang.tilt").as("tilt"),
          when(abs(col("ang.tilt")) < 10, "horizontal")
            .when(abs(col("ang.tilt") - 90) < 10, "wall")
            .otherwise("sloped").as("pred_class"))
        .orderBy("surface_id")
    }),
    "q27_lsh_ann" -> ((s, d) => {
      // bits=5/tables=8: the measured sweet spot on the near-uniform synth
      // embeddings (recall ~0.46 at ~24% candidate fraction — AnnRecallSpec
      // pins the tradeoff curve)
      AnnOps.lshTopK(s.read.parquet(p(d, "embeddings")), Seq(0L, 1L, 2L),
        dim = 64, bits = 5, tables = 8, k = 5)
        .orderBy("query_id", "rk")
    }),
    "q45_ivf_ann" -> ((s, d) => {
      // IVF-Flat ANN (index-backed scale path): hash-min-seeded + 2 Lloyd
      // rounds, nlist=16, nprobe=4 — centroids are literal metadata, corpus
      // assignment is map-side column math, search joins on list_id only.
      // The oracle recomputes assignment, probe-list selection, and the
      // exact re-rank from the dumped centroid table.
      val emb = s.read.parquet(p(d, "embeddings"))
      val cents = AnnOps.ivfTrain(emb, dim = 64, nlist = 16, iters = 2)
      AnnOps.ivfTopK(emb, Seq(0L, 1L, 2L), cents, nprobe = 4, k = 5)
        .orderBy("query_id", "rk")
    }),
    "q28_cosine_neardups" -> ((s, d) => {
      AnnOps.cosineNearDups(s.read.parquet(p(d, "embeddings")),
        dim = 64, bits = 8, threshold = 0.35)
        .orderBy("vec_a", "vec_b")
    }),
    "q29_window_hulls" -> ((s, d) => {
      // O-46 per-opening hulls (reference parity): a perturbed planar quad
      // hulls to a tetrahedron whose surface area ≈ 2× the opening area —
      // both count and area are recomputed by the oracle from the ring data
      val triArea = expr(
        """sqrt(pow((tri.b.y-tri.a.y)*(tri.c.z-tri.a.z)-(tri.b.z-tri.a.z)*(tri.c.y-tri.a.y),2)
               +pow((tri.b.z-tri.a.z)*(tri.c.x-tri.a.x)-(tri.b.x-tri.a.x)*(tri.c.z-tri.a.z),2)
               +pow((tri.b.x-tri.a.x)*(tri.c.y-tri.a.y)-(tri.b.y-tri.a.y)*(tri.c.x-tri.a.x),2))/2""")
      SpatialOps.windowHulls(synthSurfaces(s, d))
        .groupBy("building_id", "surface_id")
        .agg(count(lit(1)).as("n_hull_tris"),
          round(sum(triArea), 2).as("hull_area"))
        .orderBy("building_id", "surface_id")
    }),
    "q30_corner_triangles" -> ((s, d) => {
      SpatialOps.cornerTriangles(SpatialOps.buildingBBoxes(synthSurfaces(s, d)))
        .select(col("building_id"), col("tri_idx"),
          col("tri.a.x").as("ax"), col("tri.a.y").as("ay"), col("tri.a.z").as("az"))
        .orderBy("building_id", "tri_idx")
    }),
    "q31_obj_lines" -> ((s, d) => {
      // OBJ text render (O-4): per-class section counts + v-section byte
      // volume, all recomputable by the oracle (vertex dictionary + Euler
      // face counts + the exact number formatting). The ordinal ORDER is
      // EarClip-diagonal-dependent and stays pinned by the golden spec.
      val (v, f, _) = ObjPipeline.run(s, synthSurfaces(s, d), semantics = true)
      ObjPipeline.objLines(v, f)
        .groupBy("cls").agg(
          sum(when(col("line").startsWith("v "), 1L).otherwise(0L)).as("n_v_lines"),
          sum(when(col("line").startsWith("f "), 1L).otherwise(0L)).as("n_f_lines"),
          sum(when(col("line").startsWith("v "), length(col("line")))
            .otherwise(0)).cast("long").as("v_bytes"))
        .orderBy("cls")
    }),
    "q32_trisoup" -> ((s, d) => {
      // component-path writer (O-5): tri-soup per building, no vertex dedup.
      // Parse the RENDERED text back: line count (4 per block) and the sum
      // of the 1-based face indices — both derivable in SQL from the
      // per-building triangle count T (Σ over f-lines = 9T(T+1)/2 − 3T).
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val fIdxSum = expr(
        """aggregate(filter(split(obj_text, '\n'), l -> l like 'f %'), 0L,
             (acc, l) -> acc + cast(split(l, ' ')[1] as long)
                             + cast(split(l, ' ')[2] as long)
                             + cast(split(l, ' ')[3] as long))""")
      graft.sink.ObjWriter.triSoup(
        SpatialOps.triangles(ObjPipeline.withoutOpenings(ok)))
        .select(col("building_id"),
          size(split(col("obj_text"), "\n")).cast("long").as("n_lines"),
          fIdxSum.as("f_index_sum"))
        .orderBy("building_id")
    }),
    "q33_simhash_sigs" -> ((s, d) => {
      // md5-based simhash: the oracle recomputes the full per-bit majority
      // vote in SQL (the xxhash64 expression variant backs q22's blocking)
      TextOps.simhashMd5(s.read.parquet(p(d, "documents"))).orderBy("doc_id")
    }),
    "q34_gml_ingest" -> ((s, d) => {
      // REAL CityGML XML round-trip (O-2/O-3/O-11): surfaces → one CityGML
      // 2.0 document per building → distributed StAX parse back; per-class
      // point counts + coordinate checksums prove lossless extraction
      // (namespace dispatch, exterior/interior rings, opening paths)
      val surf = synthSurfaces(s, d)
      val (ok, _) = graft.sources.GmlXml.ingest(graft.sources.GmlXml.render(surf))
      ok.select(col("surface_class"), explode(col("ext")).as("p"))
        .groupBy("surface_class")
        .agg(count(lit(1)).as("n_points"),
          dsum(col("p.x") + col("p.y") + col("p.z")).as("coord_checksum"))
        .orderBy("surface_class")
    }),
    "q37_range_join" -> ((s, d) => {
      // O-40's relational twin, oracle-checked: equi prefilter (orderkey) +
      // interval-membership residual — the same plan shape as bboxJoin
      val li = s.read.parquet(p(d, "lineitem"))
      val o = s.read.parquet(p(d, "orders"))
      li.join(o, li("l_orderkey") === o("o_orderkey") &&
          li("l_shipdate") >= o("o_orderdate") &&
          li("l_shipdate") <= o("o_orderdate") + expr("INTERVAL 30 DAYS"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n_rows"), dsum(col("l_quantity")).as("sum_qty"))
        .orderBy("l_returnflag")
    }),
    "q36_thumbnails" -> ((s, d) => {
      // multimodal resize op: per-fmt thumbnail counts + decoded-pixel
      // checksum — the oracle recomputes the 4×4 box-average (integer
      // truncating division) from the dumped source pixels
      ImageOps.thumbnails(s, synthImages(s, d), tw = 4, th = 4)
        .groupBy("fmt").agg(count(lit(1)).as("n_thumbs"),
          sum(col("px_sum")).as("px_checksum"))
        .orderBy("fmt")
    }),
    "q40_features" -> ((s, d) => {
      // multimodal feature extraction: per-image channel means,
      // oracle-recomputed from the dumped decoded pixels (the dHash half of
      // the feature row is gated separately by q50)
      ImageOps.extractFeatures(s, synthImages(s, d))
        .select("image_id", "mean_r", "mean_g", "mean_b")
        .orderBy("image_id")
    }),
    "q50_dhash" -> ((s, d) => {
      // REAL perceptual-hash feature op (dHash) under the gate: the oracle
      // recomputes the 9×8 box-average luma grid (integer-truncation
      // division — exactly ImageCodec.resize's semantics) and every
      // gradient bit from the dumped decoded pixels.
      ImageOps.extractFeatures(s, synthImages(s, d))
        .select("image_id", "dhash_bits")
        .orderBy("image_id")
    }),
    "q51_image_neardups" -> ((s, d) => {
      // image near-dup join: corpus + deterministic perturbed companions →
      // dHash → 4×16-bit hamming pigeonhole blocking → exact hamming on
      // candidates. The oracle replays feature AND join entirely in SQL
      // from decoded pixels (random-hash collisions at hamming ≤ 3 are
      // ~2e-15 per pair, so the result is exactly the planted pairs — but
      // the gate compares whatever both engines derive, not that belief).
      val imgs = synthImages(s, d)
      val all = imgs.select("image_id", "bytes", "w", "h", "fmt")
        .unionByName(ImageOps.perturbedDups(s, imgs))
      ImageOps.dhashNearDups(s, all, maxHamming = 3)
        .orderBy("img_a", "img_b")
    }),
    "q53_mixed_city" -> ((s, d) => {
      // MIXED-CITY round trip (round-4 'Other' route): buildings +
      // installation features + non-building city objects render to CityGML
      // (module namespaces, ImplicitGeometry wrappers) and parse back
      // through the full StAX path; per-kind poly/point counts + raw AND
      // CRS-translated coordinate checksums (params derived from structural
      // building AABBs exactly like `-tC`; implicit template geometry stays
      // untranslated) are all recomputed by the oracle from the dumped
      // pre-render surfaces — losslessness and translation parity in one.
      val sf = sfOf(d)
      val mixed = graft.model.Synth.mixedCity(s, nBuildings(sf), nOther(sf))
      val (ok, _) = graft.sources.GmlXml.ingest(graft.sources.GmlXml.render(mixed))
      val bb = SpatialOps.buildingBBoxes(ok, buffer = 0.0)
      val env = bb.select(struct(col("ymin").as("a"), col("xmin").as("b"))
        .as("lower_corner"))
      val pr = Translate.translationParams(env).head()
      val dyT = pr.getDecimal(0).doubleValue; val dxT = pr.getDecimal(1).doubleValue
      val t = Translate.applySurfaces(ok, dxT, dyT, 0.0)
      val raw = ok
        .select(col("object_kind"), col("surface_id"), explode(col("ext")).as("p"))
        .groupBy("object_kind")
        .agg(countDistinct(col("surface_id")).as("n_polys"),
          count(lit(1)).as("n_points"),
          dsum(col("p.x") + col("p.y") + col("p.z")).as("coord_checksum"))
      val tx = t.select(col("object_kind"), explode(col("ext")).as("p"))
        .groupBy("object_kind")
        .agg(dsum(col("p.x") + col("p.y") + col("p.z")).as("tx_checksum"))
      raw.join(tx, Seq("object_kind")).orderBy("object_kind")
    }),
    "q83_incremental_dedup" -> ((s, d) => {
      // incremental dedup of a deterministic crawl increment (verbatim
      // replants → exact_dup, head-trimmed replants → near_dup via ≥3
      // shared minhash bands, fresh unique-token docs → new) against the
      // frozen documents corpus; hashes and band buckets shuffle, bodies
      // never do. Oracle replays both joins from the dumped increment +
      // band tables.
      TextOps.incrementalDedup(q83Increment(s, d),
        s.read.parquet(p(d, "documents")))
        .orderBy("doc_id")
    }),
    "q101_stream_interval_join" -> ((s, d) => {
      // stream-stream event-time interval join under the gate: the events
      // table replayed through TWO file streams (views / clicks), joined
      // on user with click in [view_ts, view_ts + 120 min]. A single
      // AvailableNow batch makes the append-mode inner join deterministic
      // — it must equal the relational interval join the oracle runs.
      import org.apache.spark.sql.streaming.Trigger
      val ev = s.read.parquet(p(d, "events"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q101").toString
      ev.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      def side(t: String) = s.readStream.schema(ev.schema)
        .parquet(s"$tmp/in").where(col("event_type") === t)
        .withColumn("ts", col("ts").cast("timestamp"))
      val qn = "q101_join_sink"
      s.catalog.dropTempView(qn)
      val q = graft.streaming.StreamingIngest
        .intervalJoin(side("view"), side("click"), horizonMinutes = 120)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).select(col("user_id"), col("view_id"), col("click_id"),
          unix_micros(col("view_ts")).as("view_us"),
          unix_micros(col("click_ts")).as("click_us"))
        .orderBy("view_id", "click_id")
    }),
    "q102_weighted_sample" -> ((s, d) => {
      // deterministic weighted sampling without replacement (Efraimidis-
      // Spirtes A-ES): 10 docs per source, selection probability
      // proportional to n_chars, zero RNG state — the corpus-weighting
      // subsample every data recipe draws, reproducible across engines.
      TextOps.weightedSample(s.read.parquet(p(d, "documents")),
        k = 10, seed = 7).orderBy("source", "doc_id")
    }),
    "q103_pagerank" -> ((s, d) => {
      // deterministic integer PageRank (5 iterations, damping 85/100) over
      // a 3-regular md5-derived link graph on the documents table — the
      // crawl-quality rank signal. Ordinals come from the DISTRIBUTED
      // two-pass assignOrdinals pattern (no global single-reducer window);
      // all rank math is integer micro-units, so sums are order-independent
      // and the oracle replays the 5 iterations as an unrolled CTE chain.
      val docs = s.read.parquet(p(d, "documents")).select("doc_id")
      val nodes = ObjPipeline.assignOrdinals(docs.select(col("doc_id"),
          lit("all").as("cls"),
          struct(col("doc_id").as("h"), col("doc_id").as("doc_id"))
            .as("first_seen")))
        .select(col("doc_id"), (col("ordinal") - 1).cast("long").as("ord"))
        .localCheckpoint()
      val n = nodes.count()
      val edges = nodes
        .select(col("ord").as("src"), col("doc_id"),
          explode(sequence(lit(0), lit(2))).as("k"))
        .select(col("src"),
          pmod(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("@pr"), col("k").cast("string"))), 1, 15), 16, 10)
            .cast("long"), lit(n)).as("dst"))
      Clustering.pageRank(nodes.select(col("ord").as("id")), edges, iters = 5)
        .join(nodes, col("id") === col("ord"))
        .select(col("doc_id"), col("rank_u"))
        .orderBy("doc_id")
    }),
    "q104_quality_classifier" -> ((s, d) => {
      // model-based quality filtering (the fastText-classifier stage):
      // hard-sigmoid logistic regression trained by 8 full-batch GD steps
      // in pure integer micro-unit math — weights are bit-identical across
      // engines/partitionings (order-independent integer gradient sums),
      // so the oracle replays the whole training run as a linear CTE
      // chain. Label = the heuristic gate being distilled (length +
      // stopword frequency); features = integer ratio stats, centered by
      // integer means. Each GD step is ONE map-side-combined aggregate
      // over a checkpointed 6-long-column frame; scoring is one literal
      // projection — zero data-sized shuffles.
      val S = MlOps.Scale
      val raw = s.read.parquet(p(d, "documents"))
        .select(col("doc_id"), col("n_chars"),
          expr("length(text) - length(replace(text, ' ', ''))")
            .as("spaces"),
          expr("(length(text) - length(replace(text, 'the', ''))) div 3")
            .as("thecnt"))
        .select(col("doc_id"),
          expr("CASE WHEN n_chars >= 250 AND thecnt * 1000 >= " +
            "8 * (spaces + 1) THEN CAST(1 AS BIGINT) ELSE 0 END").as("y"),
          expr(s"((n_chars * $S) div (spaces + 1)) div 16").as("r1"),
          expr(s"(spaces * $S) div greatest(n_chars, 1)").as("r2"),
          expr(s"(least(n_chars, 512) * $S) div 512").as("r3"),
          expr(s"(thecnt * $S) div (spaces + 1)").as("r4"))
        .localCheckpoint()
      val rs = Seq("r1", "r2", "r3", "r4")
      val mu = MlOps.integerMeans(raw, rs)
      val xs = Seq("x1", "x2", "x3", "x4")
      val feat = raw.select(col("doc_id") +: col("y") +:
        rs.zip(xs).zipWithIndex.map { case ((r, x), i) =>
          (col(r) - lit(mu(i))).as(x)
        }: _*)
      val model = MlOps.trainHardSigmoidLr(feat, "y", xs, iters = 8, lr = 2L)
      feat.select(col("doc_id"), col("y"),
          MlOps.scoreU(model, xs).as("score_u"))
        .withColumn("keep", expr(s"CASE WHEN score_u >= ${S / 2} " +
          "THEN CAST(1 AS BIGINT) ELSE 0 END"))
        .orderBy("doc_id")
    }),
    "q105_canonical_by_quality" -> ((s, d) => {
      // canonicalization by QUALITY: each near-dup component keeps its
      // LONGEST copy (ties → min doc_id) instead of the arbitrary min-id
      // representative — what production dedup actually does with a
      // cluster. On the chained corpus the winner differs from q62's
      // min-id keep, so the gate distinguishes the two semantics. The
      // argmax is a max_by PARTIAL aggregate (map-side combined): a
      // degenerate giant component costs a combine, never a
      // single-reducer window sort.
      val docs = q62Corpus(s, d)
      Clustering.keepListBy(docs.select("doc_id"),
          docs.select(col("doc_id"),
            length(col("text")).cast("long").as("score")),
          q62Edges(docs))
        .orderBy("doc_id")
    }),
    "q106_zonal_stats" -> ((s, d) => {
      // zonal statistics (the geo×raster classic): per building-footprint
      // AABB, count + exact integer BT.601-luma sum + integer mean of
      // every tile pixel whose center (anchor + (i+0.5)·res) falls inside
      // the zone. Tiles decode once; pairs come from a slim cell_cover
      // equi-join (the luma payload crosses ONE hash join); window sums
      // are a codegen'd nested higher-order aggregate — no 256× pixel
      // explosion. Building 0 is the downtown hot cell (~20% of all
      // tiles), so the rollup's map-side combine absorbs real join skew.
      val pts = synthSurfaces(s, d)
        .where(col("surface_class").isin("GroundSurface", "WallSurface",
          "RoofSurface", "ClosureSurface", "CeilingSurface"))
        .select(col("building_ord"), explode(col("ext")).as("p"))
      val zones = pts.groupBy("building_ord").agg(
        min(col("p.x")).as("xmin"), max(col("p.x")).as("xmax"),
        min(col("p.y")).as("ymin"), max(col("p.y")).as("ymax"))
      ImageOps.zonalStats(s, synthImages(s, d), zones)
        .orderBy("building_ord")
    }),
    "q107_hotspots" -> ((s, d) => {
      // spatial hot-spot screen (Getis-Ord-style): per occupied 16 m grid
      // cell, the anchor count, the 3×3-window count, and an EXACT integer
      // hot flag (window density > 4× the mean occupied-cell density via
      // cross-multiplication — no float z-score). One point-sized pass;
      // the neighbor sum explodes only cell-count rows. The downtown hot
      // cell (~20% of all anchors in one block) must flag.
      SpatialOps.hotSpots(synthImages(s, d), cw = 16.0, k = 4L)
        .orderBy("cx", "cy")
    }),
    "q108_solar_exposure" -> ((s, d) => {
      // per-building solar-exposure rollup (the CityGML solar-potential
      // use case): for every VALIDATED roof polygon, incidence factor =
      // max(0, cos(unit Newell normal, fixed sun vector)) × 3D shoelace
      // area; per-term round(·,6) then DECIMAL(28,6) sums so the rollup is
      // order-independent (the q72/q88 discipline). Pure per-row kernel
      // math + one partial-aggregated groupBy.
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val n = poly_normal(col("ext"))
      val (nx, ny, nz) = (n.getField("x"), n.getField("y"), n.getField("z"))
      val mag = sqrt(nx * nx + ny * ny + nz * nz)
      val cosi = greatest(lit(0.0),
        (nx * lit(0.0) + ny * lit(-0.7071067811865476) +
          nz * lit(0.7071067811865476)) / mag)
      ok.where(col("surface_class") === "RoofSurface")
        .withColumn("expo",
          round(area_3d(col("ext")) * cosi, 6) + lit(0.0))
        .groupBy("building_id").agg(count(lit(1)).as("n_roofs"),
          sum(col("expo").cast("decimal(28,6)")).as("dsum"))
        .select(col("building_id"), col("n_roofs"),
          (round(col("dsum").cast("double"), 6) + lit(0.0)).as("exposure"))
        .orderBy("building_id")
    }),
    "q109_clip_transfer" -> ((s, d) => {
      // exact vector→raster area transfer: every ground triangle is
      // Sutherland-Hodgman-clipped against each 16 m cell it spans and the
      // cell accumulates the EXACT clipped area (Σ over cells ≡ triangle
      // area — conservation pinned by ClipTransferSpec). The 4 half-plane
      // clips and the shoelace are ONE dialect-abstracted expression
      // template (OracleSql.shClip/shArea) rendered for both engines, so
      // the intersection-point float math is bit-identical and the gate
      // compares areas exactly. Pure codegen'd column math per
      // (triangle, cell) pair — no UDF, no shuffle before the final
      // cell rollup.
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val tri = SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))
        .where(col("surface_class") === "GroundSurface")
        .select(col("tri.a.x").as("ax"), col("tri.a.y").as("ay"),
          col("tri.b.x").as("bx"), col("tri.b.y").as("by"),
          col("tri.c.x").as("cx"), col("tri.c.y").as("cy"))
      SpatialOps.clipTransfer(tri, cs = 16.0).orderBy("gx", "gy")
    }),
    "q110_skyline" -> ((s, d) => {
      // distributed 2-D skyline (Pareto frontier): the corpus quality
      // frontier maximizing (n_chars, distinct tokens). Phase 1 computes
      // per-partition local skylines with a zero-exchange sorted scan
      // (exact: every global frontier point survives its partition);
      // phase 2 re-scans only the bounded candidate union in one task.
      val f = s.read.parquet(p(d, "documents")).select(col("doc_id"),
        col("n_chars"),
        size(array_distinct(split(col("text"), " "))).cast("long")
          .as("n_toks"))
      Skyline.skyline2(s, f, "doc_id", "n_chars", "n_toks")
        .orderBy("doc_id")
    }),
    "q111_idw_surface" -> ((s, d) => {
      // IDW interpolation surface (the geostatistics classic): at every
      // occupied 16 m cell center, the inverse-distance-weighted mean of
      // the 3×3-neighborhood samples (value = per-image luma sum,
      // w = 1/(d²+1)). Each float term is rounded to 9 decimals then
      // DECIMAL(38,12)-summed, so the weighted sums are order-independent
      // and bit-identical across engines. One decode pass; contributions
      // explode slim sample rows 9×; one partial-aggregated rollup.
      val samp = ImageOps.lumaSamples(s, synthImages(s, d))
        .withColumn("scx", floor(col("anchor_x") / 16.0).cast("long"))
        .withColumn("scy", floor(col("anchor_y") / 16.0).cast("long"))
        .localCheckpoint()
      val occupied = samp.select(col("scx").as("ox"), col("scy").as("oy"))
        .distinct()
      val contrib = samp
        .withColumn("dx", explode(array((-1 to 1).map(lit(_)): _*)))
        .withColumn("dy", explode(array((-1 to 1).map(lit(_)): _*)))
        .select((col("scx") + col("dx")).as("cx"),
          (col("scy") + col("dy")).as("cy"),
          col("anchor_x"), col("anchor_y"), col("lum_sum"))
        .withColumn("mx", (col("cx").cast("double") + 0.5) * 16.0)
        .withColumn("my", (col("cy").cast("double") + 0.5) * 16.0)
        .withColumn("d2",
          (col("anchor_x") - col("mx")) * (col("anchor_x") - col("mx")) +
          (col("anchor_y") - col("my")) * (col("anchor_y") - col("my")))
        .withColumn("w", lit(1.0) / (col("d2") + lit(1.0)))
        .withColumn("wn", round(col("w") * col("lum_sum").cast("double"), 9)
          .cast("decimal(38,12)"))
        .withColumn("wd", round(col("w"), 9).cast("decimal(38,12)"))
      contrib.groupBy("cx", "cy").agg(
          count(lit(1)).as("n_samples"),
          sum(col("wn")).as("num"), sum(col("wd")).as("den"))
        .join(occupied, col("cx") === col("ox") && col("cy") === col("oy"),
          "left_semi")
        .select(col("cx"), col("cy"), col("n_samples"),
          // floor(ratio·1e6) instead of round(ratio, 6): the quotient
          // double is bit-identical on both engines, but Spark and DuckDB
          // disagree on decimal-tie rounding ~1/250 rows — floor is exact
          floor(col("num").cast("double") / col("den").cast("double")
            * lit(1000000.0)).cast("long").as("idw_micro"))
        .orderBy("cx", "cy")
    }),
    "q112_psi_drift" -> ((s, d) => {
      // PSI drift monitor (the corpus-monitoring staple): population
      // stability index of the n_chars distribution, reference slice
      // (src0-9) vs current slice (src10-19), 8 fixed 64-char bins with
      // Laplace smoothing so empty bins stay finite. Per-bin term in
      // integer nano-units (the q77 micro-nat rule: round(ln·scale, 0) →
      // BIGINT — transcendental shielded, sums exact). Two aggregate
      // passes over slim columns; the bin spine is generated so all 8
      // bins always appear.
      val docs = s.read.parquet(p(d, "documents"))
        .select(expr("least(n_chars div 64, 7)").as("bin"),
          expr("CAST(substring(source, 4, 8) AS INT) < 10").as("is_ref"))
      val counts = docs.groupBy("bin").agg(
        sum(when(col("is_ref"), 1L).otherwise(0L)).as("ref_n"),
        sum(when(col("is_ref"), 0L).otherwise(1L)).as("cur_n"))
      val tot = counts.agg(sum(col("ref_n")), sum(col("cur_n"))).head()
      val (rt, ct) = (tot.getLong(0), tot.getLong(1))
      s.range(0, 8).select(col("id").as("bin"))
        .join(counts, Seq("bin"), "left")
        .select(col("bin"),
          coalesce(col("ref_n"), lit(0L)).as("ref_n"),
          coalesce(col("cur_n"), lit(0L)).as("cur_n"))
        .withColumn("pr",
          (col("ref_n") + lit(1L)).cast("double") / lit((rt + 8).toDouble))
        .withColumn("qc",
          (col("cur_n") + lit(1L)).cast("double") / lit((ct + 8).toDouble))
        .withColumn("term_nano",
          round((col("pr") - col("qc")) * log(col("pr") / col("qc"))
            * lit(1000000000.0), 0).cast("long"))
        .select("bin", "ref_n", "cur_n", "term_nano")
        .orderBy("bin")
    }),
    "q135_shortest_paths" -> ((s, d) => {
      // single-source shortest paths over the seeded road grid —
      // Bellman-Ford rounds to fixpoint; the oracle replays 32 identical
      // relaxation rounds as a generated CTE chain (hop diameter 30).
      Clustering.shortestPaths(synthGridEdges(s, 16), sourceId = 0L,
        maxRounds = 64).orderBy("v")
    }),
    "q151_channel_corr" -> ((s, d) => {
      // R-G Pearson correlation per image (grayscale screen) — exact
      // integer sums, one IEEE expression, nano rounding.
      ImageOps.channelCorrelation(s, synthImages(s, d))
        .orderBy("image_id")
    }),
    "q150_stop_hotspots" -> ((s, d) => {
      // geo capstone composition: q133's dwell stops (centers of their
      // 64 m cells) snap to the nearest road segment within 64 m (q132's
      // exact machinery); per-segment dwell counts + the closest
      // approach. Stop identity = 60-bit md5 of (walker, enter) — the
      // oracle replays the whole chain.
      val stops = TrajectoryOps.stopDetection(
        synthTracks(s, math.max(16L, (20000 * sfOf(d)).toLong), 200L),
        cellSize = 64L, minPoints = 10)
      val pts = stops.select(
        conv(substring(md5(concat(col("walker_id").cast("string"),
          lit("_"), col("enter_us").cast("string"))), 1, 15), 16, 10)
          .cast("long").as("point_id"),
        (col("cx") * 64L + 32L).as("x"), (col("cy") * 64L + 32L).as("y"))
      SpatialOps.snapToSegments(pts,
        synthTrackSegments(s, math.max(256L, (160000 * sfOf(d)).toLong)),
        radius = 64L)
        .groupBy("seg_id")
        .agg(count(lit(1)).as("n_stops"), min(col("d2")).as("d2_min"))
        .orderBy("seg_id")
    }),
    "q149_quadtree_zonal" -> ((s, d) => {
      // composition capstone: every image lands in its adaptive quadtree
      // leaf (q128 assignment), then per-leaf rollup of decoded raw luma
      // sums + micro-meter anchor sums — exact integers end to end.
      val imgs = synthImages(s, d)
      val assign = SpatialOps.quadtreeAssign(imgs, "image_id",
        "anchor_x", "anchor_y", baseLevel = 10, maxLevel = 16, cap = 64L)
      val luma = ImageOps.lumaSamples(s, imgs)
        .select(col("image_id"), col("lum_sum"),
          round(col("anchor_x") * 1e6, 0).cast("long").as("ax_micro"),
          round(col("anchor_y") * 1e6, 0).cast("long").as("ay_micro"))
      assign.join(luma, Seq("image_id"))
        .groupBy("level", "cell_id")
        .agg(count(lit(1)).as("n_images"), sum(col("lum_sum")).as("lum_sum"),
          sum(col("ax_micro")).as("ax_micro_sum"),
          sum(col("ay_micro")).as("ay_micro_sum"))
        .orderBy("level", "cell_id")
    }),
    "q148_ab_srm" -> ((s, d) => {
      // deterministic A/B bucketing + SRM chi-square gate over the event
      // stream; purchase conversion per variant.
      ops.Sessionize.abSrmCheck(s.read.parquet(p(d, "events")),
        "purchase").orderBy("variant")
    }),
    "q147_peak_concurrency" -> ((s, d) => {
      // peak concurrent 30-min sessions — grouped sweep line with the
      // distributed two-pass running sum; oracle replays sessionization,
      // boundaries, and the per-timestamp peak candidates.
      ops.Sessionize.peakConcurrency(s.read.parquet(p(d, "events")),
        gapUs = 1800000000L)
    }),
    "q145_twap" -> ((s, d) => {
      // time-weighted value integral per user — exact DECIMAL numerator
      // + integer held time, never a float division.
      ops.Sessionize.timeWeightedValue(s.read.parquet(p(d, "events")))
        .orderBy("user_id")
    }),
    "q146_entropy" -> ((s, d) => {
      // luma-histogram Shannon entropy per image in nano-nats — per-bin
      // rounded terms, integer sum.
      ImageOps.lumaEntropy(s, synthImages(s, d)).orderBy("image_id")
    }),
    "q143_retention" -> ((s, d) => {
      // weekly retention cohorts anchored on first signup — integer
      // epoch-week floor math, broadcast cohort join.
      ops.Sessionize.retentionCohorts(s.read.parquet(p(d, "events")),
        "signup").orderBy("cohort_week", "week_offset")
    }),
    "q144_transitions" -> ((s, d) => {
      // consecutive event-type bigram counts per user (time + event_id
      // order) — the session-path Markov statistics.
      ops.Sessionize.transitionMatrix(s.read.parquet(p(d, "events")))
        .orderBy("from_type", "to_type")
    }),
    "q142_funnel" -> ((s, d) => {
      // first-touch funnel view -> click -> purchase within 3 days:
      // per-step reached-user counts + exact summed anchor lags.
      ops.Sessionize.funnel(s.read.parquet(p(d, "events")),
        Seq("view", "click", "purchase"), horizonUs = 259200000000L)
        .orderBy("step")
    }),
    "q141_phrase_index" -> ((s, d) => {
      // positional-index phrase search: the corpus's top-3 trigrams as
      // query phrases, matches by consecutive-position posting joins.
      TextOps.phraseMatches(s.read.parquet(p(d, "documents"))
        .select("doc_id", "text"), topK = 3)
        .orderBy("phrase", "doc_id")
    }),
    "q140_mad_outliers" -> ((s, d) => {
      // robust per-source length outliers: |n_chars - median| > 2 x MAD,
      // both medians by nearest-rank selection — integer exact.
      TextOps.madOutliers(s.read.parquet(p(d, "documents"))
        .select("doc_id", "source", "n_chars"), "n_chars", 2L)
        .orderBy("doc_id")
    }),
    "q139_pmi" -> ((s, d) => {
      // skip-gram PMI over documents: distance-1/2 directed pairs, min
      // support 5, nano-nat PMI — the oracle replays pair extraction,
      // marginals, and the rounded ln identically.
      TextOps.pmiPairs(s.read.parquet(p(d, "documents"))
        .select("doc_id", "text"), minCount = 5L)
        .orderBy("tok_a", "tok_b")
    }),
    "q138_budget_cut" -> ((s, d) => {
      // per-source 4k-char budget cut in seeded shuffle order — the
      // distributed grouped prefix sum; the oracle replays the
      // mathematically identical per-source window.
      TextOps.budgetCut(s.read.parquet(p(d, "documents"))
        .select("doc_id", "source", "n_chars"), "n_chars", 4000L)
        .orderBy("doc_id")
    }),
    "q137_median" -> ((s, d) => {
      // 3x3 lower-median denoise per image — order statistics with
      // clipped rims; every filtered value pinned via total +
      // position-weighted checksums.
      ImageOps.medianFilter(s, synthImages(s, d)).orderBy("image_id")
    }),
    "q136_kde" -> ((s, d) => {
      // separable 5x5 integer-kernel density splat of the image anchors
      // onto the level-14 grid — map-side combine absorbs the downtown
      // hot cell before the exchange.
      SpatialOps.kernelDensity(synthImages(s, d), "anchor_x", "anchor_y",
        level = 14).orderBy("cx", "cy")
    }),
    "q134_cdc" -> ((s, d) => {
      // change data feed between merge-on-read snapshots: inserts /
      // deletes / updates between sequence 2 (both base commits) and
      // sequence 4 (delete + partial re-insert + fresh keys), with
      // payload identity hashed pre/post. Oracle = the same commit
      // arithmetic straight off documents.
      val dir = fixtureDir(s, "graft_q134_data")
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      dirPath.getFileSystem(s.sessionState.newHadoopConf())
        .delete(dirPath, true)
      import graft.sources.MergeOnRead
      val docs = s.read.parquet(p(d, "documents")).select("doc_id", "text")
      MergeOnRead.commitData(docs.where(col("doc_id") % 3 === 0), dir)
      MergeOnRead.commitData(docs.where(col("doc_id") % 3 === 1), dir)
      MergeOnRead.commitDeletes(docs.where(col("doc_id") % 9 === 0)
        .select("doc_id"), dir, "doc_id")
      MergeOnRead.commitData(
        docs.where(col("doc_id") % 18 === 0)
          .select(col("doc_id"),
            concat(lit("updated: "), col("text")).as("text"))
          .unionByName(docs.where(col("doc_id") % 3 === 2)), dir)
      MergeOnRead.changesBetween(s, dir, "doc_id", Seq("text"), 2L, 4L)
        .orderBy("doc_id")
    }),
    "q133_stops" -> ((s, d) => {
      // trajectory stop detection: same-cell dwell runs of >= 10 points
      // (>= 5 min at 30 s cadence) over the seeded walker tracks; the
      // oracle replays cell assignment, LAG boundaries, and the
      // ROWS-framed run ids from the track dump.
      TrajectoryOps.stopDetection(
        synthTracks(s, math.max(16L, (20000 * sfOf(d)).toLong), 200L),
        cellSize = 64L, minPoints = 10)
        .orderBy("walker_id", "enter_us")
    }),
    "q132_snap" -> ((s, d) => {
      // nearest-segment snap within radius 64: buffered-cover candidate
      // join, exact integer distance with ONE final division, smallest
      // seg_id tie-break; the oracle is the blocking-independent brute
      // argmin over the dumped layers.
      SpatialOps.snapToSegments(
        synthPoints(s, math.max(128L, (200000 * sfOf(d)).toLong), 401L),
        synthSegments(s, math.max(64L, (40000 * sfOf(d)).toLong), 11L),
        radius = 64L)
        .orderBy("point_id")
    }),
    "q131_otsu" -> ((s, d) => {
      // Otsu binarization threshold per image — exact integer/double
      // argmax, replayed in SQL as a cumulative window over the luma
      // histogram from the pixel dump.
      ImageOps.otsuThreshold(s, synthImages(s, d)).orderBy("image_id")
    }),
    "q130_hilbert_skip" -> ((s, d) => {
      // OPTIMIZE with the curve upgraded: ONE Hilbert-clustered layout
      // prunes range reads on BOTH dimensions (per-dim `skipped` pins,
      // the q84 shape), plus a key-exactness leg — bit_xor of the 8-bit
      // Hilbert index over every doc, replayed step-for-step in SQL.
      val dir = fixtureDir(s, "graft_q130_data")
      val docs = s.read.parquet(p(d, "documents"))
        .select("doc_id", "source", "n_chars")
      graft.sources.StatsManifest.hilbertWrite(docs, dir, "doc_id",
        "n_chars", 16)
      def leg(c: String, lo: Long, hi: Long): DataFrame = {
        val (pr, opened, total) =
          graft.sources.StatsManifest.prunedRead(s, dir, c, lo, hi)
        pr.agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("id_sum"),
            sum(col("n_chars")).as("chars_sum"))
          .select(lit(c).as("dim"), col("n_rows"), col("id_sum"),
            col("chars_sum"), lit(opened < total).as("skipped"))
      }
      val keyLeg = docs.select(graft.expr.GeomFunctions.hilbert_index(
          pmod(col("doc_id"), lit(256L)), pmod(col("n_chars"), lit(256L)),
          lit(8)).as("hk"))
        .agg(count(lit(1)).as("n_rows"), expr("bit_xor(hk)").as("id_sum"),
          lit(0L).as("chars_sum"))
        .select(lit("key_xor").as("dim"), col("n_rows"), col("id_sum"),
          col("chars_sum"), lit(true).as("skipped"))
      leg("doc_id", 100L, 140L).unionByName(leg("n_chars", 150L, 300L))
        .unionByName(keyLeg).orderBy("dim")
    }),
    "q129_seg_crossings" -> ((s, d) => {
      // line-feature overlay: proper segment crossings between two seeded
      // layers — cell-cover blocked equi-join + exact integer orientation
      // tests; the oracle is a blocking-independent cross join over the
      // dumped layers with the same sign tests.
      SpatialOps.segmentCrossings(
        synthSegments(s, math.max(64L, (40000 * sfOf(d)).toLong), 11L),
        synthSegments(s, math.max(96L, (60000 * sfOf(d)).toLong), 77L))
        .orderBy("a_id", "b_id")
    }),
    "q128_quadtree" -> ((s, d) => {
      // adaptive quadtree cover of the image anchors: the downtown hot
      // block descends to level 16 while the sparse lattice stays coarse.
      // One closed-form pass (ancestor explode + counts), no iteration;
      // the oracle replays the same bit math level by level.
      SpatialOps.quadtreeLeaves(synthImages(s, d), "image_id",
        "anchor_x", "anchor_y", baseLevel = 10, maxLevel = 16, cap = 64L)
        .orderBy("level", "cell_id")
    }),
    "q127_morphology" -> ((s, d) => {
      // cross-tile 3x3 grayscale morphology over the stitched mosaic —
      // the halo-exchange stencil: interiors reduce locally, only the
      // outermost pixel ring resolves through a slim-row exchange. The
      // oracle recomputes every clipped neighborhood min/max from the
      // pixel dump with 9 equi-joined offsets.
      ImageOps.morphology(s, Synth.mosaicTiles(s, mosaicSide(sfOf(d))))
        .orderBy("tile_x", "tile_y")
    }),
    "q126_merge_on_read" -> ((s, d) => {
      // Iceberg-v2 equality deletes + merge-on-read: data/delete commits
      // share one sequence; a delete removes same-key rows of strictly
      // lower sequence only, a later re-insert survives, and compaction
      // folds the delete log away (content equality pinned TRUE). The
      // oracle reconstructs the surviving set from documents with the
      // same commit arithmetic — end-to-end proof of the metadata layer.
      val dir = fixtureDir(s, "graft_q126_data")
      val dirPath = new org.apache.hadoop.fs.Path(dir)
      dirPath.getFileSystem(s.sessionState.newHadoopConf())
        .delete(dirPath, true)
      import graft.sources.MergeOnRead
      val docs = s.read.parquet(p(d, "documents")).select("doc_id", "text")
      MergeOnRead.commitData(docs.where(col("doc_id") % 4 <= 1), dir)
      MergeOnRead.commitData(docs.where(col("doc_id") % 4 === 2), dir)
      MergeOnRead.commitDeletes(docs.where(col("doc_id") % 8 <= 2)
        .select("doc_id"), dir, "doc_id")
      MergeOnRead.commitData(docs.where(col("doc_id") % 16 === 0)
        .select(col("doc_id"),
          concat(lit("reinserted: "), col("text")).as("text")), dir)
      def h(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        conv(substring(md5(c), 1, 15), 16, 10).cast("long")
      val live = MergeOnRead.read(s, dir, "doc_id")
        .select(col("doc_id"), col("src_seq"), h(col("text")).as("text_h"))
        .localCheckpoint() // materialize before compaction rewrites files
      def summary(df: DataFrame) = df
        // bit_xor, not sum: 60-bit hashes summed over hundreds of rows
        // overflow the ANSI long
        .agg(count(lit(1)), sum(col("doc_id")),
          expr("bit_xor(text_h)")).head()
      val pre = summary(live)
      MergeOnRead.compactAway(s, dir, "doc_id")
      val post = summary(MergeOnRead.read(s, dir, "doc_id")
        .select(col("doc_id"), h(col("text")).as("text_h")))
      val eq = (0 to 2).forall(i => pre.getLong(i) == post.getLong(i))
      live.withColumn("compact_equal", lit(eq))
        .orderBy("doc_id", "src_seq")
    }),
    "q125_dup_spans" -> ((s, d) => {
      // exact-substring span dedup (Lee et al.): maximal per-doc character
      // spans covered by any >=30-char substring occurring >=2x in the
      // corpus. Corpus = documents ∪ the q83 increment, whose planted
      // exact + trimmed copies guarantee long cross-doc shared substrings.
      val docs = s.read.parquet(p(d, "documents")).select("doc_id", "text")
        .unionByName(q83Increment(s, d))
      TextOps.dupSpans(docs, L = 30)
        .orderBy("doc_id", "span_start")
    }),
    "q124_winnowing" -> ((s, d) => {
      // winnowing fingerprints (MOSS, public) + near-verbatim overlap:
      // char-12-gram 40-bit hashes, window-of-8 rightmost-min selection as
      // ONE window pass (h·2^20 + reversed-pos key), posting-list join,
      // containment ≥ 50% of the smaller side. Corpus = documents ∪ the
      // q83 increment (planted exact + trimmed near-dups). The oracle
      // replays selection and matching in SQL from the dumps.
      val docs = s.read.parquet(p(d, "documents")).select("doc_id", "text")
        .unionByName(q83Increment(s, d))
      TextOps.winnowMatches(docs, k = 12, w = 8)
        .orderBy("doc_a", "doc_b")
    }),
    "q122_pcm_resample" -> ((s, d) => {
      // linear-interpolation PCM resampling over WAV-containered clips:
      // 8-bit fixed-point positions, non-negative-biased blend so >> 8 is
      // floor division on both engines — exact integer end to end; the
      // oracle replays per output sample from the SOURCE sample dump
      // (never the engine's demux/decode).
      AudioOps.resamplePcm(s,
        AudioOps.synthClips(s, nOther(sfOf(d)), nSamples = 1600,
          window = 400)._1, outN = 1200, stepQ = 341)
        .orderBy("clip_id")
    }),
    "q123_audio_features" -> ((s, d) => {
      // per-clip curation features: strict zero-crossing count (zeros
      // never cross — deterministic), peak |sample|, exact |sample| sum.
      AudioOps.audioFeatures(s,
        AudioOps.synthClips(s, nOther(sfOf(d)), nSamples = 1600,
          window = 400)._1)
        .orderBy("clip_id")
    }),
    "q121_bilinear" -> ((s, d) => {
      // bilinear resample 16×16 → 12×12 with 8-bit fixed-point positions
      // and weights (stepQ=341 ≈ 1.333·256, offQ=42) — exact integer math
      // end to end; per-image value + position-weighted checksums pin
      // every output pixel. Oracle replays the interpolation per output
      // pixel from the pixel dump.
      ImageOps.bilinearResample(s, synthImages(s, d)
          .where(substring(col("image_id"), 4, 12).cast("long") % 10 === 0),
        outW = 12, outH = 12, stepQ = 341, offQ = 42)
        .orderBy("image_id")
    }),
    "q120_marching_squares" -> ((s, d) => {
      // marching-squares contour cells over the stitched mosaic: per-case
      // cell counts + segment counts, with tile-boundary-straddling cells
      // broken out (assembled from boundary-pixel corner rows — the q114
      // exchange shape; pixel payloads never shuffle). The oracle derives
      // every 2×2 world cell from the pixel dump with a 4-way self-join.
      ImageOps.marchingSquares(s,
        Synth.mosaicTiles(s, mosaicSide(sfOf(d))), threshold = 128)
        .orderBy("ms_case")
    }),
    "q119_haversine" -> ((s, d) => {
      // great-circle radius join (geodesic twin of the planar joins):
      // 3×3 lon/lat-grid blocking + exact haversine refine, distances as
      // integer meters (fixed-point shield over asin/sin/cos), per-point
      // neighbor rollup. The oracle recomputes from an O(n²) brute force —
      // INDEPENDENT of the blocking, so a dropped candidate cell would
      // fail the gate, not just a wrong refine.
      SpatialOps.haversineNeighbors(
        synthImages(s, d)
          .where(substring(col("image_id"), 4, 12).cast("long") % 10 === 0)
          .select(col("image_id"), (col("anchor_x") / lit(1000.0)).as("lon"),
            (col("anchor_y") / lit(1000.0)).as("lat")),
        radiusM = 500.0, gridDeg = 0.006)
        .orderBy("image_id")
    }),
    "q118_phash" -> ((s, d) => {
      // DCT perceptual hash: quantized-integer 2D DCT-II (1e6 cosine
      // table — exact int64 math end to end), 63 AC coefficients, median
      // threshold. Gate runs the q115 1-in-40 slice; the oracle replays
      // table, DCT sums, median, and bit packing in SQL. Near-dup
      // retrieval over the signature reuses the q51 hamming machinery
      // (PhashSpec pins planted-dup recall).
      ImageOps.phash(s, synthImages(s, d)
          .where(substring(col("image_id"), 4, 12).cast("long") % 40 === 0))
        .orderBy("image_id")
    }),
    "q117_geohash" -> ((s, d) => {
      // geohash encode (public standard) as pure column bit math over the
      // image anchors (local CRS meters → degrees by a fixed /1000 map),
      // rolled up by 5-char prefix — the locality-partitioning surface
      // real geo pipelines bucket and prefix-filter by. Validated against
      // the classic bisection algorithm (GeohashSpec); the oracle replays
      // every shift/and/or in SQL.
      synthImages(s, d)
        .withColumn("gh", SpatialOps.geohashEncode(
          col("anchor_x") / lit(1000.0), col("anchor_y") / lit(1000.0), 8))
        .groupBy(substring(col("gh"), 1, 5).as("gh5"))
        .agg(count(lit(1)).as("n_images"),
          min("anchor_x").as("min_x"), max("anchor_x").as("max_x"),
          min("anchor_y").as("min_y"), max("anchor_y").as("max_y"))
        .orderBy("gh5")
    }),
    "q116_dsir_resample" -> ((s, d) => {
      // DSIR-style importance resampling (public method, Xie et al. 2023):
      // hashed-bigram log-likelihood ratio of reference (source 'src0') vs
      // raw corpus, nano-nat integer terms (q77/q112 discipline), keep =
      // more reference-like than raw. Weight table ≤ 1024 rows, broadcast;
      // the oracle replays bucket counts, smoothing, ln, and the per-doc
      // sums in SQL.
      TextOps.dsirScores(s.read.parquet(p(d, "documents")),
        isRef = col("source") === "src0", buckets = 1024)
        .orderBy("doc_id")
    }),
    "q115_hist_equalize" -> ((s, d) => {
      // per-image histogram equalization remap table: integer BT.601 luma
      // histogram → CDF → floor remap, all inside the single decode pass
      // (zero shuffle; ≤ 256 slim rows per image at any image size). Gate
      // runs a deterministic 1-in-40 image slice to keep the compare
      // light; the oracle replays the math with SQL windows (ROWS frame,
      // exact integer floor division) over the dumped pixels.
      ImageOps.histogramEqualize(s, synthImages(s, d)
          .where(substring(col("image_id"), 4, 12).cast("long") % 40 === 0))
        .orderBy("image_id", "lum")
    }),
    "q114_raster_cc" -> ((s, d) => {
      // distributed cross-tile raster connected-component labeling: local
      // union-find per tile (decode once, typed flatMap) → slim per-blob
      // stats + boundary-pixel rows only → two equi-joins for cross-tile
      // merge edges → q62's label-propagation clustering over LABELS →
      // per-component rollup. The oracle recomputes whole-raster CCL from
      // the dumped pixels with a transitive-closure CTE.
      ImageOps.rasterComponents(s, Synth.mosaicTiles(s, mosaicSide(sfOf(d))),
        threshold = 128).orderBy("component")
    }),
    "q113_pair_verify" -> ((s, d) => {
      // exact verify of the image near-dup candidates (the stage after
      // hash blocking): per q51 pair, integer sum of absolute channel
      // differences + exact milli-MAE. Decode once, one codegen'd
      // zip_with fold per pair — payload crosses exactly the two joins
      // the metric inherently needs.
      val imgs = synthImages(s, d)
      val all = imgs.select("image_id", "bytes", "w", "h", "fmt")
        .unionByName(ImageOps.perturbedDups(s, imgs))
      val pairs = ImageOps.dhashNearDups(s, all, maxHamming = 3)
        .select("img_a", "img_b")
      ImageOps.pairPixelSad(s, all, pairs).orderBy("img_a", "img_b")
    }),
    "q99_leakage_safe_split" -> ((s, d) => {
      // leakage-safe train/val/test split: assignment hashes the near-dup
      // COMPONENT representative, not the doc — so near-duplicates can
      // never straddle train and test (the eval-contamination failure mode
      // of naive per-doc splits). 80/10/10 by seeded md5, no RNG state.
      val docs = q62Corpus(s, d)
      val kl = Clustering.keepList(docs.select("doc_id"), q62Edges(docs))
      val h = pmod(conv(substring(md5(concat(
        col("component").cast("string"), lit("@split"))), 1, 15), 16, 10)
        .cast("long"), lit(10L))
      kl.withColumn("split",
          when(h < 8, "train").when(h < 9, "val").otherwise("test"))
        .select(col("doc_id"), col("component"), col("split"))
        .orderBy("doc_id")
    }),
    "q100_profile" -> ((s, d) => {
      // dataset profiling (the stats card every corpus release ships):
      // per-source row/null/distinct counts, char-length range, exact
      // mean; one map-side-combined aggregate pass.
      val docs = s.read.parquet(p(d, "documents"))
      docs.groupBy("source").agg(
          count(lit(1)).as("n_rows"),
          sum(col("text").isNull.cast("long")).as("null_text"),
          countDistinct(col("lang")).as("n_langs"),
          min(col("n_chars")).as("min_chars"),
          max(col("n_chars")).as("max_chars"),
          (round(sum(col("n_chars")).cast("double") / count(lit(1)), 6)
            + 0.0).as("avg_chars"),
          countDistinct(md5(col("text"))).as("n_distinct_texts"))
        .orderBy("source")
    }),
    "q97_pair_construction" -> ((s, d) => {
      // multimodal training-pair construction: parse the caption's
      // building reference, broadcast-join per-building geometry stats
      // onto every image — the (image, caption, structured-metadata) rows
      // a captioning/contrastive trainer consumes. The 4M-image side
      // never shuffles; the building stats are dimension-sized.
      val imgs = synthImages(s, d).select(col("image_id"), col("caption"),
        regexp_extract(col("caption"), "building (\\d+) ", 1)
          .cast("long").as("bref"))
      val bstats = synthSurfaces(s, d).groupBy(col("building_ord"))
        .agg(count(lit(1)).as("n_surfaces"),
          sum(when(col("surface_class") === "RoofSurface", 1L)
            .otherwise(0L)).as("n_roof"))
      imgs.join(broadcast(bstats),
          imgs("bref") === bstats("building_ord"), "left")
        .select(col("image_id"), col("bref"),
          coalesce(col("n_surfaces"), lit(0L)).as("n_surfaces"),
          coalesce(col("n_roof"), lit(0L)).as("n_roof"))
        .orderBy("image_id")
    }),
    "q98_negative_sampling" -> ((s, d) => {
      // deterministic in-batch negatives for contrastive training: for
      // each image, K=2 negative partners from disjoint bit fields of a
      // seeded md5 (self-hits bumped by one, mod n) — no RNG state,
      // engine/partitioning/rerun invariant; the partner's caption ref
      // arrives via a self-join on the dense image index.
      val imgs = synthImages(s, d).select(col("image_id"),
        regexp_extract(col("caption"), "building (\\d+) ", 1)
          .cast("long").as("bref"),
        substring(col("image_id"), 4, 12).cast("long").as("img_ord"))
      val n = lit(imgs.count())
      val withNeg = imgs
        .select(col("image_id"), col("img_ord"),
          explode(array(lit(0L), lit(1L))).as("neg_slot"))
        .withColumn("hsh", conv(substring(md5(concat(col("image_id"),
          lit("@neg"), col("neg_slot"))), 1, 15), 16, 10).cast("long"))
        .withColumn("cand", pmod(col("hsh"), n))
        .withColumn("neg_ord",
          when(col("cand") === col("img_ord"),
            pmod(col("cand") + 1L, n)).otherwise(col("cand")))
      withNeg.join(imgs.select(col("img_ord").as("neg_ord"),
          col("image_id").as("neg_image_id"), col("bref").as("neg_bref")),
          Seq("neg_ord"))
        .select(col("image_id"), col("neg_slot"), col("neg_image_id"),
          col("neg_bref"))
        .orderBy("image_id", "neg_slot")
    }),
    "q96_cell_pyramid" -> ((s, d) => {
      // map-tile pyramid: per-cell counts at zoom 14, then each coarser
      // level aggregates the PREVIOUS level's cell rows (parent id = two
      // shifts + OR, codegen'd) — raw images are scanned ONCE; levels 12
      // and 10 roll up from cell-count-sized frames. The oracle derives
      // every level independently from the anchors.
      val base = SpatialOps.imageCells(synthImages(s, d))
        .groupBy("cell_id").agg(count(lit(1)).as("n_images"))
        .localCheckpoint(true)
      def up(df: DataFrame, from: Int, to: Int): DataFrame =
        df.groupBy(ImageOps.parentCell(col("cell_id"), from, from - to)
            .as("cell_id"))
          .agg(sum(col("n_images")).as("n_images"))
      val l12 = up(base, 14, 12).localCheckpoint(true)
      val l10 = up(l12, 12, 10)
      base.select(lit(14L).as("level"), col("cell_id"), col("n_images"))
        .unionByName(l12.select(lit(12L).as("level"), col("cell_id"),
          col("n_images")))
        .unionByName(l10.select(lit(10L).as("level"), col("cell_id"),
          col("n_images")))
        .orderBy("level", "cell_id")
    }),
    "q95_stream_sessions" -> ((s, d) => {
      // streaming sessionization under the gate: the events table replayed
      // through the file source into Spark's native session_window (gap
      // 30 min), memory sink in complete mode; the oracle replays the
      // >=-gap session split relationally. The streaming operator and the
      // batch window chain MUST produce identical sessions.
      import org.apache.spark.sql.streaming.Trigger
      val ev = s.read.parquet(p(d, "events"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q95").toString
      ev.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(ev.schema).parquet(s"$tmp/in")
      val qn = "q95_session_sink"
      s.catalog.dropTempView(qn)
      val q = graft.streaming.StreamingIngest.sessionWindows(
          stream.withColumn("ts", col("ts").cast("timestamp")), "30 minutes")
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        col("n_events"), col("val_sum"))
        .orderBy("user_id", "session_start_us")
    }),
    "q94_rag_chunks" -> ((s, d) => {
      // RAG chunking: 32-token windows, step 24 (8-token overlap); the
      // 60-bit chunk hash is the downstream join currency — chunk text
      // never shuffles. Zero UDF, zero exchange (explode is narrow).
      TextOps.ragChunks(s.read.parquet(p(d, "documents")),
        window = 32, step = 24).orderBy("doc_id", "chunk_idx")
    }),
    "q93_time_travel" -> ((s, d) => {
      // snapshot log + AS OF reads: write (v1), append (v2), compact (v3)
      // — each commit is a numbered manifest; v1/v2 reads reconstruct the
      // table exactly as of those commits even though v3's compaction
      // superseded the small files (they stay on disk until vacuum).
      val dir = fixtureDir(s, "graft_q93_data")
      val docs = s.read.parquet(p(d, "documents"))
      graft.sources.StatsManifest.write(docs.where(col("doc_id") < 400)
        .repartitionByRange(2, col("n_chars")), dir, Seq("n_chars"))
      graft.sources.StatsManifest.append(docs.where(col("doc_id") >= 400)
        .repartition(10, col("doc_id")), dir, Seq("n_chars"))
      val man = s.read.parquet(dir + "_manifest")
        .orderBy(desc("file_bytes")).collect()
      val thr = (man.drop(2).map(_.getAs[Long]("file_bytes")).max +
        man.take(2).map(_.getAs[Long]("file_bytes")).min) / 2
      graft.sources.StatsManifest.compact(s, dir, Seq("n_chars"), thr, 1L << 20)
      def leg(v: Long): DataFrame =
        graft.sources.StatsManifest.timeTravelRead(s, dir, v)
          .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"),
            sum(col("n_chars")).as("chars_sum"))
          .select(lit(s"v$v").as("version"), col("n_docs"), col("id_sum"),
            col("chars_sum"))
      leg(1L).unionByName(leg(2L)).unionByName(leg(3L)).orderBy("version")
    }),
    "q92_bucketed_join" -> ((s, d) => {
      // co-located big-big join: both sides written bucketBy(8, doc_id) —
      // the sort-merge join then reads bucket-aligned splits with NO
      // shuffle on either side (at 100 TB this is THE way to join two
      // fact tables repeatedly: pay the bucketed write once, never pay
      // the join exchange again). `shuffle_free` is computed from the
      // executed plan (SortMergeJoin present, zero hash-partition
      // exchanges) and pinned TRUE by the oracle — if this layout ever
      // starts shuffling, the gate goes red.
      val base = fixtureDir(s, "graft_q92_data")
      val docs = s.read.parquet(p(d, "documents"))
      val bands = TextOps.minhashBandTable(docs, k = 3, bands = 16, rows = 2)
      docs.write.mode("overwrite").format("parquet")
        .option("path", s"$base/docs")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("g92_docs")
      bands.write.mode("overwrite").format("parquet")
        .option("path", s"$base/bands")
        .bucketBy(8, "doc_id").sortBy("doc_id").saveAsTable("g92_bands")
      val joined = s.table("g92_docs").hint("merge")
        .join(s.table("g92_bands"), Seq("doc_id"))
        .groupBy("doc_id", "n_chars")
        .agg(count(lit(1)).as("n_bands"),
          min(col("band_hash")).as("hash_min"),
          max(col("band_hash")).as("hash_max"))
      val plan = joined.queryExecution.executedPlan.toString
      val shuffleFree = plan.contains("SortMergeJoin") &&
        !plan.contains("Exchange hashpartitioning")
      joined.withColumn("shuffle_free", lit(shuffleFree)).orderBy("doc_id")
    }),
    "q91_compaction" -> ((s, d) => {
      // OPTIMIZE bin-packing: 2 big base files + 10 small incremental
      // appends, small fleet compacted into packed files, big files
      // untouched (zero I/O). Pins: rows identical to the source table,
      // `compacted` (file count dropped) and `big_kept` (both base files
      // still referenced by the refreshed manifest) both TRUE.
      val dir = fixtureDir(s, "graft_q91_data")
      val docs = s.read.parquet(p(d, "documents"))
      graft.sources.StatsManifest.write(docs.where(col("doc_id") < 400)
        .repartitionByRange(2, col("n_chars")), dir, Seq("n_chars"))
      graft.sources.StatsManifest.append(docs.where(col("doc_id") >= 400)
        .repartition(10, col("doc_id")), dir, Seq("n_chars"))
      val man0 = s.read.parquet(dir + "_manifest")
        .orderBy(desc("file_bytes")).collect()
      val bigFiles = man0.take(2).map(_.getAs[String]("file")).toSet
      val thr = (man0.drop(2).map(_.getAs[Long]("file_bytes")).max +
        man0.take(2).map(_.getAs[Long]("file_bytes")).min) / 2
      val (before, after) = graft.sources.StatsManifest.compact(
        s, dir, Seq("n_chars"), thr, 1L << 20)
      val kept = s.read.parquet(dir + "_manifest")
        .select("file").collect().map(_.getString(0)).toIndexedSeq
      s.read.parquet(kept: _*).groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("sum_chars"),
          sum(col("doc_id")).as("id_sum"))
        .withColumn("compacted", lit(after < before))
        .withColumn("big_kept", lit(bigFiles.subsetOf(kept.toSet)))
        .orderBy("source")
    }),
    "q88_sessionize" -> ((s, d) => {
      // clickstream sessionization: 30-minute-gap split per user, one hash
      // exchange shared by the lag window, the running session number, and
      // the per-session rollup (groupBy keys start with user_id).
      Sessionize.sessions(s.read.parquet(p(d, "events")),
        gapUs = 1800000000L).orderBy("user_id", "session_id")
    }),
    "q89_shot_bounds" -> ((s, d) => {
      // video shot-boundary detection over REAL MP4 containers: frame
      // pixel-sum deltas > threshold split shots; zero shuffle — demux,
      // decode, and the sequential fold all run where the payload lives.
      // Oracle replays the lag + running count from the SOURCE-pixel truth
      // table (decoder-independent, the q57 discipline).
      val (videos, _) = VideoOps.synthVideos(s, nOther(sfOf(d)), nFrames = 12)
      VideoOps.shotBoundaries(s, videos, threshold = 2000L)
        .orderBy("video_id", "frame_idx")
    }),
    "q90_dominant_color" -> ((s, d) => {
      // palette indexing: modal 12-bit RGB code per image (ties → smallest
      // code), plus distinct-code count. Zero shuffle, reused scratch.
      ImageOps.dominantColor(s, synthImages(s, d)).orderBy("image_id")
    }),
    "q87_cell_mosaic" -> ((s, d) => {
      // satellite-style per-cell composite: per-pixel floor-mean of every
      // image anchored in a Morton cell, via the partial-aggregable
      // MosaicAgg — the exchange ships one 769-long buffer per
      // (cell × partition), images never shuffle.
      ImageOps.mosaic(s, SpatialOps.imageCells(synthImages(s, d)))
        .orderBy("cell_id")
    }),
    "q86_scd2_merge" -> ((s, d) => {
      // MERGE INTO for plain parquet: SCD2 apply of a deterministic update
      // batch (changed / no-op / insert keys) at epoch 2 over a version-1
      // seed — changed keys close+reopen, identical payloads are
      // suppressed, history never shuffles (update side broadcast).
      val docs = s.read.parquet(p(d, "documents")).select("doc_id", "text")
      val seed = MergeOps.scd2Seed(docs, "doc_id", "text", 1L)
      val upd = docs.where(col("doc_id") % 7 === 3)
        .select(col("doc_id"), concat(col("text"), lit(" rev2")).as("text"))
        .unionByName(docs.where(col("doc_id") % 7 === 4))
        .unionByName(docs.where(col("doc_id") % 101 === 5)
          .select((col("doc_id") + 9000000L).as("doc_id"),
            concat(lit("ins "), col("doc_id")).as("text")))
      MergeOps.scd2Apply(seed, upd, "doc_id", "text", 2L)
        .orderBy("doc_id", "valid_from")
    }),
    "q85_image_quality" -> ((s, d) => {
      // crawl-grade image quality gate: Laplacian-variance blur score
      // (Pech-Pacheco) + mean luma from exact integer sums; threshold at
      // the corpus median so `sharp` splits the fleet. Zero shuffle.
      ImageOps.qualityStats(s, synthImages(s, d), 48500.0)
        .select(col("image_id"), col("n_int"), col("lap_sum"),
          col("lap_sq_sum"),
          (round(col("blur_var_raw"), 4) + 0.0).as("blur_var"),
          (round(col("mean_luma_raw"), 4) + 0.0).as("mean_luma"),
          col("sharp"))
        .orderBy("image_id")
    }),
    "q84_zorder_skip" -> ((s, d) => {
      // OPTIMIZE ZORDER for plain parquet: ONE Morton-clustered layout
      // serves range predicates on BOTH doc_id AND n_chars — each dim's
      // pruned read must skip files (per-dim `skipped` pins, q54 trick).
      val dir = fixtureDir(s, "graft_q84_data")
      val docs = s.read.parquet(p(d, "documents"))
        .select("doc_id", "source", "n_chars")
      graft.sources.StatsManifest.zorderWrite(docs, dir, "doc_id", "n_chars", 16)
      def leg(c: String, lo: Long, hi: Long): DataFrame = {
        val (pr, opened, total) =
          graft.sources.StatsManifest.prunedRead(s, dir, c, lo, hi)
        pr.agg(count(lit(1)).as("n_rows"),
            sum(col("doc_id")).as("id_sum"),
            sum(col("n_chars")).as("chars_sum"))
          .select(lit(c).as("dim"), col("n_rows"), col("id_sum"),
            col("chars_sum"), lit(opened < total).as("skipped"))
      }
      leg("doc_id", 100L, 140L).unionByName(leg("n_chars", 150L, 300L))
        .orderBy("dim")
    }),
    "q82_manifest_skip" -> ((s, d) => {
      // Iceberg-style per-file stats manifest + data-skipping range read
      // (no Iceberg jar — SURVEY §7.6): write range-partitioned parquet +
      // manifest, answer an inclusive range query opening ONLY overlapping
      // files. `skipped` is pinned TRUE by the oracle (the q54 trick): if
      // pruning ever stops happening on this layout the gate goes red.
      val dir = fixtureDir(s, "graft_q82_data")
      val docs = s.read.parquet(p(d, "documents"))
      graft.sources.StatsManifest.write(
        docs.repartitionByRange(8, col("n_chars")), dir, Seq("n_chars"))
      val (pruned, opened, total) = graft.sources.StatsManifest.prunedRead(
        s, dir, "n_chars", 150L, 300L)
      pruned.groupBy("source").agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("n_chars")).as("min_chars"),
        max(col("n_chars")).as("max_chars"))
        .withColumn("skipped", lit(opened < total))
        .orderBy("source")
    }),
    "q81_augment" -> ((s, d) => {
      // deterministic crop+flip augmentation: offsets/flip from disjoint
      // bit fields of the 60-bit md5 of (image_id, seed) — no RNG state,
      // engine/partitioning/rerun invariant; per-partition typed decode,
      // output rows carry only offsets + exact integer checksums (plain
      // and position-weighted). Oracle replays offsets, the flipped crop
      // window, and both sums from the dumped source pixels.
      ImageOps.augment(s, synthImages(s, d), cw = 12, ch = 12, seed = 81L)
        .orderBy("image_id")
    }),
    "q80_pii_scrub" -> ((s, d) => {
      // PII scrubbing over the planted fixture: per-category counts +
      // sequential redaction, zero-shuffle per-row regex in the Java∩RE2
      // dialect; the oracle replays counts and every replacement on the
      // dumped corpus with the same patterns.
      TextOps.scrubPii(graft.model.Synth.piiDocs(s, 315L)).orderBy("doc_id")
    }),
    "q79_semdedup" -> ((s, d) => {
      // SemDeDup (Abbas et al. 2023): cluster-bounded semantic dedup —
      // map-side nearest-centroid assignment (same nlist=16/iters=2
      // training as q45, bit-identical to the dumped centroids), pairwise
      // cosine only within clusters, components + keep-list via the q62
      // label-propagation operator. The oracle replays assignment, the
      // within-cluster threshold join, and the transitive closure.
      val emb = s.read.parquet(p(d, "embeddings"))
      val cents = AnnOps.ivfTrain(emb, dim = 64, nlist = 16, iters = 2)
      AnnOps.semDedup(emb, cents, threshold = 0.35).orderBy("vec_id")
    }),
    "q78_paragraph_dedup" -> ((s, d) => {
      // CCNet/C4-style corpus-level paragraph dedup: 10-token chunks as
      // stand-in paragraphs (the synth corpus has no newlines), chunks in
      // >= 2 distinct docs dropped corpus-wide, docs reassembled in
      // position order. Counting shuffles 8-byte hashes, never bodies;
      // the hot set broadcasts into an anti-join.
      TextOps.paragraphDedup(s.read.parquet(p(d, "documents")),
        TextOps.tokenChunks(10), maxDocs = 2L)
        .orderBy("doc_id")
    }),
    "q77_unigram_lm" -> ((s, d) => {
      // CCNet-style unigram LM quality score: self-trained token
      // probabilities, per-doc mean log-prob in INTEGER micro-nats (sums
      // are order-independent — the q70 integer-scaling rule); scoring is
      // a zero-shuffle literal-map fold.
      TextOps.unigramLogProb(s.read.parquet(p(d, "documents")))
        .orderBy("doc_id")
    }),
    "q76_bm25" -> ((s, d) => {
      // BM25 top-10 (Lucene +1 idf): corpus stats collapse to one driver
      // row, idf rides back as literals, tf is a per-row array filter —
      // the corpus never shuffles; top-k is TakeOrderedAndProject.
      TextOps.bm25TopK(s.read.parquet(p(d, "documents")),
        terms = bm25Terms, k = 10).orderBy("doc_id")
    }),
    "q75_exact_quantiles" -> ((s, d) => {
      // exact per-source length quantiles with NO global sort and no
      // percentile_approx nondeterminism: count per distinct value
      // (map-side combinable — the shuffle carries distinct values, not
      // rows), cumulative window, nearest-rank pick; the oracle replays
      // the identical rank select.
      Quantiles.exactQuantiles(s.read.parquet(p(d, "documents")),
        strataCol = "source", valueCol = "n_chars",
        qs = Seq(0.5, 0.95))
        .orderBy("source")
    }),
    "q74_stratified_sample" -> ((s, d) => {
      // deterministic stratified sample: 5 docs per source with the
      // smallest seeded md5 hash — a reservoir with no RNG state, same
      // members at any partitioning; the oracle replays the identical
      // hash-ordered window.
      TextOps.stratifiedSample(s.read.parquet(p(d, "documents")),
        strata = "source", idCol = "doc_id", n = 5, seed = 7L)
        .select(col("source"), col("doc_id"),
          col("sample_rank").cast("long").as("sample_rank"))
        .orderBy("source", "sample_rank")
    }),
    "q73_countmin" -> ((s, d) => {
      // count-min sketch heavy-hitter counts per source: a second
      // partial-aggregable sketch (8 KiB depth-4×width-256 counters,
      // elementwise-sum merge); point estimates for driver-known probe
      // tokens = min over rows at LITERAL indices. The oracle replays
      // every counter as a (row, position) group-by count and the same
      // LEAST over the probe cells — est ≥ exact pinned row by row.
      val probes = q73Probes
      val tok = s.read.parquet(p(d, "documents"))
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
      val exacts = probes.map(t =>
        sum(when(col("tok") === t, 1L).otherwise(0L)).as(s"exact_$t"))
      val aggd = tok.groupBy("source").agg(
        SketchOps.cms(col("tok")).as("sk"),
        (count(lit(1)).as("n_tokens") +: exacts): _*)
      aggd.select(
        (Seq(col("source"), col("n_tokens"),
          SketchOps.cmsChecksum(col("sk")).as("cms_checksum")) ++
          probes.map(t => SketchOps.cmsEstimate(col("sk"), t).as(s"est_$t")) ++
          probes.map(t => col(s"exact_$t"))): _*)
        .orderBy("source")
    }),
    "q72_stream_window" -> ((s, d) => {
      // Structured-Streaming windowed aggregation under the gate: the
      // events table replayed through the file source (AvailableNow),
      // hourly watermarked windows per event type, memory sink in
      // complete mode (single-run deterministic); the oracle recomputes
      // the same windows as a batch date_trunc group-by — streaming and
      // batch must agree window for window, sums bit-exact via the
      // DECIMAL(28,6) discipline. (Append-mode watermark EVICTION
      // semantics are pinned by StreamingSpec with a controlled
      // MemoryStream; a file replay can't make late-drop deterministic.)
      import org.apache.spark.sql.streaming.Trigger
      val ev = s.read.parquet(p(d, "events"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q72").toString
      ev.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(ev.schema).parquet(s"$tmp/in")
      val qn = "q72_window_sink"
      s.catalog.dropTempView(qn)
      // withWatermark requires TIMESTAMP (events.ts is TIMESTAMP_NTZ);
      // session TZ is UTC so the cast is wall-clock identity
      val q = graft.streaming.StreamingIngest.eventWindowCounts(
          stream.withColumn("ts", col("ts").cast("timestamp")))
        .writeStream.format("memory").queryName(qn)
        .outputMode("complete").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).select(
        date_format(col("window.start"), "yyyy-MM-dd HH:mm").as("window_start"),
        col("event_type"), col("n_events"), col("sum_value"))
        .orderBy("window_start", "event_type")
    }),
    "q71_bloom_filter" -> ((s, d) => {
      // Bloom runtime filter (SketchOps): bitset built from high-value
      // order keys (one ≤64-row aggregated collect), probe as a literal-
      // bitset MAP-SIDE expression over lineitem — the big side never
      // shuffles. Output pins exact pass/true/false-positive counts and
      // the false-negative count (must be 0); even the false positives
      // are deterministic, and the oracle replays every bit.
      val orders = s.read.parquet(p(d, "orders"))
      val li = s.read.parquet(p(d, "lineitem"))
      val keys = orders.where(col("o_totalprice") > 480000.0)
        .select(col("o_orderkey")).distinct()
      val bits = SketchOps.bloomBuild(keys, "o_orderkey", mBits = 4096, k = 4)
      li.select(col("l_orderkey"))
        .withColumn("pass",
          SketchOps.bloomMightContain(bits, col("l_orderkey"), 4096, 4))
        .join(broadcast(keys.select(col("o_orderkey").as("l_orderkey"))
          .withColumn("tru", lit(1L))), Seq("l_orderkey"), "left")
        .agg(
          count(lit(1)).as("n_rows"),
          sum(when(col("pass"), 1L).otherwise(0L)).as("n_pass"),
          sum(when(col("tru").isNotNull, 1L).otherwise(0L)).as("n_true"),
          sum(when(col("pass") && col("tru").isNull, 1L).otherwise(0L))
            .as("n_false_pos"),
          sum(when(col("tru").isNotNull && !col("pass"), 1L).otherwise(0L))
            .as("n_false_neg"),
          sum(when(col("pass"), col("l_orderkey")).otherwise(0L))
            .as("pass_key_sum"))
    }),
    "q70_hll" -> ((s, d) => {
      // HyperLogLog distinct tokens per source: a real partial-aggregable
      // 256-byte sketch (SketchOps.HllAgg) — map-side combine ships one
      // sketch per (partition × source), never the tokens. Registers are
      // pinned exactly (checksum + zero count) and the estimate formula —
      // including the linear-counting small-range branch — is replayed by
      // the oracle over the same md5-derived hashes.
      val docs = s.read.parquet(p(d, "documents"))
      val tok = docs
        .select(col("source"), explode(split(col("text"), " ")).as("tok"))
        .withColumn("h",
          conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
      tok.groupBy("source")
        .agg(SketchOps.hll(col("h")).as("regs"),
          countDistinct(col("tok")).as("n_exact"))
        .select(col("source"), col("n_exact"),
          SketchOps.hllRegSum(col("regs")).as("reg_checksum"),
          SketchOps.hllZeros(col("regs")).as("n_zero"),
          round(SketchOps.hllEstimate(col("regs")), 6).as("hll_estimate"))
        .orderBy("source")
    }),
    "q69_decontaminate" -> ((s, d) => {
      // eval-set decontamination: held-out snippets (one 8-gram from every
      // 97th doc) hashed and broadcast; the corpus streams its sliding
      // 8-gram hashes against the set map-side — no corpus shuffle. The
      // oracle replays snippet extraction, the md5-derived hash, and the
      // overlap join in SQL.
      val docs = s.read.parquet(p(d, "documents"))
      val toks = split(col("text"), " ")
      val evalSet = docs
        .where(pmod(col("doc_id"), lit(97L)) === 0 && size(toks) >= 12)
        .select(conv(substring(md5(concat_ws(" ", slice(toks, 5, 8))), 1, 15),
          16, 10).cast("long").as("h"))
      TextOps.contaminationHits(docs, evalSet, n = 8).orderBy("doc_id")
    }),
    "q68_repetition" -> ((s, d) => {
      // Gopher-style repetition quality gate: most-frequent 2-gram
      // count/char-fraction + duplicate 3-gram fraction per doc, computed
      // with a ZERO-SHUFFLE per-row run-length fold over sorted gram
      // arrays; the oracle recomputes relationally (unnest + group) —
      // equal sets, so the fold's and the groupBy's answers must agree.
      TextOps.repetitionStats(s.read.parquet(p(d, "documents")))
        .orderBy("doc_id")
    }),
    "q67_asof_join" -> ((s, d) => {
      // as-of join (the time-series operator Spark lacks; AsOfJoin): for
      // every purchase event, the latest click at-or-before it by the same
      // user — one hash exchange + one window pass over the union, no
      // range join, no broadcast. The oracle replays the identical
      // union + last_value(IGNORE NULLS) window in SQL.
      val ev = s.read.parquet(p(d, "events"))
      val purchases = ev.where(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val clicks = ev.where(col("event_type") === "click")
        .select("user_id", "ts", "event_id", "value")
      AsOfJoin.asOf(purchases, clicks, key = "user_id", ts = "ts",
        payload = Seq("event_id", "value"), tiebreak = "event_id")
        .select(col("event_id"), col("user_id"),
          coalesce(col("asof_event_id"), lit(-1L)).as("last_click_id"),
          coalesce(col("asof_value"), lit(0.0)).as("last_click_value"))
        .orderBy("event_id")
    }),
    "q66_ivf_pq" -> ((s, d) => {
      // IVF-PQ (round 5): the storage tier below SQ8 — coarse IVF lists
      // with PRODUCT-QUANTIZED payloads (8 subspaces × 16 codes = 8 bytes
      // per vector, 8× smaller than SQ8's 64). Approx-cosine shortlist
      // over the PQ reconstruction, exact re-rank of queries×shortlist.
      // The oracle replays per-subspace L2 assignment, reconstruction,
      // probe selection, shortlist, and re-rank from the dumped
      // centroid/codebook tables.
      val emb = s.read.parquet(p(d, "embeddings"))
      val cents = AnnOps.ivfTrain(emb, dim = 64, nlist = 16, iters = 2)
      val books = AnnOps.pqTrain(emb, dim = 64, m = 8, ksub = 16, iters = 2)
      AnnOps.ivfPqTopK(emb, Seq(0L, 1L, 2L), cents, books,
        nprobe = 4, k = 5, shortlist = 32)
        .orderBy("query_id", "rk")
    }),
    "q65_recipe" -> ((s, d) => {
      // THE training-data recipe, end to end under ONE gate: exact dedup →
      // near-dup clustering keep-list → quality filter → corpus mix → BPE
      // token counts → sequence packing → epoch shuffle. Every stage is
      // individually gated (q10 / q22+q62 / q12 / q61 / q63 / q59 / q60);
      // this query pins their COMPOSITION — the pipeline a training-data
      // user actually runs — with the oracle replaying all seven stages in
      // one SQL statement.
      val docs = s.read.parquet(p(d, "documents"))
      val kept1 = docs.join(
        TextOps.dedupExact(docs).select(col("keep_doc_id").as("doc_id")),
        "doc_id")
      val keep2 = Clustering.keepList(kept1.select("doc_id"), q65Edges(s, d))
        .where(col("is_keep")).select("doc_id")
      val kept2 = kept1.join(keep2, "doc_id")
      // exact-integer quality gate (≥ 1 stopword hit): float-free so the
      // composition stays bit-exact across engines
      val quality = kept2.where(
        size(filter(split(col("text"), " "),
          t => t.isin("the", "a", "of", "and", "to"))) >= 1)
      val mixed = TextOps.mixCorpus(quality, Map("src0" -> 0.5),
        defaultWeight = 1.0, seed = 7)
      val counts = BpeTokenizer.tokenCounts(mixed, q63Merges(s, d))
      val packed = TextOps.packOffsetsOf(counts, capacity = 1024)
        .withColumnRenamed("n_tokens", "n_bpe_tokens")
      packed.join(TextOps.shuffleRanks(mixed, seed = 99), "doc_id")
        .orderBy("doc_id")
    }),
    "q64_hog" -> ((s, d) => {
      // HOG-style gradient-orientation histograms (round-5 item #7): the
      // semantic image feature the container's no-vision-libs constraint
      // previously left open — integer luma sums, central differences,
      // 8 comparison-only orientation sectors, L1 magnitudes per 8×8 cell.
      // The oracle recomputes every cell histogram from the dumped decoded
      // pixels; a deterministic 1/16 phash slice keeps the row count sane.
      ImageOps.hogCells(s,
        synthImages(s, d).where(pmod(col("phash"), lit(16L)) === 0))
        .orderBy("image_id", "cell_y", "cell_x", "bin")
    }),
    "q63_bpe_pack" -> ((s, d) => {
      // REAL subword token counts (round-5 item #5): deterministic BPE —
      // merges trained on a 10% slice (distributed pair-count rounds,
      // lexicographic tie-breaks), full corpus encoded by a single-pass
      // expression, and the q59 sequence-packing op re-run over the BPE
      // counts (packOffsetsOf). The oracle replays ENCODE word-by-word via
      // a recursive CTE over the dumped merge table, then the same packing
      // window as q59.
      val merges = q63Merges(s, d)
      val counts = BpeTokenizer.tokenCounts(s.read.parquet(p(d, "documents")),
        merges)
      TextOps.packOffsetsOf(counts, capacity = 512)
        .withColumnRenamed("n_tokens", "n_bpe_tokens")
        .orderBy("doc_id")
    }),
    "q62_neardup_clusters" -> ((s, d) => {
      // distributed near-dup CLUSTERING + canonical keep-list (round-5 #1,
      // the op every dedup pipeline runs after its pair tables): connected
      // components by min-label propagation with pointer jumping (O(log
      // diameter) rounds of hash joins) over the union of minhash- and
      // simhash-near-dup edges on a corpus with CHAINED near-dups (A~B~C
      // but A≁C — the transitive case a pair list cannot deduplicate);
      // keep = min doc per component. The oracle recomputes components
      // from the dumped vertex/edge tables with a recursive CTE.
      val docs = q62Corpus(s, d)
      Clustering.keepList(docs.select("doc_id"), q62Edges(docs))
        .orderBy("doc_id")
    }),
    "q61_mix" -> ((s, d) => {
      // corpus mixing: per-source keep-fractions via a seeded md5 filter
      // (no shuffle, no RNG state); per-source kept counts + doc-id sums
      // prove the EXACT membership set, replayed by the oracle's CASE with
      // the same integer thresholds.
      TextOps.mixCorpus(s.read.parquet(p(d, "documents")),
        weights = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.0),
        defaultWeight = 1.0, seed = 13L)
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum(col("doc_id")).as("id_sum"))
        .orderBy("source")
    }),
    "q60_shuffle" -> ((s, d) => {
      // deterministic epoch shuffle: dense rank under a seeded md5
      // permutation, assigned via the distributed two-pass pattern; the
      // oracle replays the exact permutation with one SQL window.
      TextOps.shuffleRanks(s.read.parquet(p(d, "documents")), seed = 42L)
        .orderBy("doc_id")
    }),
    "q59_seq_pack" -> ((s, d) => {
      // sequence packing (pretraining batch op): concatenate documents in
      // doc_id order, cut every 2048 tokens — per-doc exclusive start
      // offset + [first_bin, last_bin]. The engine's prefix sum is
      // DISTRIBUTED (range-partition + local window + tiny offset table);
      // the oracle replays it as one SQL window over the documents table.
      TextOps.packOffsets(s.read.parquet(p(d, "documents")), capacity = 2048)
        .orderBy("doc_id")
    }),
    "q58_audio_energy" -> ((s, d) => {
      // multimodal audio leg: per-window Σ|sample| energy over REAL
      // RIFF/WAVE-containered 16-bit PCM clips (round-5: the demuxer is a
      // real chunk-walking WAV parser, never-fail) — exact integer math;
      // the oracle replays windows from the source-sample truth table
      // (engine demux/decode independent).
      val (clips, _) = AudioOps.synthClips(s, nOther(sfOf(d)),
        nSamples = 1600, window = 400)
      AudioOps.windowEnergy(s, clips, window = 400)
        .orderBy("clip_id", "window_idx")
    }),
    "q57_frame_sample" -> ((s, d) => {
      // multimodal frame sampling (the last op of the decode/feature/
      // resize/frame-sample list): every 3rd REAL PNG frame of each REAL
      // ISO-BMFF (MP4) container — demuxed by the general box-walker
      // (ftyp/mdat/moov + stsd/stts/stsc/stsz/stco sample table, round 5)
      // — decodes to a pixel checksum; the oracle reads the per-frame
      // truth table dumped from the SOURCE pixels (computed before
      // encoding — the engine's demux/decode path is not shared) and
      // replays the sampling predicate in SQL.
      val (videos, _) = VideoOps.synthVideos(s, nOther(sfOf(d)), nFrames = 12)
      VideoOps.sampleFrames(s, videos, every = 3)
        .orderBy("video_id", "frame_idx")
    }),
    "q56_components" -> ((s, d) => {
      // `-sepC` COMPONENT SEMANTICS under the gate: the exact component-key
      // expression the CLI uses (ObjPipeline.componentKey) bins mixed-city
      // faces into per-building / per-installation / 'Other' components;
      // per-component vertex-dictionary size, coordinate checksum, and
      // ear-clip face count are recomputed by the oracle from the dumped
      // pre-render surfaces (clean → validate → opening anti-join → key
      // derivation → Euler counts, all in SQL).
      val sf = sfOf(d)
      val mixed = graft.model.Synth.mixedCity(s, nBuildings(sf), nOther(sf))
      val withComp = mixed.withColumn("component",
        ObjPipeline.componentKey(mixed))
      val (ok, _) = ObjPipeline.validated(withComp)
      val tris = SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))
      val (v, f) = ObjPipeline.dictionaryEncode(
        ObjPipeline.corners(tris, semantics = false))
      v.groupBy("cls").agg(
          max("ordinal").as("n_vertices"),
          dsum(col("x") + col("y") + col("z")).as("coord_checksum"))
        .join(f.groupBy("cls").agg(count(lit(1)).as("n_faces")), "cls")
        .withColumnRenamed("cls", "component")
        .orderBy("component")
    }),
    "q55_ivf_sq" -> ((s, d) => {
      // IVF-SQ8 (round-4 stretch): same coarse centroids as q45, but the
      // list payload is 8-bit scalar-quantized codes; candidates rank by
      // approximate cosine over the dequantized codes and only the
      // shortlist re-ranks on full floats. The oracle recomputes quantizer
      // stats, codes, reconstruction, probe selection, shortlist, and the
      // exact re-rank — all from embeddings + the dumped centroid table.
      val emb = s.read.parquet(p(d, "embeddings"))
      val cents = AnnOps.ivfTrain(emb, dim = 64, nlist = 16, iters = 2)
      val (mn, mx) = AnnOps.sqTrain(emb, dim = 64)
      AnnOps.ivfSqTopK(emb, Seq(0L, 1L, 2L), cents, mn, mx,
        nprobe = 4, k = 5, shortlist = 32)
        .orderBy("query_id", "rk")
    }),
    "q54_resume" -> ((s, d) => {
      // RESUMABLE-RESTART EQUIVALENCE under the gate (round-4 #7): process 1
      // commits the first two pipeline stages then "dies" (stopAfter);
      // process 2 restarts over the same root — Lineage.stage short-circuits
      // on the committed _SUCCESS markers and finishes the rest; a fresh
      // single-shot run is the control. Output = the RESUMED run's per-cell
      // counts plus an `identical` multiset-equality flag vs the control;
      // the oracle recomputes the counts from inputs and pins identical =
      // true, so any restart drift turns the row red.
      val surf = synthSurfaces(s, d)
      val imgs = synthImages(s, d)
      val rootA = java.nio.file.Files.createTempDirectory("graft_q54_resume").toString
      val rootB = java.nio.file.Files.createTempDirectory("graft_q54_fresh").toString
      Lineage.runPipeline(s, rootA, surf, imgs, stopAfter = "image_cells")
      val resumed = Lineage.runPipeline(s, rootA, surf, imgs)
      val fresh = Lineage.runPipeline(s, rootB, surf, imgs)
      val identical =
        resumed.exceptAll(fresh).isEmpty && fresh.exceptAll(resumed).isEmpty
      resumed.withColumn("identical", lit(identical)).orderBy("cell_id")
    }),
    "q52_region_part_revenue" -> ((s, d) => {
      // TPC-H Q5/Q9-flavored multi-dimension star join — covers the
      // remaining relational tables (region, supplier, part): one fact
      // shuffle, every dimension broadcast (the 100 TB plan shape).
      val li = s.read.parquet(p(d, "lineitem"))
      val sup = s.read.parquet(p(d, "supplier"))
      val nat = s.read.parquet(p(d, "nation"))
      val reg = s.read.parquet(p(d, "region"))
      val prt = s.read.parquet(p(d, "part"))
      li.join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(nat), sup("s_nationkey") === nat("n_nationkey"))
        .join(broadcast(reg), nat("n_regionkey") === reg("r_regionkey"))
        .join(broadcast(prt), li("l_partkey") === prt("p_partkey"))
        .where(col("p_size") <= 25)
        .groupBy(col("r_name"), col("p_brand"))
        .agg(countDistinct(col("s_suppkey")).as("n_suppliers"),
          count(lit(1)).as("n_lines"),
          dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
            .as("revenue"))
        .orderBy("r_name", "p_brand")
    }),
    "q41_ngram_jaccard" -> ((s, d) => {
      // demo-scale exact n-gram Jaccard with length-bucket blocking (the
      // LSH path is the 100 TB variant) — fully SQL-recomputable
      TextOps.ngramJaccardPairs(s.read.parquet(p(d, "documents")),
        k = 3, threshold = 0.5)
        .orderBy("doc_a", "doc_b")
    }),
    "q39_bbox_sidecar" -> ((s, d) => {
      // O-6 bbox-JSON sidecar table: buffered AABB corners + translation
      // params per building (componentseparationmodule.py:137-183)
      graft.sink.GmlSink.bboxSidecar(
        SpatialOps.buildingBBoxes(synthSurfaces(s, d)),
        dx = -100.0, dy = -100.0, dz = 0.0)
        .orderBy("building_id")
    }),
    "q38_area" -> ((s, d) => {
      // O-18/O-20 getAreaOfGML: exterior minus valid holes, invalid rings
      // contribute 0 — oracle recomputes the shoelace/validity in pure SQL
      synthSurfaces(s, d).select(col("surface_id"),
        round(area_gml(col("ext"), col("holes")), 6).as("area"))
        .orderBy("surface_id")
    }),
    "q42_obj_flags" -> ((s, d) => {
      // EP-1 flag surface under the gate: -g object records, -a usemtl
      // materials (+ mtllib header). Building-level attribute for the 'All'
      // bin = the ground surface's irradiation (the synth stand-in for the
      // reference's yearlyIrradiation, CityGML2OBJs.py:662-665); class bins
      // color RoofSurface polygons only (CityGML2OBJs.py:729-739). The
      // oracle recomputes o/usemtl/f line counts, the o-line byte volume
      // (pinning the `o <bid>[_<first-feature-id>]` naming), and a ×10000
      // material-bin checksum parsed back out of the rendered usemtl text.
      val surf = synthSurfaces(s, d)
      val battr = surf.where(col("poly_ord") === 0)
        .select(col("building_id"),
          element_at(col("attrs"), "irradiation").as("batt"))
      val (v, f, _) = ObjPipeline.runFlags(s, surf, semantics = true,
        attribute = Some(("irradiation", 0.0, 1600.0)),
        buildingAttrs = Some(battr))
      ObjPipeline.objLines(v, f, objects = true, mtllib = true)
        .groupBy("cls").agg(
          sum(when(col("line").startsWith("o "), 1L).otherwise(0L)).as("n_o_lines"),
          sum(when(col("line").startsWith("o "), length(col("line")))
            .otherwise(0)).cast("long").as("o_bytes"),
          sum(when(col("line").startsWith("usemtl "), 1L).otherwise(0L)).as("n_usemtl"),
          sum(when(col("line") === "mtllib colormap.mtl", 1L).otherwise(0L)).as("n_mtllib"),
          sum(when(col("line").startsWith("f "), 1L).otherwise(0L)).as("n_f_lines"),
          sum(when(col("line").startsWith("usemtl "),
            round(substring(col("line"), 11, 64).cast("double") * 10000).cast("long"))
            .otherwise(0L)).as("mat_checksum"))
        .orderBy("cls")
    }),
    "q43_obj_skiptri" -> ((s, d) => {
      // -p SKIPTRI passthrough (CityGML2OBJs.py:137-148): polygons emit one
      // n-ary face over the open exterior ring, holes dropped, NO
      // triangulation. The oracle recomputes the vertex dictionary, the face
      // arity checksum, AND the exact printed face-index sum (first-
      // occurrence ordinals are EarClip-independent here, so the full
      // ordinal assignment is SQL-checkable — no golden needed).
      val (v, f, _) = ObjPipeline.runFlags(s, synthSurfaces(s, d),
        semantics = true, skipTri = true)
      val toks = split(col("line"), " ")
      ObjPipeline.objLines(v, f)
        .groupBy("cls").agg(
          sum(when(col("line").startsWith("v "), 1L).otherwise(0L)).as("n_v_lines"),
          sum(when(col("line").startsWith("f "), 1L).otherwise(0L)).as("n_f_lines"),
          sum(when(col("line").startsWith("f "), size(toks) - 1).otherwise(0))
            .cast("long").as("arity_sum"),
          sum(when(col("line").startsWith("f "),
            aggregate(slice(toks, lit(2), size(toks) - 1), lit(0L),
              (a, t) => a + t.cast("long"))).otherwise(0L)).as("f_index_sum"))
        .orderBy("cls")
    }),
    "q44_stream_dedup" -> ((s, d) => {
      // stateful streaming dedup (flatMapGroupsWithState) under the gate:
      // replay the documents table through the file source with an
      // AvailableNow trigger (one file → one deterministic batch; the state
      // keeps the min doc_id per hash) and hand the memory-sink table to the
      // DuckDB oracle. Proves the streaming operator agrees with the batch
      // first-arrival semantics, not just with itself.
      import org.apache.spark.sql.streaming.Trigger
      val docs = s.read.parquet(p(d, "documents"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q44").toString
      docs.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      val stream = s.readStream.schema(docs.schema).parquet(s"$tmp/in")
      val qn = "q44_dedup_sink"
      s.catalog.dropTempView(qn)
      val q = graft.streaming.StreamingIngest.dedupStream(stream)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      s.table(qn).select(col("text_hash"), col("keep_doc_id"))
        .orderBy("text_hash")
    }),
    "q152_stream_restart" -> ((s, d) => {
      // Structured Streaming FAULT TOLERANCE under the gate (r5 verdict
      // item #4): the stateful dedup stream runs over phase-1 files, STOPS
      // (a planned shutdown exercises the same recovery path as a crash —
      // the next run boots from the checkpoint's offset log + state
      // store), new files land, and a SECOND query on the same
      // checkpointLocation resumes into the same parquet sink. Phase 2
      // replays exact copies of phase-1 documents under NEW doc_ids —
      // suppressed ONLY if the phase-1 state store recovered — plus
      // genuinely new texts that must still emit. The oracle replays
      // first-phase-wins dedup over the same union relationally, so a
      // state loss (copies re-emitted), an offset loss (phase 1 replayed),
      // or a sink-log loss (duplicate files visible) each break rows+hash.
      import org.apache.spark.sql.streaming.Trigger
      val docs = s.read.parquet(p(d, "documents"))
      val tmp = java.nio.file.Files.createTempDirectory("graft_q152").toString
      val in = s"$tmp/in"; val out = s"$tmp/out"; val cp = s"$tmp/cp"
      def runOnce(): Unit = {
        val q = graft.streaming.StreamingIngest.dedupStream(
            s.readStream.schema(docs.schema).parquet(in))
          .writeStream.format("parquet").option("path", out)
          .option("checkpointLocation", cp)
          .outputMode("append").trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
      }
      docs.coalesce(1).write.mode("append").parquet(in)
      runOnce() // phase 1, then the query stops (planned shutdown)
      docs.where(col("doc_id") % 5 === 0)
        .withColumn("doc_id", col("doc_id") + 10000L) // exact dups, new ids
        .unionByName(docs.where(col("doc_id") % 7 === 0)
          .withColumn("doc_id", col("doc_id") + 20000L)
          .withColumn("text", concat(col("text"), lit("!")))) // new texts
        .coalesce(1).write.mode("append").parquet(in)
      runOnce() // restart: offsets + state recover from the checkpoint
      s.read.parquet(out).select(col("text_hash"), col("keep_doc_id"))
        .orderBy("text_hash")
    }),
    "q161_heavy_hitters" -> ((s, d) => {
      // EXACT heavy hitters with sketch-bounded state (round-6): one
      // global Misra-Gries aggregate (k = n/threshold + 1 counters,
      // map-side-merged) guarantees the candidate set contains every true
      // heavy hitter; an exact recount of candidates only + the threshold
      // filter makes the OUTPUT deterministic even though the sketch
      // internals are order-dependent. Oracle = plain GROUP BY/HAVING.
      val toks = s.read.parquet(p(d, "documents"))
        .select(explode(split(col("text"), " ")).as("token"))
      val thr = toks.count() / 30
      SketchOps.heavyHitters(toks, "token", thr).orderBy("token")
    }),
    "q162_harris" -> ((s, d) => {
      // Harris corner detection (round-6 image depth): integer Sobel on
      // floor-div BT.601 luma, 3×3 structure tensor, R = 16·det − trace²
      // (k = 1/16 integral), strict 3×3 NMS above 1e12. Exact per-image
      // corner counts + response sums; the oracle replays gradients,
      // tensors, response and NMS from the pixel dump.
      ImageOps.harrisCorners(s, synthImages(s, d), threshold = 1000000000000L)
        .orderBy("image_id")
    }),
    "q163_jl_project" -> ((s, d) => {
      // Johnson–Lindenstrauss ±1 projection (round-6 embedding depth):
      // 64→8 dims, seeded md5-derived sign matrix as literal metadata
      // (dumped for the oracle), fixed-order IEEE folds — zero shuffle.
      AnnOps.jlProject(s.read.parquet(p(d, "embeddings")), dim = 64, m = 8,
        seed = 7L).orderBy("vec_id", "j")
    }),
    "q164_dead_kernels" -> ((s, d) => {
      // O-31 point_inside + O-34 collinear — the reference's two DEAD
      // kernels, implemented and gated for 100% §2 coverage: point_inside
      // is a centroid passthrough (the Th_Fr rewrite), collinear ships
      // bug-for-bug (signed `cross < 1e-12`, col_ref) alongside the
      // intended abs() predicate (col_fix). See DeadKernelsExpr.
      import graft.expr.KernelFunctions._
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      ObjPipeline.withoutOpenings(ok)
        .select(col("surface_id"), dead_kernels(col("ext")).as("dk"))
        .select(col("surface_id"),
          (round(col("dk.pix"), 6) + lit(0.0)).as("pi_x"),
          (round(col("dk.piy"), 6) + lit(0.0)).as("pi_y"),
          (round(col("dk.piz"), 6) + lit(0.0)).as("pi_z"),
          col("dk.col_ref").as("col_ref"),
          col("dk.col_fix").as("col_fix"))
        .orderBy("surface_id")
    }),
    "q165_triangles" -> ((s, d) => {
      // exact per-vertex triangle counting (round-6 graph depth): the
      // compact-forward degree orientation over an md5-derived community
      // graph (8-node communities with 3 random in-community edges each +
      // 1 global edge — triangle-rich like a real similarity graph). The
      // oracle enumerates triangles with the naive ordered 3-join (same
      // set, blocking-independent) — the degree-orientation plan must
      // reproduce it exactly.
      val docs = s.read.parquet(p(d, "documents")).select("doc_id")
      val nodes = ObjPipeline.assignOrdinals(docs.select(col("doc_id"),
          lit("all").as("cls"),
          struct(col("doc_id").as("h"), col("doc_id").as("doc_id"))
            .as("first_seen")))
        .select(col("doc_id"), (col("ordinal") - 1).cast("long").as("ord"))
        .localCheckpoint()
      val n = nodes.count()
      def h(k: Column): Column =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("@tri"), k.cast("string"))), 1, 15), 16, 10).cast("long")
      val edges = nodes
        .select(col("ord"), col("doc_id"),
          explode(sequence(lit(0), lit(3))).as("k"))
        .select(col("ord").as("ea"),
          when(col("k") < 3,
            pmod(col("ord") - pmod(col("ord"), lit(8L))
              + pmod(h(col("k")), lit(8L)), lit(n)))
          .otherwise(pmod(h(col("k")), lit(n))).as("eb"))
      Clustering.triangleCounts(edges, "ea", "eb")
        .join(nodes, col("v") === col("ord"))
        .select(col("doc_id"), col("n_tri"))
        .orderBy("doc_id")
    }),
    "q166_jaccard_join" -> ((s, d) => {
      // EXACT word-set Jaccard similarity join (round-6): prefix-filtered
      // AllPairs/PPJoin — the guaranteed-complete counterpart to the
      // MinHash (q21) / SimHash (q22) probabilistic paths, integer
      // cross-multiplied threshold at 19/20. The oracle is blocking-
      // independent: the naive shared-token all-pairs join must yield the
      // same pair set — a prefix too short (missed pairs) or an ordinal
      // bug breaks row counts, not just hashes.
      TextOps.jaccardJoin(s.read.parquet(p(d, "documents")),
          simNum = 19L, simDen = 20L)
        .orderBy("doc_a", "doc_b")
    }),
    "q167_integral_image" -> ((s, d) => {
      // distributed integral image (summed-area table) over the stitched
      // mosaic + O(1) box-filter sums (round-6 image depth): one typed
      // decode pass builds per-tile local SATs; three slim band tables
      // (cumulative rows/cols/totals) close the cross-tile carry through
      // PrefixSum.runningSum; each of the 25 md5-derived query boxes
      // resolves as 4 signed SAT corner lookups. The oracle sums the RAW
      // dumped pixels inside each box directly — blocking-independent:
      // the SAT is proven by its defining property, not replayed.
      val side = mosaicSide(sfOf(d)); val W = side * 16
      def hm(tag: String, m: Long): Column =
        pmod(conv(substring(md5(concat(col("id").cast("string"),
          lit(tag))), 1, 15), 16, 10).cast("long"), lit(m))
      val boxes = s.range(0, 25).select(col("id").as("box_id"),
          hm("#bx0", W.toLong).as("x0"), hm("#by0", W.toLong).as("y0"),
          hm("#bxw", 31L).as("bw"), hm("#byh", 31L).as("bh"))
        .select(col("box_id"), col("x0"), col("y0"),
          least(col("x0") + col("bw"), lit((W - 1).toLong)).as("x1"),
          least(col("y0") + col("bh"), lit((W - 1).toLong)).as("y1"))
      ImageOps.integralBoxSums(s, Synth.mosaicTiles(s, side), boxes)
        .join(boxes, Seq("box_id"))
        .select(col("box_id"), col("x0"), col("y0"), col("x1"),
          col("y1"), col("box_sum"))
        .orderBy("box_id")
    }),
    "q168_kcore" -> ((s, d) => {
      // k-core decomposition (round-6 graph depth): iterative peel to
      // fixpoint over an md5 community graph with HETEROGENEOUS density
      // (communities get 2/3/4 in-community edges by community index, so
      // k=4 peels six rounds deep and still leaves survivors — both
      // halves of the semantics exercised). The oracle replays 8
      // MATERIALIZED peel rounds (fixpoint at 6 on this corpus; peeling
      // is monotone, extra rounds are no-ops).
      val docs = s.read.parquet(p(d, "documents")).select("doc_id")
      val nodes = ObjPipeline.assignOrdinals(docs.select(col("doc_id"),
          lit("all").as("cls"),
          struct(col("doc_id").as("h"), col("doc_id").as("doc_id"))
            .as("first_seen")))
        .select(col("doc_id"), (col("ordinal") - 1).cast("long").as("ord"))
        .localCheckpoint()
      val n = nodes.count()
      def h(k: Column): Column =
        conv(substring(md5(concat(col("doc_id").cast("string"),
          lit("@kc"), k.cast("string"))), 1, 15), 16, 10).cast("long")
      val edges = nodes
        .select(col("ord"), col("doc_id"),
          explode(sequence(lit(0), lit(4))).as("k"))
        .select(col("ord").as("ea"),
          when(col("k") < lit(2L) + pmod(expr("ord div 8"), lit(3L)),
            pmod(col("ord") - pmod(col("ord"), lit(8L))
              + pmod(h(col("k")), lit(8L)), lit(n)))
          .when(col("k") === 4, pmod(h(col("k")), lit(n)))
          .otherwise(lit(null)).as("eb"))
        .where(col("eb").isNotNull)
      Clustering.kCore(edges, k = 4, aCol = "ea", bCol = "eb")
        .join(nodes, col("v") === col("ord"))
        .select(col("doc_id"), col("deg"))
        .orderBy("doc_id")
    }),
    "q169_stream_outer_join" -> ((s, d) => {
      // LEFT OUTER stream-stream interval join under the gate (round-6
      // streaming depth): a view with no click in its 120-min horizon
      // emits null-padded — but only once the WATERMARK proves no match
      // can arrive. Replay protocol: the events file is batch 1; a
      // far-future sentinel pair (user −1, both sides) is a SECOND file
      // (maxFilesPerTrigger=1 + later mod time), so its batch advances
      // the watermark past every real horizon and the trailing no-data
      // batch flushes all outer state. Result ≡ the relational LEFT
      // JOIN, sentinel self-match filtered by key.
      import org.apache.spark.sql.streaming.Trigger
      val ev = s.read.parquet(p(d, "events"))
      val tmp = java.nio.file.Files
        .createTempDirectory("graft_q169").toString
      ev.coalesce(1).write.mode("overwrite").parquet(s"$tmp/in")
      Thread.sleep(1000) // sentinel file must carry a LATER mod time
      val sent = ev.agg(max("ts").as("m"))
        .select(explode(array(lit("view"), lit("click")))
          .as("event_type"),
          (col("m") + expr("INTERVAL 30 DAYS")).as("ts"))
        .withColumn("event_id",
          when(col("event_type") === "view", -2L).otherwise(-1L))
        .withColumn("user_id", lit(-1L))
      val rest = ev.columns
        .filterNot(Set("event_id", "user_id", "event_type", "ts"))
      rest.foldLeft(sent)((df, c) =>
          df.withColumn(c, lit(null).cast(ev.schema(c).dataType)))
        .select(ev.columns.map(col): _*)
        .coalesce(1).write.mode("append").parquet(s"$tmp/in")
      def side(t: String) = s.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(s"$tmp/in").where(col("event_type") === t)
        .withColumn("ts", col("ts").cast("timestamp"))
      val qn = "q169_outer_sink"
      s.catalog.dropTempView(qn)
      val q = graft.streaming.StreamingIngest
        .intervalJoinOuter(side("view"), side("click"),
          horizonMinutes = 120)
        .writeStream.format("memory").queryName(qn)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      // unmatched → −1, not NULL (the q126 canon convention: a nullable
      // long column hashes as NaN/None inconsistently across engines)
      s.table(qn).where(col("user_id") >= 0L)
        .select(col("user_id"), col("view_id"),
          coalesce(col("click_id"), lit(-1L)).as("click_id"))
        .orderBy("view_id", "click_id")
    }),
    "q172_grouped_ols" -> ((s, d) => {
      // exact per-group OLS trend (round-6 analytics depth): slope of
      // event value over event time per event_type — micro-unit y,
      // min-centered epoch-µs x, DECIMAL(38,0)/HUGEINT exact sums, one
      // IEEE division per group. The oracle replays the identical
      // 128-bit integer forms.
      val ev = s.read.parquet(p(d, "events")).select(col("event_type"),
        unix_micros(col("ts").cast("timestamp")).as("xus"),
        round(col("value") * 1000000.0, 0).cast("long").as("yu"))
      MlOps.groupedOls(ev, "event_type", "xus", "yu")
        .orderBy("event_type")
    }),
    "q171_rrf_fusion" -> ((s, d) => {
      // reciprocal-rank fusion (round-6 retrieval depth): two BM25
      // rankers over distinct query-term sets fused by integer
      // micro-unit 10^9 div (60 + rank) contributions — multi-query
      // expansion fusion, the pipeline between per-query retrieval and
      // a re-ranker. Each ranker ships its top-100 only; the fusion is
      // union + one map-side-combined sum + TakeOrdered.
      val docs = s.read.parquet(p(d, "documents"))
      val a = TextOps.bm25TopK(docs, bm25Terms, k = 100)
        .select("doc_id", "rank")
      val b = TextOps.bm25TopK(docs, rrfTermsB, k = 100)
        .select("doc_id", "rank")
      TextOps.rrfFuse(Seq(a, b), k0 = 60L, k = 20)
        .orderBy(col("rrf_u").desc, col("doc_id"))
    }),
    "q170_hough_lines" -> ((s, d) => {
      // Hough line detection over the stitched mosaic (round-6 image
      // depth): integer Sobel edge pixels vote into a 12-angle (θ, ρ)
      // accumulator (cos/sin as 2^10-scaled integer literals, ρ floor
      // exact — power-of-two divisor); top-25 cells under a total order.
      // The mosaic's 4-px block structure makes grid lines the expected
      // winners. The oracle recomputes edges from the pixel dump with
      // the q162 list-lookup Sobel and embeds the SAME angle integers.
      ImageOps.houghLines(s, Synth.mosaicTiles(s, mosaicSide(sfOf(d))),
          gradThr = 60L, nTheta = 12, k = 25)
        .orderBy(col("votes").desc, col("k"), col("rho"))
    }),
    "q160_bloom_skip" -> ((s, d) => {
      // per-file BLOOM skipping (round-6 lakehouse depth): point lookups
      // on a key UNCORRELATED with the file layout (hash-partitioned —
      // min/max stats span everything) still open ~1 file via 256-bit
      // per-file blooms over the cross-engine md5 hash family. The oracle
      // replays the skipping decision per probe from the dumped file→rows
      // assignment (membership join, no bit arithmetic) plus the row
      // counts from documents; false positives replay exactly too.
      import graft.sources.StatsManifest
      val dir = fixtureDir(s, "graft_q160_data")
      val docs = s.read.parquet(p(d, "documents"))
      StatsManifest.write(docs.repartition(8, col("doc_id")), dir,
        Seq("doc_id"))
      StatsManifest.writeBloom(s, dir, "doc_id", bits = 256, k = 3)
      val probes = Seq(3L, 97L, 250L, 444L, 987654L)
      val rows = probes.map { pk =>
        val (df, opened, total) = StatsManifest.bloomPrunedRead(
          s, dir, "doc_id", pk.toString, bits = 256, k = 3)
        (pk, df.count(), opened, total)
      }
      import s.implicits._
      rows.toDF("probe_key", "n_rows", "files_opened", "files_total")
        .orderBy("probe_key")
    }),
    "q159_douglas_peucker" -> ((s, d) => {
      // depth-capped Douglas-Peucker track simplification (round-6): 8
      // breadth-first split rounds at tol=48, exact integer cross²-vs-
      // tol²·len² deviation tests, smallest-seq tiebreaks; kept points
      // tagged with their split round. The oracle replays every round as
      // a CTE pair over the track dump.
      TrajectoryOps.douglasPeucker(
        synthTracks(s, math.max(16L, (20000 * sfOf(d)).toLong), 200L),
        tol = 48L, levels = 8)
        .orderBy("walker_id", "seq")
    }),
    "q158_mf_gd" -> ((s, d) => {
      // distributed matrix-factorization GD (round-6): rank-2 factor
      // TABLES (data-sized, never on the driver) updated by one
      // ratings⋈U⋈V error pass + two map-side-combined groupBys per
      // iteration, exact integer micro-unit math throughout. Output =
      // per-item final factors + exact Σ|e| reconstruction error. The
      // oracle replays all three GD iterations as a relational CTE chain
      // over the dumped ratings/init tables.
      val r = synthRatings(s, mfUsers(sfOf(d)), mfItems(sfOf(d)))
      val (u, v) = MlOps.mfTrain(r, rank = 2, iters = 3, lr = 2L,
        seed = 77L)
      MlOps.mfItemSummary(r, u, v).orderBy("item_id")
    }),
    "q157_ssim" -> ((s, d) => {
      // SSIM verification of the q51 near-dup pairs (round-6): exact
      // integer factor forms over BT.601 floor-div luma, C1/C2 scaled to
      // integers by 10^4 (cancels), one IEEE division; pairs and luma both
      // replayed by the oracle from the pixel dumps.
      val imgs = synthImages(s, d)
      val all = imgs.select("image_id", "bytes", "w", "h", "fmt")
        .unionByName(ImageOps.perturbedDups(s, imgs))
      val prs = ImageOps.dhashNearDups(s, all, maxHamming = 3)
      ImageOps.ssimPairs(s, all, prs).orderBy("img_a", "img_b")
    }),
    "q156_hausdorff" -> ((s, d) => {
      // symmetric trajectory Hausdorff (round-6 engine depth): AABB-gap
      // candidate pairs (cell-cover blocked, exact gap decided), per-pair
      // max-of-min squared distances in exact integer math over the
      // every-4th-point downsample, 50 closest pairs. The oracle replays
      // the candidate screen and both Hausdorff directions all-pairs from
      // the track dump — blocking-independent (q129 rule).
      TrajectoryOps.hausdorffPairs(
        synthTracks(s, math.max(16L, (20000 * sfOf(d)).toLong), 200L),
        sampleEvery = 4L, maxGap = 300L, cellSize = 1024L, k = 50)
    }),
    "q155_tfidf_pairs" -> ((s, d) => {
      // exact sparse TF-IDF cosine top-k pairs (round-6 engine depth): the
      // posting-list join compares docs only through shared tokens; idf is
      // integer milli-nats (one rounded ln — the q139 rule), dots/norms
      // exact integer sums, one IEEE division+sqrt ranked unrounded. The
      // oracle replays tf, the df cap, idf quantization, the posting join
      // and the top-25 ranking over the documents table.
      TextOps.tfidfCosinePairs(s.read.parquet(p(d, "documents")), k = 25)
        .orderBy("doc_a", "doc_b")
    }),
    "q154_dbscan" -> ((s, d) => {
      // distributed DBSCAN (round-6 engine depth): one cell-grid equi-join
      // at cell side = eps produces every eps-pair (exact integer squared
      // distances), core = neighbor count ≥ minPts, clusters = q62's
      // pointer-jumping components over the core-core graph, borders take
      // the MIN core-neighbor cluster (the deterministic refinement of the
      // classic scan-order assignment). The oracle replays DBSCAN from the
      // dumped points: all-pairs neighbors + a recursive-CTE closure.
      Dbscan.dbscan(synthClusterPoints(s, dbscanN(sfOf(d))),
        eps = 25L, minPts = 4).orderBy("point_id")
    }),
    "q153_linear_probe" -> ((s, d) => {
      // learned SEMANTIC features (round-5 "What's missing #2" / next-round
      // item #7): one-vs-rest linear probes over the global HOG orientation
      // histogram, trained by the GROUPED integer-GD machinery (one
      // broadcast join + one groupBy(class) aggregate per iteration for ALL
      // classes) on a striped fixture whose class is linearly recoverable
      // from gradient orientations. The per-class hard-sigmoid scores ARE
      // the learned 3-dim embedding (LinearProbeSpec: its 1-NN preserves
      // the raw 8-dim neighborhood label structure at 3/8 the width); the
      // oracle replays centering, the crossed frame, every GD iteration
      // (weights as a per-class CTE relation), scoring, argmax, and the
      // correctness flag — bit for bit.
      val feats = probeFeats(s).localCheckpoint()
      val rs = (1 to 8).map(b => s"r$b")
      val mu = MlOps.integerMeans(feats, rs)
      val xs = (1 to 8).map(b => s"x$b")
      val feat = feats.select(col("img_no") +: col("label") +:
        rs.zip(xs).zipWithIndex.map { case ((r, x), i) =>
          (col(r) - lit(mu(i))).as(x) }: _*)
      val crossed = feat
        .withColumn("cls", explode(array(lit(0L), lit(1L), lit(2L))))
        .withColumn("y", when(col("label") === col("cls"), 1L).otherwise(0L))
      val models = MlOps.trainLinearProbes(crossed, "cls", "y", xs,
        iters = 6, lr = 2L)
      val scored = feat.select(Seq(col("img_no"), col("label")) ++
        (0L to 2L).map(c => MlOps.scoreU(models(c), xs).as(s"s$c")): _*)
      scored
        .withColumn("pred", expr("CAST(CASE WHEN s0 >= s1 AND s0 >= s2 " +
          "THEN 0 WHEN s1 >= s2 THEN 1 ELSE 2 END AS BIGINT)"))
        .withColumn("correct",
          expr("CAST(CASE WHEN pred = label THEN 1 ELSE 0 END AS BIGINT)"))
        .orderBy("img_no")
    }),
    "q35_attr_stats" -> ((s, d) => {
      // O-45 attribute range stats — computed over XML-INGESTED surfaces
      // (render → StAX parse round trip), so a green row proves the per-
      // polygon attribute extraction (CityGML2OBJs.py:739-747) end to end:
      // the oracle recomputes from the original surfaces dump alone
      val surf = synthSurfaces(s, d)
      val (okx, _) = graft.sources.GmlXml.ingest(graft.sources.GmlXml.render(surf))
      okx
        .select(col("surface_class"), element_at(col("attrs"), "irradiation").as("irr"))
        .where(col("irr").isNotNull)
        .groupBy("surface_class")
        .agg(count(lit(1)).as("n"),
          round(min(col("irr")), 4).as("min_irr"),
          round(max(col("irr")), 4).as("max_irr"))
        .orderBy("surface_class")
    }),
    "q46_poly_kernels" -> ((s, d) => {
      // O-17/O-19/O-23/O-27/O-28 scalar kernels under the gate (KernelExprs):
      // Newell normal, projected 2D area, and first-corner edge dot/cross per
      // valid thematic surface, plus triangle orientation agreement — the
      // oracle recomputes the alignment of every DUMPED triangle in SQL, so
      // EarClip's reverse_vertices repair is checked against independent
      // math, not against itself. `round(x,6) + 0` normalizes -0.0 (Spark's
      // BigDecimal round drops the sign of zero; DuckDB's C round keeps it).
      import graft.expr.KernelFunctions._
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val th = ObjPipeline.withoutOpenings(ok)
      th.select(col("surface_id"),
          poly_normal(col("ext")).as("nn"),
          round(area_2d(col("ext")), 6).as("area2d"),
          edge_kernel(col("ext")).as("ek"),
          tri_align(col("ext"), col("holes")).as("ta"))
        .select(col("surface_id"),
          (round(col("nn.x"), 6) + lit(0.0)).as("nnx"),
          (round(col("nn.y"), 6) + lit(0.0)).as("nny"),
          (round(col("nn.z"), 6) + lit(0.0)).as("nnz"),
          col("area2d"),
          col("ek.dot").as("edge_dot"), col("ek.cx").as("edge_cx"),
          col("ek.cy").as("edge_cy"), col("ek.cz").as("edge_cz"),
          col("ta.n_tris").as("n_tris"), col("ta.n_aligned").as("n_aligned"))
        .orderBy("surface_id")
    }),
    "q47_plane_fit" -> ((s, d) => {
      // O-24/O-25/O-26: 3-point plane, plane solved for z/y at the ring
      // centroid (null when the plane is parallel to the axis — pc/pb = 0),
      // and the PCA fit gated by its max point-to-plane residual (0 at 6dp
      // for planar rings; a wrong eigenvector breaks the hash).
      import graft.expr.KernelFunctions._
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val th = ObjPipeline.withoutOpenings(ok)
      th.select(col("surface_id"), plane_probe(col("ext")).as("pp"),
          round(pca_resid(col("ext")), 6).as("pca_resid"))
        .select(col("surface_id"),
          col("pp.pa").as("pa"), col("pp.pb").as("pb"),
          col("pp.pc").as("pc"), col("pp.pd").as("pd"),
          (round(col("pp.h_at_c"), 6) + lit(0.0)).as("h_at_c"),
          (round(col("pp.y_at_c"), 6) + lit(0.0)).as("y_at_c"),
          col("pca_resid"))
        .orderBy("surface_id")
    }),
    "q48_building_extremes" -> ((s, d) => {
      // O-30/O-32/O-33: lexicographic smallest/highest point over every
      // exterior ring point of a building (the kernels' iterator contract is
      // order-independent: strict lexLt means ties are identical coords),
      // plus the area-weighted centroid of the south roof slab (poly_ord 6).
      import s.implicits._
      import graft.expr.KernelFunctions._
      val (ok, _) = ObjPipeline.validated(synthSurfaces(s, d))
      val th = ObjPipeline.withoutOpenings(ok)
      val extremes = th.select(col("building_id"), explode(col("ext")).as("p"))
        .select(col("building_id"), col("p.x"), col("p.y"), col("p.z"))
        .as[(String, Double, Double, Double)]
        .groupByKey(_._1).mapGroups { (b, it) =>
          val pts = it.map(t => graft.geom.Vec3(t._2, t._3, t._4)).toArray
          val lo = graft.geom.Geom.smallestPoint(pts.iterator)
          val hi = graft.geom.Geom.highestPoint(pts.iterator)
          (b, lo.x, lo.y, lo.z, hi.x, hi.y, hi.z)
        }.toDF("building_id", "sx", "sy", "sz", "hx", "hy", "hz")
      val wc = th.where(col("poly_ord") === 6)
        .select(col("building_id"), weighted_centroid(col("ext")).as("wc"))
        .select(col("building_id"),
          (round(col("wc.x"), 6) + lit(0.0)).as("wcx"),
          (round(col("wc.y"), 6) + lit(0.0)).as("wcy"),
          (round(col("wc.z"), 6) + lit(0.0)).as("wcz"))
      extremes.join(wc, Seq("building_id")).orderBy("building_id")
    }),
    "q49_translate_min" -> ((s, d) => {
      // O-42 global-min translation of the OBJ vertex dictionary: the
      // lexicographic-min vertex moves to the origin; per-class translated
      // extents + dictionary sizes are recomputed by the oracle from ring
      // points alone (exact double subtraction — no rounding needed).
      val (v, _, _) = ObjPipeline.run(s, synthSurfaces(s, d), semantics = true)
      ObjPipeline.translateToMin(v).groupBy("cls").agg(
        count(lit(1)).as("n_vertices"),
        min(col("x")).as("min_x"), min(col("y")).as("min_y"),
        min(col("z")).as("min_z"),
        max(col("x")).as("max_x"), max(col("y")).as("max_y"),
        max(col("z")).as("max_z"))
        .orderBy("cls")
    })
  )

  // shorthand for the oracle-side input dumps + SQL fragment generators
  private val O = OracleSql

  /** q76 query terms — one definition drives both the Spark query and the
    * oracle SQL generator so they can never drift.
    */
  private val bm25Terms = Seq("spark", "vector", "merge")

  /** q162 oracle: Harris corners replayed from the pixel dump — Sobel
    * gradients as direct px-list lookups (one image = one row, the
    * dhashBoxSum convention), structure tensors via a 3×3 self-join of
    * the gradient CTE, R = 16·det − trace², strict NMS as NOT EXISTS,
    * per-image exact aggregates. Margins match the engine: gradients
    * [1,14], tensors [2,13], verdicts [3,12] on the 16×16 corpus.
    */
  /** q170 oracle: same interior Sobel (list lookups into the tile's own
    * px — all 9 taps in-tile), same 2^10 angle integers (embedded from
    * ImageOps.houghAngles, the single source of truth), same exact
    * power-of-two ρ floor, same total order.
    */
  private def houghOracleSql: String = {
    def lum(x: String, y: String): String =
      s"((299*px[(($y)*16+($x))*3+1] + 587*px[(($y)*16+($x))*3+2]" +
        s" + 114*px[(($y)*16+($x))*3+3]) // 1000)"
    val vals = ImageOps.houghAngles(12)
      .map { case (i, c, s) => s"($i, $c, $s)" }.mkString(", ")
    s"""WITH pos AS (SELECT tile_x, tile_y, px, xx.x AS x, yy.y AS y
                     FROM ${O.inp("mosaic_pixels")},
                          range(1,15) AS xx(x), range(1,15) AS yy(y)),
        g AS (SELECT tile_x*16 + x AS wx, tile_y*16 + y AS wy,
                (${lum("x+1", "y-1")} + 2*${lum("x+1", "y")}
                 + ${lum("x+1", "y+1")} - ${lum("x-1", "y-1")}
                 - 2*${lum("x-1", "y")} - ${lum("x-1", "y+1")}) AS gx,
                (${lum("x-1", "y+1")} + 2*${lum("x", "y+1")}
                 + ${lum("x+1", "y+1")} - ${lum("x-1", "y-1")}
                 - 2*${lum("x", "y-1")} - ${lum("x+1", "y-1")}) AS gy
              FROM pos),
        e AS (SELECT wx, wy FROM g WHERE gx*gx + gy*gy > 3600),
        a AS (SELECT * FROM (VALUES $vals) AS t(k, c, s)),
        v AS (SELECT a.k,
                CAST(floor((e.wx*a.c + e.wy*a.s) / 1024.0) AS BIGINT) AS rho,
                COUNT(*) AS votes
              FROM e CROSS JOIN a GROUP BY 1, 2)
        SELECT CAST(k AS INT) AS k, rho, CAST(votes AS BIGINT) AS votes
        FROM v ORDER BY votes DESC, k, rho LIMIT 25"""
  }

  private def harrisOracleSql: String = {
    def lum(x: String, y: String): String =
      s"((299*px[(($y)*16+($x))*3+1] + 587*px[(($y)*16+($x))*3+2]" +
        s" + 114*px[(($y)*16+($x))*3+3]) // 1000)"
    s"""WITH pos AS (SELECT image_id, px, xx.x AS x, yy.y AS y
                     FROM ${O.inp("pixels")}, range(1,15) AS xx(x),
                          range(1,15) AS yy(y)),
        g AS (SELECT image_id, x, y,
                (${lum("x+1", "y-1")} + 2*${lum("x+1", "y")}
                 + ${lum("x+1", "y+1")} - ${lum("x-1", "y-1")}
                 - 2*${lum("x-1", "y")} - ${lum("x-1", "y+1")}) AS gx,
                (${lum("x-1", "y+1")} + 2*${lum("x", "y+1")}
                 + ${lum("x+1", "y+1")} - ${lum("x-1", "y-1")}
                 - 2*${lum("x", "y-1")} - ${lum("x+1", "y-1")}) AS gy
              FROM pos),
        st AS (SELECT g1.image_id, g1.x, g1.y,
                 CAST(SUM(g2.gx*g2.gx) AS BIGINT) AS sxx,
                 CAST(SUM(g2.gy*g2.gy) AS BIGINT) AS syy,
                 CAST(SUM(g2.gx*g2.gy) AS BIGINT) AS sxy
               FROM g g1 JOIN g g2 ON g2.image_id = g1.image_id
                 AND abs(g2.x-g1.x) <= 1 AND abs(g2.y-g1.y) <= 1
               WHERE g1.x BETWEEN 2 AND 13 AND g1.y BETWEEN 2 AND 13
               GROUP BY 1, 2, 3),
        r AS (SELECT image_id, x, y,
                16*(sxx*syy - sxy*sxy) - (sxx+syy)*(sxx+syy) AS rr
              FROM st),
        c AS (SELECT r1.image_id, r1.rr FROM r r1
              WHERE r1.x BETWEEN 3 AND 12 AND r1.y BETWEEN 3 AND 12
                AND r1.rr > 1000000000000
                AND NOT EXISTS (SELECT 1 FROM r r2
                      WHERE r2.image_id = r1.image_id
                        AND abs(r2.x-r1.x) <= 1 AND abs(r2.y-r1.y) <= 1
                        AND (r2.x <> r1.x OR r2.y <> r1.y)
                        AND r2.rr >= r1.rr))
        SELECT image_id, CAST(COUNT(*) AS BIGINT) AS n_corners,
               CAST(SUM(rr) AS BIGINT) AS sum_r
        FROM c GROUP BY image_id ORDER BY image_id"""
  }

  /** q159 oracle: the depth-capped Douglas-Peucker run replayed round by
    * round — per round one geometry/argmax CTE pair (ROW_NUMBER over
    * (lhs DESC, seq ASC) = the engine's max-struct tiebreak) and one
    * reassignment CTE; state CTEs are MATERIALIZED (each feeds two
    * successors — the q135 rule). Segments are keyed by (walker_id, s):
    * left children inherit the parent's s, right children start at the
    * split — s values stay unique among live segments.
    */
  private def dpOracleSql: String = {
    val levels = 8
    val tol2 = 48L * 48L
    val rounds = (1 to levels).map { i =>
      s"""g$i AS (SELECT p.walker_id, p.seq, p.x, p.y, p.s, p.e,
              sp.x AS sx, sp.y AS sy, ep.x AS ex, ep.y AS ey
            FROM p${i - 1} p
            JOIN pts sp ON sp.walker_id = p.walker_id AND sp.seq = p.s
            JOIN pts ep ON ep.walker_id = p.walker_id AND ep.seq = p.e),
          sc$i AS (SELECT *,
              CASE WHEN len2 = 0 THEN ap2 ELSE cross2 END AS lhs,
              CASE WHEN len2 = 0 THEN $tol2 ELSE $tol2 * len2 END AS rhs
            FROM (SELECT *,
                (ex-sx)*(ex-sx) + (ey-sy)*(ey-sy) AS len2,
                ((ex-sx)*(y-sy) - (ey-sy)*(x-sx))
                  * ((ex-sx)*(y-sy) - (ey-sy)*(x-sx)) AS cross2,
                (x-sx)*(x-sx) + (y-sy)*(y-sy) AS ap2
              FROM g$i) t),
          sp$i AS MATERIALIZED (SELECT walker_id, s, seq AS m,
              x AS mx, y AS my
            FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY walker_id, s
                    ORDER BY lhs DESC, seq ASC) AS rn FROM sc$i) t
            WHERE rn = 1 AND lhs > rhs),
          p$i AS MATERIALIZED (SELECT p.walker_id, p.seq, p.x, p.y,
              CASE WHEN p.seq > sp.m THEN sp.m ELSE p.s END AS s,
              CASE WHEN p.seq < sp.m THEN sp.m ELSE p.e END AS e
            FROM p${i - 1} p JOIN sp$i sp
              ON sp.walker_id = p.walker_id AND sp.s = p.s
            WHERE p.seq <> sp.m)"""
    }.mkString(",\n        ")
    s"""WITH pts AS MATERIALIZED (SELECT walker_id, seq, x, y
              FROM ${O.inp("tracks")}),
        ends AS (SELECT walker_id, MIN(seq) AS s, MAX(seq) AS e
                 FROM pts GROUP BY walker_id),
        p0 AS MATERIALIZED (SELECT p.walker_id, p.seq, p.x, p.y, en.s, en.e
              FROM pts p JOIN ends en USING (walker_id)
              WHERE p.seq > en.s AND p.seq < en.e),
        $rounds
        SELECT walker_id, seq, x, y, round_added FROM (
          SELECT p.walker_id, p.seq, p.x, p.y, 0 AS round_added
          FROM pts p JOIN ends en USING (walker_id)
          WHERE p.seq = en.s OR p.seq = en.e
          ${(1 to levels).map(i =>
            s"UNION ALL SELECT walker_id, m, mx, my, $i FROM sp$i")
            .mkString("\n          ")}
        ) ORDER BY walker_id, seq"""
  }

  /** q158 oracle: the full MF-GD training run replayed relationally —
    * each iteration is one error CTE (ratings⋈U⋈V) plus per-user and
    * per-item update CTEs; CTEs referenced by TWO successors are
    * MATERIALIZED (the q135 recursive-inlining blowup rule).
    */
  private def mfOracleSql: String = {
    val iters = 3
    val body = (1 to iters).map { i =>
      s"""e$i AS MATERIALIZED (
            SELECT r.user_id, r.item_id, u.f0 AS uf0, u.f1 AS uf1,
                   v.f0 AS vf0, v.f1 AS vf1,
                   r.rating - (u.f0*v.f0 + u.f1*v.f1) // 1000000 AS e
            FROM r JOIN u${i - 1} u USING (user_id)
                   JOIN v${i - 1} v USING (item_id)),
          u$i AS MATERIALIZED (
            SELECT user_id,
              MIN(uf0) + (2 * CAST(SUM((e*vf0)//1000000) AS BIGINT))
                // COUNT(*) AS f0,
              MIN(uf1) + (2 * CAST(SUM((e*vf1)//1000000) AS BIGINT))
                // COUNT(*) AS f1
            FROM e$i GROUP BY user_id),
          v$i AS MATERIALIZED (
            SELECT item_id,
              MIN(vf0) + (2 * CAST(SUM((e*uf0)//1000000) AS BIGINT))
                // COUNT(*) AS f0,
              MIN(vf1) + (2 * CAST(SUM((e*uf1)//1000000) AS BIGINT))
                // COUNT(*) AS f1
            FROM e$i GROUP BY item_id)"""
    }.mkString(",\n          ")
    s"""WITH r AS (SELECT user_id, item_id, rating
                   FROM ${O.inp("mf_ratings")}),
        u0 AS (SELECT * FROM ${O.inp("mf_u0")}),
        v0 AS (SELECT * FROM ${O.inp("mf_v0")}),
        $body,
        ef AS (SELECT r.item_id, v.f0, v.f1,
                 r.rating - (u.f0*v.f0 + u.f1*v.f1) // 1000000 AS e
               FROM r JOIN u$iters u USING (user_id)
                      JOIN v$iters v USING (item_id))
        SELECT item_id, f0, f1, CAST(SUM(ABS(e)) AS BIGINT) AS abs_err,
               COUNT(*) AS n_ratings
        FROM ef GROUP BY item_id, f0, f1 ORDER BY item_id"""
  }

  /** BM25 score + rank CTE chain for `terms`, CTE names suffixed `sfx`
    * (assumes CTE `t(doc_id, tk)` in scope) — mirrors bm25TopK op-for-op
    * with k1=1.2, b=0.75: Lucene +1 idf with rounded ln, tf as a list
    * filter, left-assoc contribution chain. Shared by q76 and q171.
    */
  private def bm25RankCtes(terms: Seq[String], sfx: String): String = {
    val dfs = terms.indices.map(i =>
      s"CAST(SUM(CASE WHEN list_contains(tk, '${terms(i)}') THEN 1 ELSE 0 END) AS BIGINT) AS df$i")
      .mkString(", ")
    val contrib = terms.zipWithIndex.map { case (t, i) =>
      s"""(round(ln(1.0 + (s$sfx.n - s$sfx.df$i + 0.5) / (s$sfx.df$i + 0.5)), 6)
         |  * ((len(list_filter(tk, x -> x = '$t'))::DOUBLE * 2.2)
         |     / (len(list_filter(tk, x -> x = '$t'))::DOUBLE
         |        + 1.2 * (0.25 + (0.75 * len(tk)::DOUBLE)
         |                 / (s$sfx.sumdl::DOUBLE / s$sfx.n::DOUBLE)))))""".stripMargin
    }.mkString(" + ")
    s"""s$sfx AS (SELECT COUNT(*)::BIGINT AS n, CAST(SUM(len(tk)) AS BIGINT) AS sumdl,
       |        $dfs FROM t),
       | sc$sfx AS (SELECT doc_id, round($contrib, 6) + 0.0 AS score FROM t, s$sfx),
       | rk$sfx AS (SELECT doc_id, score,
       |          ROW_NUMBER() OVER (ORDER BY score DESC, doc_id ASC) AS rank
       |        FROM sc$sfx)""".stripMargin
  }

  private def bm25OracleSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       | ${bm25RankCtes(bm25Terms, "")}
       | SELECT doc_id, score, rank FROM rk WHERE rank <= 10 ORDER BY doc_id""".stripMargin

  /** q171 second query's terms — distinct lexical angle for the fusion. */
  private val rrfTermsB = Seq("scan", "batch", "window")

  /** q171 oracle: both BM25 rank chains (the SHARED generator — q76's
    * oracle and this one cannot drift apart), integer micro-unit RRF
    * contributions (10⁹ // (60 + rank), positive operands ⇒ DuckDB //
    * ≡ Spark div), fused top-20 under the same total order.
    */
  private def rrfOracleSql: String =
    s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
       | ${bm25RankCtes(bm25Terms, "A")},
       | ${bm25RankCtes(rrfTermsB, "B")},
       | u AS (SELECT doc_id, 1000000000 // (60 + rank) AS contrib
       |       FROM rkA WHERE rank <= 100
       |       UNION ALL
       |       SELECT doc_id, 1000000000 // (60 + rank)
       |       FROM rkB WHERE rank <= 100),
       | f AS (SELECT doc_id, CAST(SUM(contrib) AS BIGINT) AS rrf_u,
       |         CAST(COUNT(*) AS BIGINT) AS n_rankers
       |       FROM u GROUP BY doc_id)
       | SELECT doc_id, rrf_u, n_rankers FROM f
       | ORDER BY rrf_u DESC, doc_id LIMIT 20""".stripMargin

  /** q73 probe tokens — driver-known literals on BOTH sides (the engine's
    * cmsEstimate indices and the oracle's cell joins are generated from
    * the same `SketchOps.cmsPos`).
    */
  private val q73Probes = Seq("scan", "batch", "window", "spark", "zzz_absent")

  /** Machine-generated q73 oracle (like the Morton `spread` SQL): every
    * CMS counter as a (row, position) group-by count, probe estimates as
    * LEAST over the 4 literal-position cells, checksum = Σ counters.
    */
  private def q73Oracle: String = {
    val probes = q73Probes
    val exact = probes.map(t =>
      s"CAST(SUM(CASE WHEN tok = '$t' THEN 1 ELSE 0 END) AS BIGINT) AS exact_$t")
      .mkString(", ")
    val estJoins = (for {
      (t, ti) <- probes.zipWithIndex; j <- 0 until SketchOps.CmsD
    } yield s"LEFT JOIN cells c${ti}_$j ON c${ti}_$j.source = cnt.source " +
      s"AND c${ti}_$j.j = $j AND c${ti}_$j.p = ${SketchOps.cmsPos(t, j)}")
      .mkString(" ")
    val estCols = probes.zipWithIndex.map { case (t, ti) =>
      s"LEAST(${(0 until SketchOps.CmsD)
        .map(j => s"COALESCE(c${ti}_$j.c, 0)").mkString(", ")}) AS est_$t"
    }.mkString(", ")
    val exactRefs = probes.map(t => s"cnt.exact_$t").mkString(", ")
    s"""WITH tok AS (SELECT source, unnest(string_split(text, ' ')) AS tok
              FROM documents),
       cnt AS (SELECT source, COUNT(*) AS n_tokens, $exact
               FROM tok GROUP BY source),
       cells AS (SELECT source, j,
                   ${O.md5n("tok || '#' || j::VARCHAR")} % ${SketchOps.CmsW} AS p,
                   CAST(COUNT(*) AS BIGINT) AS c
                 FROM tok, range(0, ${SketchOps.CmsD}) r(j) GROUP BY 1, 2, 3),
       chk AS (SELECT source, CAST(SUM(c) AS BIGINT) AS cms_checksum
               FROM cells GROUP BY source)
       SELECT cnt.source, cnt.n_tokens, chk.cms_checksum, $estCols, $exactRefs
       FROM cnt JOIN chk ON chk.source = cnt.source $estJoins
       ORDER BY cnt.source"""
  }
  private val StructuralClasses =
    "('GroundSurface','WallSurface','RoofSurface','ClosureSurface','CeilingSurface')"

  /** Shared CTE prefix: clean → validate → opening anti-join, the oracle
    * replay of ObjPipeline.validated + withoutOpenings. Ends with CTE `th`
    * (valid thematic surfaces: building_id, surface_id, surface_class,
    * cleaned ring `c`, cleaned holes `hs`, normal cols nx/ny/nz).
    */
  private def thematicCte: String =
    s"""s0 AS (SELECT building_id, surface_id, surface_class, building_ord,
                 poly_ord, ${O.clean("ext")} AS c,
                 list_transform(holes, h -> ${O.clean("h")}) AS hs
               FROM ${O.inp("surfaces")}),
        s1 AS (SELECT *, ${O.normalCols("c")} FROM s0),
        sv AS (SELECT * FROM s1 WHERE ${O.isValid("c")}),
        op AS (SELECT DISTINCT c AS oc FROM sv WHERE surface_class IN ('Window','Door')),
        th AS (SELECT sv.* FROM sv LEFT JOIN op ON sv.c = op.oc
               WHERE op.oc IS NULL AND sv.surface_class NOT IN ('Window','Door'))"""

  /** Euler triangle count of one thematic surface (EarClip contract):
    * T = n_ext_open + Σ n_hole_open − 2 + 2·n_qualifying_holes.
    */
  private def eulerT: String =
    s"""(len(${O.open("c")})
         + COALESCE(list_aggregate(list_transform(hs,
             h -> CASE WHEN len(${O.open("h")}) >= 3
                       THEN len(${O.open("h")}) ELSE 0 END), 'sum'), 0)
         - 2
         + 2 * len(list_filter(hs, h -> len(${O.open("h")}) >= 3)))"""

  /** Exact 3D triangle area |cross(b−a, c−a)|/2 over struct(x,y,z) columns. */
  private def triAreaSql(a: String, b: String, c: String): String =
    s"""(sqrt(pow(($b.y-$a.y)*($c.z-$a.z)-($b.z-$a.z)*($c.y-$a.y),2)
            + pow(($b.z-$a.z)*($c.x-$a.x)-($b.x-$a.x)*($c.z-$a.z),2)
            + pow(($b.x-$a.x)*($c.y-$a.y)-($b.y-$a.y)*($c.x-$a.x),2)) / 2.0)"""

  /** Geom.weightedCentroid's fan fold over the OPENED ring column `c`,
    * operation-for-operation: per fan triangle (a=b[1], b[i], b[i+1]),
    * weight = |cross(b−a, c−a)|/2 (norm's x*x+y*y+z*z association), centroid
    * component = (a+b+c)/3, accumulated left-to-right, final value
    * acc · (1.0/wsum) — the RECIPROCAL multiply the Scala uses, not a
    * divide. Emits "… AS wcx, … AS wcy, … AS wcz".
    */
  private def wcCols: String = {
    val b = O.open("c")
    def d(pt: String, f: String) = s"(($b)[$pt].$f - ($b)[1].$f)"
    val (bi, ci) = ("wc_i", "wc_i+1")
    val crx = s"(${d(bi, "y")} * ${d(ci, "z")} - ${d(bi, "z")} * ${d(ci, "y")})"
    val cry = s"(${d(bi, "z")} * ${d(ci, "x")} - ${d(bi, "x")} * ${d(ci, "z")})"
    val crz = s"(${d(bi, "x")} * ${d(ci, "y")} - ${d(bi, "y")} * ${d(ci, "x")})"
    val w = s"(sqrt($crx*$crx + $cry*$cry + $crz*$crz) / 2.0)"
    def fold(term: String) =
      s"""list_reduce(list_transform(range(2, len($b)), wc_i -> $term),
          (wc_a, wc_v) -> wc_a + wc_v)"""
    def tc(f: String) =
      s"((($b)[1].$f + ($b)[wc_i].$f + ($b)[wc_i+1].$f) / 3)"
    val wsum = fold(w)
    // + 0.0 normalizes -0.0, matching the engine side (Spark's BigDecimal
    // round drops the sign of zero; DuckDB's C round keeps it)
    Seq("x" -> "wcx", "y" -> "wcy", "z" -> "wcz").map { case (f, alias) =>
      s"round(${fold(s"${tc(f)} * $w")} * (1.0 / $wsum), 6) + 0.0 AS $alias"
    }.mkString(", ")
  }

  /** Per-class (incl. 'All') vertex dictionary CTEs `ex`, `pv`, `vd` over
    * `th`: every distinct ring point of a class's surfaces (ear clipping
    * emits every ring vertex in ≥ 1 triangle, so the triangle-corner
    * dictionary equals the ring-point set).
    */
  private def vertexDictCte: String =
    s"""ex AS (SELECT unnest(['All', surface_class]) AS cls, * FROM th),
        pv AS (SELECT cls, unnest(list_concat(${O.open("c")},
                 flatten(list_transform(list_filter(hs, h -> len(${O.open("h")}) >= 3),
                   h -> ${O.open("h")})))) AS p FROM ex),
        vd AS (SELECT DISTINCT cls, p.x AS x, p.y AS y, p.z AS z FROM pv)"""

  /** Oracles for the geometry/engine family — recomputed in DuckDB from the
    * Verify input dumps (see OracleSql). Kept separate so the map below
    * stays readable.
    */
  private def geomOracles: Map[String, String] = Map(
    "q19_obj_encode" ->
      s"""WITH $thematicCte, $vertexDictCte,
          vs AS (SELECT cls, COUNT(*) AS n_vertices,
                   CAST(SUM(CAST(x + y + z AS DECIMAL(28,6))) AS DOUBLE) AS coord_checksum
                 FROM vd GROUP BY cls),
          fs AS (SELECT cls, CAST(SUM($eulerT) AS BIGINT) AS n_faces
                 FROM ex GROUP BY cls)
          SELECT vs.cls, n_vertices, coord_checksum, n_faces
          FROM vs JOIN fs USING (cls) ORDER BY cls""",
    "q25_translate" ->
      s"""WITH prm AS (SELECT -floor(AVG(lower_corner.b)) AS dx,
                              -floor(AVG(lower_corner.a)) AS dy
                       FROM ${O.inp("envelopes")})
          SELECT surface_id, len(ext) AS n_pts,
            round(list_aggregate(list_transform(ext,
              p -> (p.x + prm.dx) + (p.y + prm.dy)), 'sum'), 6) AS xy_checksum
          FROM ${O.inp("surfaces")}, prm ORDER BY surface_id""",
    "q29_window_hulls" ->
      // hull of a 4-distinct-point opening ring = (possibly degenerate)
      // tetrahedron: 4 triangular faces = the 4 point-triples. Exact cross-
      // product areas, so the check is independent of which wall plane the
      // opening sits on (x-, y-, or z-constant, or tilted).
      s"""WITH w AS (SELECT building_id, surface_id,
                       ext[1] AS p1, ext[2] AS p2, ext[3] AS p3, ext[4] AS p4
                     FROM ${O.inp("surfaces")}
                     WHERE surface_class IN ('Window','Door'))
          SELECT building_id, surface_id, 4 AS n_hull_tris,
                 round(${triAreaSql("p1", "p2", "p3")} + ${triAreaSql("p1", "p2", "p4")}
                     + ${triAreaSql("p1", "p3", "p4")} + ${triAreaSql("p2", "p3", "p4")},
                   2) AS hull_area
          FROM w ORDER BY building_id, surface_id""",
    "q31_obj_lines" ->
      s"""WITH $thematicCte, $vertexDictCte,
          fmt AS (SELECT cls,
                    CASE WHEN x = CAST(CAST(x AS BIGINT) AS DOUBLE)
                         THEN printf('%.1f', x) ELSE CAST(x AS VARCHAR) END AS fx,
                    CASE WHEN y = CAST(CAST(y AS BIGINT) AS DOUBLE)
                         THEN printf('%.1f', y) ELSE CAST(y AS VARCHAR) END AS fy,
                    CASE WHEN z = CAST(CAST(z AS BIGINT) AS DOUBLE)
                         THEN printf('%.1f', z) ELSE CAST(z AS VARCHAR) END AS fz
                  FROM vd),
          vs AS (SELECT cls, COUNT(*) AS n_v_lines,
                   CAST(SUM(4 + length(fx) + length(fy) + length(fz)) AS BIGINT) AS v_bytes
                 FROM fmt GROUP BY cls),
          fs AS (SELECT cls, CAST(SUM($eulerT) AS BIGINT) AS n_f_lines
                 FROM ex GROUP BY cls)
          SELECT vs.cls, n_v_lines, n_f_lines, v_bytes
          FROM vs JOIN fs USING (cls) ORDER BY cls""",
    "q32_trisoup" ->
      s"""WITH $thematicCte,
          tb AS (SELECT building_id, CAST(SUM($eulerT) AS BIGINT) AS t
                 FROM th GROUP BY building_id)
          SELECT building_id, 4 * t AS n_lines,
                 (9 * t * (t + 1)) // 2 - 3 * t AS f_index_sum
          FROM tb ORDER BY building_id""",
    "q42_obj_flags" ->
      s"""WITH $thematicCte,
          ex AS (SELECT unnest(['All', surface_class]) AS cls, * FROM th),
          ba AS (SELECT building_id, attrs['irradiation'][1] AS batt
                 FROM ${O.inp("surfaces")} WHERE poly_ord = 0),
          sa AS (SELECT surface_id, attrs['irradiation'][1] AS att
                 FROM ${O.inp("surfaces")}),
          fm AS (SELECT ex.cls, ex.building_id, ex.building_ord,
                   ex.surface_id, ex.poly_ord, $eulerT AS t,
                   CASE WHEN ex.cls = 'All'
                          THEN round(round(((ba.batt - 0.0) / (1600.0 - 0.0)) * 100) / 100.0, 4)
                        WHEN ex.cls = 'RoofSurface' AND sa.att IS NOT NULL
                          THEN round(round(((sa.att - 0.0) / (1600.0 - 0.0)) * 100) / 100.0, 4)
                   END AS mat
                 FROM ex JOIN ba USING (building_id)
                         LEFT JOIN sa ON sa.surface_id = ex.surface_id),
          ob AS (SELECT cls, building_id, arg_min(surface_id, poly_ord) AS fsid
                 FROM fm GROUP BY cls, building_id),
          obl AS (SELECT cls, COUNT(*) AS n_o_lines,
                    CAST(SUM(CASE WHEN cls = 'All' THEN 2 + length(building_id)
                             ELSE 3 + length(building_id) + length(fsid) END)
                      AS BIGINT) AS o_bytes
                  FROM ob GROUP BY cls),
          ag AS (SELECT cls,
                   CAST(SUM(CASE WHEN mat IS NOT NULL THEN t ELSE 0 END) AS BIGINT) AS n_usemtl,
                   CAST(SUM(t) AS BIGINT) AS n_f_lines,
                   CAST(SUM(CASE WHEN mat IS NOT NULL
                            THEN t * CAST(round(mat * 10000) AS BIGINT)
                            ELSE 0 END) AS BIGINT) AS mat_checksum
                 FROM fm GROUP BY cls)
          SELECT ag.cls, obl.n_o_lines, obl.o_bytes, ag.n_usemtl,
                 CAST(1 AS BIGINT) AS n_mtllib, ag.n_f_lines, ag.mat_checksum
          FROM ag JOIN obl USING (cls) ORDER BY cls""",
    "q43_obj_skiptri" ->
      s"""WITH $thematicCte,
          ex AS (SELECT unnest(['All', surface_class]) AS cls, * FROM th),
          pts AS (SELECT cls, building_ord, poly_ord,
                    unnest(${O.open("c")}) AS p,
                    generate_subscripts(${O.open("c")}, 1) AS corner
                  FROM ex),
          vd AS (SELECT cls, p,
                   -- struct MIN = lexicographic first occurrence; no packed-
                   -- integer key (multiplier packing collides once poly_ord
                   -- or ring arity exceeds the radix — e.g. byte-offset
                   -- building_ords from chunked ingest)
                   MIN(struct_pack(b := building_ord, po := poly_ord,
                                   co := corner)) AS fk
                 FROM pts GROUP BY cls, p),
          ordn AS (SELECT cls, p,
                     ROW_NUMBER() OVER (PARTITION BY cls ORDER BY fk) AS ordinal
                   FROM vd),
          fi AS (SELECT pts.cls, SUM(ordn.ordinal) AS fsum
                 FROM pts JOIN ordn ON pts.cls = ordn.cls AND pts.p = ordn.p
                 GROUP BY pts.cls),
          base AS (SELECT cls, COUNT(*) AS n_f,
                     CAST(SUM(len(${O.open("c")})) AS BIGINT) AS arity
                   FROM ex GROUP BY cls),
          nv AS (SELECT cls, COUNT(*) AS n_v FROM ordn GROUP BY cls)
          SELECT base.cls, nv.n_v AS n_v_lines, base.n_f AS n_f_lines,
                 base.arity AS arity_sum, CAST(fi.fsum AS BIGINT) AS f_index_sum
          FROM base JOIN nv USING (cls) JOIN fi ON fi.cls = base.cls
          ORDER BY cls""",
    "q16_spatial_join_cells" ->
      // `gate` closes the oracle self-reference on the dumped triangles: for
      // EVERY thematic surface, the Σ of its dumped triangles' exact 3D areas
      // must equal the ring ground truth (exterior − qualifying holes,
      // recomputed from the surfaces table alone). Any missing surface,
      // phantom surface, or area drift > 1e-6·(1+area) empties the result →
      // hash mismatch → red row.
      s"""WITH $thematicCte,
          e AS (SELECT surface_id, ${O.area("c")} AS earea FROM th),
          hr AS (SELECT surface_id, unnest(hs) AS h FROM th),
          h1 AS (SELECT surface_id, h, ${O.normalCols("h", "h")} FROM hr),
          hv AS (SELECT surface_id,
                   SUM(CASE WHEN len(${O.open("h")}) >= 3 THEN ${O.area("h", "h")}
                       ELSE 0.0 END) AS hsum
                 FROM h1 GROUP BY surface_id),
          net AS (SELECT e.surface_id, e.earea - COALESCE(hv.hsum, 0.0) AS net_area
                  FROM e LEFT JOIN hv USING (surface_id)),
          tsum AS (SELECT surface_id,
                     SUM(sqrt(pow((by-ay)*(cz-az)-(bz-az)*(cy-ay),2)
                            + pow((bz-az)*(cx-ax)-(bx-ax)*(cz-az),2)
                            + pow((bx-ax)*(cy-ay)-(by-ay)*(cx-ax),2)) / 2.0) AS tri_area
                   FROM ${O.inp("triangles")} GROUP BY surface_id),
          gate AS (SELECT CASE WHEN COUNT(*) = 0 THEN 1 END AS ok
                   FROM net FULL JOIN tsum USING (surface_id)
                   WHERE net.net_area IS NULL OR tsum.tri_area IS NULL
                      OR abs(net.net_area - tsum.tri_area)
                         > 1e-6 * (1.0 + net.net_area)),
          i AS (SELECT image_id, ${O.cell("anchor_x", "anchor_y", 14)} AS cell_id,
                 anchor_x, anchor_y FROM ${O.inp("images")}),
          m AS (SELECT i.cell_id, i.image_id, t.surface_id
                FROM i JOIN ${O.inp("triangles")} t
                  ON ${O.pip("i.anchor_x", "i.anchor_y", "t.")})
          SELECT cell_id, COUNT(*) AS n_matches,
                 COUNT(DISTINCT image_id) AS n_images,
                 COUNT(DISTINCT surface_id) AS n_surfaces
          FROM m CROSS JOIN gate WHERE gate.ok = 1
          GROUP BY cell_id ORDER BY cell_id""",
    "q17_knn" ->
      s"""WITH c AS (SELECT surface_id, building_id, surface_class, ${O.centroidCols}
                     FROM ${O.inp("surfaces")}),
          d AS (SELECT i.image_id, c.surface_id, c.building_id, c.surface_class,
                  sqrt((i.anchor_x - c.cx)*(i.anchor_x - c.cx)
                     + (i.anchor_y - c.cy)*(i.anchor_y - c.cy)) AS dist
                FROM ${O.inp("images")} i CROSS JOIN c)
          SELECT image_id,
                 ROW_NUMBER() OVER (PARTITION BY image_id
                   ORDER BY dist ASC, surface_id ASC) AS rk,
                 surface_id, building_id, surface_class, round(dist, 6) AS dist
          FROM d QUALIFY rk <= 3 ORDER BY image_id, rk""",
    "q18_triangulate" ->
      s"""WITH $thematicCte
          SELECT surface_class, CAST(SUM($eulerT) AS BIGINT) AS n_triangles,
                 COUNT(DISTINCT surface_id) AS n_surfaces
          FROM th GROUP BY surface_class ORDER BY surface_class""",
    "q20_tiles" ->
      s"""WITH i AS (SELECT ${O.cell("anchor_x", "anchor_y", 14)} AS cell_id
                     FROM ${O.inp("images")})
          SELECT cell_id, COUNT(*) AS n_tiles, 'infinity'::DOUBLE AS min_psnr,
                 1 AS captions_ok
          FROM i GROUP BY cell_id ORDER BY cell_id""",
    "q24_bbox_join" ->
      s"""WITH pts AS (SELECT building_id, unnest(ext) AS p FROM ${O.inp("surfaces")}
                       WHERE surface_class IN $StructuralClasses),
          b AS (SELECT building_id,
                  MIN(p.x) - 3.0 AS xmin, MAX(p.x) + 3.0 AS xmax,
                  MIN(p.y) - 3.0 AS ymin, MAX(p.y) + 3.0 AS ymax
                FROM pts GROUP BY building_id)
          SELECT b.building_id, COUNT(*) AS n_hits
          FROM b JOIN ${O.inp("images")} i
            ON i.anchor_x BETWEEN b.xmin AND b.xmax
           AND i.anchor_y BETWEEN b.ymin AND b.ymax
          GROUP BY b.building_id ORDER BY b.building_id""",
    "q26_classify_angles" ->
      s"""WITH s0 AS (SELECT surface_id, surface_class, ${O.clean("ext")} AS c
                      FROM ${O.inp("surfaces")}),
          s1 AS (SELECT *, ${O.normalCols("c")} FROM s0),
          sv AS (SELECT * FROM s1 WHERE ${O.isValid("c")}),
          a AS (SELECT surface_id, surface_class,
                  nx / sqrt(nx*nx + ny*ny + nz*nz) AS ux,
                  ny / sqrt(nx*nx + ny*ny + nz*nz) AS uy,
                  nz / sqrt(nx*nx + ny*ny + nz*nz) AS uz
                FROM sv),
          b AS (SELECT *, sqrt(ux*ux + uy*uy) AS horiz,
                  90.0 - degrees(atan2(uy, ux)) AS az0 FROM a),
          t AS (SELECT surface_id, surface_class,
                  CASE WHEN az0 >= 360.0 THEN az0 - 360.0
                       WHEN az0 < 0.0 THEN az0 + 360.0 ELSE az0 END AS az1,
                  CASE WHEN horiz = 0.0 THEN 0.0
                       ELSE round(90.0 - degrees(atan(uz / horiz)), 3) END AS tilt
                FROM b)
          SELECT surface_id, surface_class, round(az1, 6) AS azimuth, tilt,
                 CASE WHEN abs(tilt) < 10 THEN 'horizontal'
                      WHEN abs(tilt - 90) < 10 THEN 'wall'
                      ELSE 'sloped' END AS pred_class
          FROM t ORDER BY surface_id""",
    "q30_corner_triangles" ->
      s"""WITH pts AS (SELECT building_id, unnest(ext) AS p FROM ${O.inp("surfaces")}
                       WHERE surface_class IN $StructuralClasses),
          b AS (SELECT building_id,
                  MIN(p.x) - 3.0 AS xmin, MAX(p.x) + 3.0 AS xmax,
                  MIN(p.y) - 3.0 AS ymin, MAX(p.y) + 3.0 AS ymax,
                  MIN(p.z) - 3.0 AS zmin, MAX(p.z) + 3.0 AS zmax
                FROM pts GROUP BY building_id)
          SELECT b.building_id, v.tri_idx,
                 CASE WHEN v.cx = 0 THEN b.xmin ELSE b.xmax END AS ax,
                 CASE WHEN v.cy = 0 THEN b.ymin ELSE b.ymax END AS ay,
                 CASE WHEN v.cz = 0 THEN b.zmin ELSE b.zmax END AS az
          FROM b CROSS JOIN (VALUES (0,0,0,0),(1,1,0,0),(2,0,1,0),(3,1,1,0),
                                    (4,0,0,1),(5,1,0,1),(6,0,1,1),(7,1,1,1))
                 AS v(tri_idx, cx, cy, cz)
          ORDER BY building_id, tri_idx""",
    "q35_attr_stats" ->
      s"""SELECT surface_class, COUNT(*) AS n, round(MIN(irr), 4) AS min_irr,
                 round(MAX(irr), 4) AS max_irr
          FROM (SELECT surface_class, attrs['irradiation'][1] AS irr
                FROM ${O.inp("surfaces")})
          WHERE irr IS NOT NULL GROUP BY surface_class ORDER BY surface_class""",
    "q39_bbox_sidecar" ->
      s"""WITH pts AS (SELECT building_id, unnest(ext) AS p FROM ${O.inp("surfaces")}
                       WHERE surface_class IN $StructuralClasses),
          b AS (SELECT building_id,
                  MIN(p.x) - 3.0 AS xmin, MAX(p.x) + 3.0 AS xmax,
                  MIN(p.y) - 3.0 AS ymin, MAX(p.y) + 3.0 AS ymax,
                  MIN(p.z) - 3.0 AS zmin, MAX(p.z) + 3.0 AS zmax
                FROM pts GROUP BY building_id)
          SELECT building_id,
                 round(xmin + (-100.0), 6) AS min_x, round(ymin + (-100.0), 6) AS min_y,
                 round(zmin + 0.0, 6) AS min_z,
                 round(xmax + (-100.0), 6) AS max_x, round(ymax + (-100.0), 6) AS max_y,
                 round(zmax + 0.0, 6) AS max_z,
                 CAST(-100.0 AS DOUBLE) AS d_x, CAST(-100.0 AS DOUBLE) AS d_y,
                 CAST(0.0 AS DOUBLE) AS d_z
          FROM b ORDER BY building_id""",
    "q36_thumbnails" ->
      // synth images are 16×16 RGB row-major; a 4×4 thumbnail block is a
      // 4×4 source box per channel, value = sum // 16 (truncating div,
      // matching ImageCodec.resize's integer accumulation)
      s"""WITH u AS (SELECT image_id, fmt, unnest(px) AS v,
                            generate_subscripts(px, 1) AS idx
                     FROM ${O.inp("pixels")}),
          g AS (SELECT image_id, fmt,
                  ((idx - 1) // 48) // 4 AS by,
                  (((idx - 1) % 48) // 3) // 4 AS bx,
                  ((idx - 1) % 48) % 3 AS c, v
                FROM u),
          o AS (SELECT image_id, fmt, by, bx, c, SUM(v) // 16 AS ov
                FROM g GROUP BY image_id, fmt, by, bx, c)
          SELECT fmt, COUNT(DISTINCT image_id) AS n_thumbs,
                 CAST(SUM(ov) AS BIGINT) AS px_checksum
          FROM o GROUP BY fmt ORDER BY fmt""",
    "q34_gml_ingest" ->
      s"""SELECT surface_class, COUNT(*) AS n_points,
                 CAST(SUM(CAST(p.x + p.y + p.z AS DECIMAL(28,6))) AS DOUBLE)
                   AS coord_checksum
          FROM (SELECT surface_class, unnest(ext) AS p FROM ${O.inp("surfaces")})
          GROUP BY surface_class ORDER BY surface_class""",
    "q38_area" ->
      s"""WITH s0 AS (SELECT surface_id, ext AS c, holes FROM ${O.inp("surfaces")}),
          s1 AS (SELECT *, ${O.normalCols("c")} FROM s0),
          e AS (SELECT surface_id,
                  CASE WHEN ${O.isValid("c")} THEN ${O.area("c")} ELSE 0.0 END AS earea
                FROM s1),
          hr AS (SELECT surface_id, unnest(holes) AS h FROM s0),
          h1 AS (SELECT surface_id, h, ${O.normalCols("h", "h")} FROM hr),
          hs AS (SELECT surface_id,
                   SUM(CASE WHEN ${O.isValid("h", "h")} THEN ${O.area("h", "h")}
                            ELSE 0.0 END) AS hsum
                 FROM h1 GROUP BY surface_id)
          SELECT e.surface_id, round(e.earea - COALESCE(hs.hsum, 0.0), 6) AS area
          FROM e LEFT JOIN hs USING (surface_id) ORDER BY surface_id""",
    "q46_poly_kernels" ->
      // Newell + area2D + edge dot/cross recomputed from the surfaces dump;
      // triangle alignment recomputed per DUMPED triangle (det3 Laplace unit
      // normal vs the normalized Newell, |Δ| ≤ 0.1 per component — the
      // compare_normals contract). round(x,6)+0.0 normalizes -0.0 to match
      // Spark's BigDecimal-based round.
      s"""WITH $thematicCte,
          nw AS (SELECT surface_id, c,
                   ${O.newellRaw("c", "x")} AS rwx,
                   ${O.newellRaw("c", "y")} AS rwy,
                   ${O.newellRaw("c", "z")} AS rwz
                 FROM th),
          nv AS (SELECT surface_id, c,
                   CASE WHEN sqrt(rwx*rwx + rwy*rwy + rwz*rwz) = 0 THEN 0.0
                        ELSE rwx / sqrt(rwx*rwx + rwy*rwy + rwz*rwz) END AS unx,
                   CASE WHEN sqrt(rwx*rwx + rwy*rwy + rwz*rwz) = 0 THEN 0.0
                        ELSE rwy / sqrt(rwx*rwx + rwy*rwy + rwz*rwz) END AS uny,
                   CASE WHEN sqrt(rwx*rwx + rwy*rwy + rwz*rwz) = 0 THEN 0.0
                        ELSE rwz / sqrt(rwx*rwx + rwy*rwy + rwz*rwz) END AS unz,
                   rwz AS nwz
                 FROM nw),
          a2 AS (SELECT surface_id, ${O.normalCols("c", "a2")},
                   ${O.shoelaceXY("c")} AS tz
                 FROM th),
          a2v AS (SELECT a2.surface_id,
                    CASE WHEN a2nz <> 0
                           THEN round(abs(tz * (a2nz / sqrt(a2nz*a2nz)) / 2.0), 6)
                         WHEN nv.nwz <> 0
                           THEN round(abs(tz * (nv.nwz / sqrt(nv.nwz*nv.nwz)) / 2.0), 6)
                         ELSE 0.0 END AS area2d
                  FROM a2 JOIN nv ON a2.surface_id = nv.surface_id),
          ed AS (SELECT surface_id,
                   ((c[2].x - c[1].x) * (c[3].x - c[1].x)
                    + (c[2].y - c[1].y) * (c[3].y - c[1].y)
                    + (c[2].z - c[1].z) * (c[3].z - c[1].z)) AS edge_dot,
                   ((c[2].y - c[1].y) * (c[3].z - c[1].z)
                    - (c[2].z - c[1].z) * (c[3].y - c[1].y)) AS edge_cx,
                   ((c[2].z - c[1].z) * (c[3].x - c[1].x)
                    - (c[2].x - c[1].x) * (c[3].z - c[1].z)) AS edge_cy,
                   ((c[2].x - c[1].x) * (c[3].y - c[1].y)
                    - (c[2].y - c[1].y) * (c[3].x - c[1].x)) AS edge_cz
                 FROM th),
          tr AS (SELECT surface_id,
                   ${O.normalColsPts("struct_pack(x := ax, y := ay, z := az)",
                                     "struct_pack(x := bx, y := by, z := bz)",
                                     "struct_pack(x := cx, y := cy, z := cz)", "t")}
                 FROM ${O.inp("triangles")}),
          ta AS (SELECT tr.surface_id, COUNT(*) AS n_tris,
                   CAST(SUM(CASE WHEN sqrt(tnx*tnx + tny*tny + tnz*tnz) <> 0
                         AND abs(tnx / sqrt(tnx*tnx + tny*tny + tnz*tnz) - nv.unx) <= 0.1
                         AND abs(tny / sqrt(tnx*tnx + tny*tny + tnz*tnz) - nv.uny) <= 0.1
                         AND abs(tnz / sqrt(tnx*tnx + tny*tny + tnz*tnz) - nv.unz) <= 0.1
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_aligned
                 FROM tr JOIN nv ON tr.surface_id = nv.surface_id
                 GROUP BY tr.surface_id)
          SELECT nv.surface_id,
            round(unx, 6) + 0.0 AS nnx, round(uny, 6) + 0.0 AS nny,
            round(unz, 6) + 0.0 AS nnz,
            a2v.area2d, ed.edge_dot, ed.edge_cx, ed.edge_cy, ed.edge_cz,
            COALESCE(ta.n_tris, 0) AS n_tris,
            COALESCE(ta.n_aligned, 0) AS n_aligned
          FROM nv JOIN a2v USING (surface_id) JOIN ed USING (surface_id)
                  LEFT JOIN ta USING (surface_id)
          ORDER BY surface_id""",
    "q47_plane_fit" ->
      // plane3 = cross(p1−p0, p2−p0) + d = −n·p0; centroid over the FULL
      // cleaned ring (closure included, Geom.centroid contract); getHeight/
      // getY null when the plane is parallel to the probed axis. pca_resid
      // is the invariant gate: the engine's PCA plane must fit the planar
      // ring to < 5e-7 (see PcaResidExpr scaladoc).
      s"""WITH $thematicCte,
          pl AS (SELECT surface_id, c, nx, ny, nz,
                   ((c[2].y - c[1].y) * (c[3].z - c[1].z)
                    - (c[2].z - c[1].z) * (c[3].y - c[1].y)) AS pa,
                   ((c[2].z - c[1].z) * (c[3].x - c[1].x)
                    - (c[2].x - c[1].x) * (c[3].z - c[1].z)) AS pb,
                   ((c[2].x - c[1].x) * (c[3].y - c[1].y)
                    - (c[2].y - c[1].y) * (c[3].x - c[1].x)) AS pc
                 FROM th),
          pl2 AS (SELECT surface_id, c, nx, ny, nz, pa, pb, pc,
                    -(pa * c[1].x + pb * c[1].y + pc * c[1].z) AS pd,
                    list_aggregate(list_transform(c, p -> p.x), 'sum') / len(c) AS ctx,
                    list_aggregate(list_transform(c, p -> p.y), 'sum') / len(c) AS cty,
                    list_aggregate(list_transform(c, p -> p.z), 'sum') / len(c) AS ctz
                  FROM pl)
          SELECT surface_id, pa, pb, pc, pd,
            round(CASE WHEN pc <> 0
                       THEN -(pa * ctx + pb * cty + pd) / pc END, 6) + 0.0 AS h_at_c,
            round(CASE WHEN pb <> 0
                       THEN -(pa * ctx + pc * ctz + pd) / pb END, 6) + 0.0 AS y_at_c,
            CASE WHEN sqrt(nx*nx + ny*ny + nz*nz) <> 0 AND
                   len(list_filter(range(1, len(c)+1), pi ->
                     abs((c[pi].x - c[1].x) * (nx / sqrt(nx*nx + ny*ny + nz*nz))
                       + (c[pi].y - c[1].y) * (ny / sqrt(nx*nx + ny*ny + nz*nz))
                       + (c[pi].z - c[1].z) * (nz / sqrt(nx*nx + ny*ny + nz*nz)))
                     > 0.000000001)) = 0
                 THEN 0.0 END AS pca_resid
          FROM pl2 ORDER BY surface_id""",
    "q48_building_extremes" ->
      s"""WITH $thematicCte,
          pts AS (SELECT building_id, unnest(c) AS p FROM th),
          rk AS (SELECT building_id, p,
                   row_number() OVER (PARTITION BY building_id
                     ORDER BY p.x, p.y, p.z) AS rlo,
                   row_number() OVER (PARTITION BY building_id
                     ORDER BY p.x DESC, p.y DESC, p.z DESC) AS rhi
                 FROM pts),
          lo AS (SELECT building_id, p.x AS sx, p.y AS sy, p.z AS sz
                 FROM rk WHERE rlo = 1),
          hi AS (SELECT building_id, p.x AS hx, p.y AS hy, p.z AS hz
                 FROM rk WHERE rhi = 1),
          wc AS (SELECT building_id, $wcCols FROM th WHERE poly_ord = 6)
          SELECT building_id, sx, sy, sz, hx, hy, hz, wcx, wcy, wcz
          FROM lo JOIN hi USING (building_id) JOIN wc USING (building_id)
          ORDER BY building_id""",
    "q49_translate_min" ->
      // global lexicographic-min vertex of the whole dictionary (every class
      // bin — identical to Spark's min(struct(x,y,z))), then per-class
      // translated extents as exact double subtractions.
      s"""WITH $thematicCte, $vertexDictCte,
          gm AS (SELECT x AS gx, y AS gy, z AS gz FROM
                   (SELECT x, y, z,
                      row_number() OVER (ORDER BY x, y, z) AS rn FROM vd)
                 WHERE rn = 1)
          SELECT cls, COUNT(*) AS n_vertices,
            MIN(x - gx) AS min_x, MIN(y - gy) AS min_y, MIN(z - gz) AS min_z,
            MAX(x - gx) AS max_x, MAX(y - gy) AS max_y, MAX(z - gz) AS max_z
          FROM vd CROSS JOIN gm GROUP BY cls ORDER BY cls""",
    "q50_dhash" ->
      // dHash recomputed bit-for-bit from the dumped decoded pixels: 9×8
      // box grid with ImageCodec.resize's bounds (x0 = bx·w/9 floor,
      // x1 = max(x0+1, (bx+1)·w/9)), truncating integer channel means
      // (`//` == Long division on non-negatives), luma 299r+587g+114b as
      // exact integers, bit = right-neighbor luma strictly greater.
      s"""WITH dh_im AS (SELECT i.image_id, i.w, i.h, p.px
                         FROM ${O.inp("images")} i
                         JOIN ${O.inp("pixels")} p USING (image_id)),
          $dhashCtes
          SELECT image_id, bits AS dhash_bits FROM dh_bits
          ORDER BY image_id""",
    "q51_image_neardups" ->
      // the whole near-dup path in SQL: dHash of originals + perturbed
      // companions, the SAME 4×16-bit pigeonhole blocking (the bit-string
      // groups partition positions exactly like the engine's shiftright
      // chunks), exact hamming on candidates only.
      s"""WITH $dupPairCtes
          SELECT img_a, img_b, hamming FROM hm WHERE hamming <= 3
          UNION ALL SELECT img_a, img_b, hamming FROM gp
          ORDER BY img_a, img_b""",
    "q157_ssim" ->
      // the q51 pair chain verbatim, finished with the SSIM replay:
      // BT.601 floor-div luma per position, exact integer factor forms
      // (C1/C2 scaled by 10^4 — cancels in the ratio), one double division
      s"""WITH $dupPairCtes,
          prs AS (SELECT img_a, img_b FROM hm WHERE hamming <= 3
                  UNION ALL SELECT img_a, img_b FROM gp),
          lums AS (SELECT t.img_a, t.img_b,
                     CAST(SUM(la) AS BIGINT) AS sa,
                     CAST(SUM(lb) AS BIGINT) AS sb,
                     CAST(SUM(la*la) AS BIGINT) AS saa,
                     CAST(SUM(lb*lb) AS BIGINT) AS sbb,
                     CAST(SUM(la*lb) AS BIGINT) AS sab
                   FROM (SELECT pr.img_a, pr.img_b,
                           (299*a.px[j.j*3+1] + 587*a.px[j.j*3+2]
                             + 114*a.px[j.j*3+3]) // 1000 AS la,
                           (299*b.px[j.j*3+1] + 587*b.px[j.j*3+2]
                             + 114*b.px[j.j*3+3]) // 1000 AS lb
                         FROM prs pr
                         JOIN dh_im a ON a.image_id = pr.img_a
                         JOIN dh_im b ON b.image_id = pr.img_b,
                         range(0, 256) AS j(j)) t
                   GROUP BY t.img_a, t.img_b),
          ss AS (SELECT img_a, img_b,
                   CAST(2*sa*sb*10000 + 65025::BIGINT * 65536 AS DOUBLE) AS num1,
                   CAST(2*(256*sab - sa*sb)*10000
                     + 585225::BIGINT * 65536 AS DOUBLE) AS num2,
                   CAST((sa*sa + sb*sb)*10000
                     + 65025::BIGINT * 65536 AS DOUBLE) AS den1,
                   CAST((256*saa - sa*sa + 256*sbb - sb*sb)*10000
                     + 585225::BIGINT * 65536 AS DOUBLE) AS den2
                 FROM lums)
          SELECT img_a, img_b, round(num1*num2/(den1*den2), 6) + 0.0 AS ssim
          FROM ss ORDER BY img_a, img_b"""
  )

  /** Shared q51/q157 oracle prefix: decoded originals + perturbed dups →
    * dHash bits → identical-signature rep groups (`gp`) + 4×16-bit
    * pigeonhole candidates with exact hamming (`hm`) — the engine's
    * HammingBlocking semantics replayed in SQL.
    */
  private def dupPairCtes: String =
    s"""dh_im AS (SELECT i.image_id, i.w, i.h, p.px
                  FROM ${O.inp("images")} i
                  JOIN ${O.inp("pixels")} p USING (image_id)
                  UNION ALL
                  SELECT image_id, w, h, px FROM ${O.inp("dup_pixels")}),
        $dhashCtes,
        g AS (SELECT bits, MIN(image_id) AS rep FROM dh_bits GROUP BY bits),
        gp AS (SELECT g.rep AS img_a, d.image_id AS img_b, 0 AS hamming
               FROM dh_bits d JOIN g USING (bits) WHERE d.image_id <> g.rep),
        ch AS (SELECT rep, bits, ci.ci AS ci,
                 substr(bits, ci * 16 + 1, 16) AS chunk
               FROM g, range(0, 4) AS ci(ci)),
        cand AS (SELECT DISTINCT a.rep AS img_a, b.rep AS img_b,
                   a.bits AS ba, b.bits AS bb
                 FROM ch a JOIN ch b ON a.ci = b.ci AND a.chunk = b.chunk
                   AND a.rep < b.rep),
        hm AS (SELECT img_a, img_b,
                 len(list_filter(range(1, 65),
                   hb -> substr(ba, hb, 1) <> substr(bb, hb, 1))) AS hamming
               FROM cand)"""

  /** dHash bit-string recomputation CTE chain over a source CTE `dh_im`
    * (image_id, w, h, px) — shared by q50 and q51. Ends with `dh_bits`
    * (image_id, bits).
    */
  private def dhashCtes: String =
    s"""dh_cells AS (SELECT image_id, w, h, px, bx.bx AS bx, by.by AS by
                     FROM dh_im, range(0, 9) AS bx(bx), range(0, 8) AS by(by)),
        dh_bounds AS (SELECT image_id, w, h, px, bx, by,
                        (bx * w) // 9 AS x0,
                        greatest((bx * w) // 9 + 1, ((bx + 1) * w) // 9) AS x1,
                        (by * h) // 8 AS y0,
                        greatest((by * h) // 8 + 1, ((by + 1) * h) // 8) AS y1
                      FROM dh_cells),
        dh_grid AS (SELECT image_id, bx, by,
                      299 * (${dhashBoxSum(1)} // ${dhashBoxN})
                    + 587 * (${dhashBoxSum(2)} // ${dhashBoxN})
                    + 114 * (${dhashBoxSum(3)} // ${dhashBoxN}) AS lum
                    FROM dh_bounds),
        dh_bits AS (SELECT g1.image_id,
                      string_agg(CASE WHEN g2.lum > g1.lum THEN '1' ELSE '0' END,
                        '' ORDER BY g1.by, g1.bx) AS bits
                    FROM dh_grid g1 JOIN dh_grid g2
                      ON g1.image_id = g2.image_id AND g2.by = g1.by
                     AND g2.bx = g1.bx + 1
                    WHERE g1.bx < 8 GROUP BY g1.image_id)"""

  /** q50 helper: integer channel sum over one dHash box (channel offset c ∈
    * {1,2,3}, 1-based into the flattened px list).
    */
  private def dhashBoxSum(c: Int): String =
    s"""list_reduce(list_transform(range(y0, y1), dh_y ->
          list_reduce(list_transform(range(x0, x1), dh_x ->
            px[(dh_y * w + dh_x) * 3 + $c]), (dh_a, dh_b) -> dh_a + dh_b)),
          (dh_a2, dh_b2) -> dh_a2 + dh_b2)"""

  private def dhashBoxN: String = "((y1 - y0) * (x1 - x0))"

  /** Oracles for the dedup/ANN family: bucketing stages come from the Verify
    * dumps (band/signature/candidate tables, same params as the queries);
    * the verification/re-rank stages are recomputed exactly in SQL.
    */
  private def textOracles: Map[String, String] = Map(
    "q21_minhash_neardups" ->
      s"""WITH bnd AS (SELECT * FROM ${O.inp("minhash_bands")}),
          cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
                   FROM bnd a JOIN bnd b USING (band_idx, band_hash)
                   WHERE a.doc_id < b.doc_id),
          sh AS (SELECT doc_id,
                   list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
                     THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                            si -> array_to_string(string_split(text, ' ')[si:si+2], ' '))
                     ELSE []::VARCHAR[] END) AS sh
                 FROM documents),
          j AS (SELECT doc_a, doc_b,
                  CAST(len(list_intersect(sa.sh, sb.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(sa.sh, sb.sh))) AS DOUBLE) AS jac
                FROM cand JOIN sh sa ON sa.doc_id = cand.doc_a
                          JOIN sh sb ON sb.doc_id = cand.doc_b)
          SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
          WHERE jac >= 0.5 ORDER BY doc_a, doc_b""",
    "q22_simhash" ->
      // hot-bucket-hardened semantics (HammingBlocking): identical
      // signatures → member→rep dup-group edges (hamming 0); distinct
      // signatures → exact-hamming rep→rep edges
      s"""WITH s AS (SELECT * FROM ${O.inp("simhash_sigs")}),
          g AS (SELECT sim, MIN(doc_id) AS rep FROM s GROUP BY sim),
          gp AS (SELECT g.rep AS doc_a, s.doc_id AS doc_b, 0 AS hamming
                 FROM s JOIN g USING (sim) WHERE s.doc_id <> g.rep),
          cp AS (SELECT a.rep AS doc_a, b.rep AS doc_b,
                   bit_count(xor(a.sim, b.sim)) AS hamming
                 FROM g a JOIN g b ON a.rep < b.rep
                 WHERE bit_count(xor(a.sim, b.sim)) <= 3)
          SELECT * FROM gp UNION ALL SELECT * FROM cp
          ORDER BY doc_a, doc_b""",
    "q23_fingerprints" ->
      s"""SELECT doc_id,
                 CAST(list_reduce(list_prepend('0', string_split(text, ' ')),
                   (acc, t) -> CAST(${O.md5n("acc || '|' || t")} AS VARCHAR)) AS BIGINT)
                   AS fingerprint
          FROM documents ORDER BY doc_id""",
    "q27_lsh_ann" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
          d AS (SELECT c.query_id, c.vec_id,
                  ${O.cos("ea.embedding", "eb.embedding")} AS cos_raw
                FROM ${O.inp("ann_candidates")} c
                JOIN e ea ON ea.vec_id = c.vec_id
                JOIN e eb ON eb.vec_id = c.query_id)
          SELECT query_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, vec_id ASC) AS rk,
                 vec_id, round(cos_raw, 6) AS cos
          FROM d QUALIFY rk <= 5 ORDER BY query_id, rk""",
    "q45_ivf_ann" ->
      s"""WITH ct AS (SELECT list_id, centroid FROM ${O.inp("ivf_centroids")}),
          asg AS (SELECT vec_id, list_id FROM (
                    SELECT e.vec_id, ct.list_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${O.cos("e.embedding", "ct.centroid")} DESC,
                                 ct.list_id ASC) AS rn
                    FROM embeddings e CROSS JOIN ct) WHERE rn = 1),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 3),
          ql AS (SELECT query_id, list_id FROM (
                   SELECT q.query_id, ct.list_id,
                     ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ${O.cos("q.q_emb", "ct.centroid")} DESC,
                                ct.list_id ASC) AS rn
                   FROM q CROSS JOIN ct) WHERE rn <= 4),
          d AS (SELECT ql.query_id, a.vec_id,
                  ${O.cos("e.embedding", "q.q_emb")} AS cos_raw
                FROM ql JOIN asg a USING (list_id)
                        JOIN embeddings e ON e.vec_id = a.vec_id
                        JOIN q ON q.query_id = ql.query_id
                WHERE a.vec_id <> ql.query_id)
          SELECT query_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, vec_id ASC) AS rk,
                 vec_id, round(cos_raw, 6) AS cos
          FROM d QUALIFY rk <= 5 ORDER BY query_id, rk""",
    "q28_cosine_neardups" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
          d AS (SELECT c.vec_a, c.vec_b,
                  ${O.cos("ea.embedding", "eb.embedding")} AS cosr
                FROM ${O.inp("cos_candidates")} c
                JOIN e ea ON ea.vec_id = c.vec_a
                JOIN e eb ON eb.vec_id = c.vec_b)
          SELECT vec_a, vec_b, round(cosr, 6) AS cos FROM d
          WHERE cosr >= 0.35 ORDER BY vec_a, vec_b""",
    "q40_features" ->
      s"""WITH u AS (SELECT image_id, unnest(px) AS v,
                            generate_subscripts(px, 1) AS idx
                     FROM ${O.inp("pixels")}),
          g AS (SELECT image_id, (idx - 1) % 3 AS c, v FROM u)
          SELECT image_id,
                 SUM(CASE WHEN c = 0 THEN v END) / COUNT(CASE WHEN c = 0 THEN 1 END) AS mean_r,
                 SUM(CASE WHEN c = 1 THEN v END) / COUNT(CASE WHEN c = 1 THEN 1 END) AS mean_g,
                 SUM(CASE WHEN c = 2 THEN v END) / COUNT(CASE WHEN c = 2 THEN 1 END) AS mean_b
          FROM g GROUP BY image_id ORDER BY image_id""",
    "q41_ngram_jaccard" ->
      s"""WITH d0 AS (SELECT doc_id, text,
                        len(string_split(text, ' ')) // 8 AS len_bucket,
                        list_distinct(CASE WHEN len(string_split(text, ' ')) >= 3
                          THEN list_transform(range(1, len(string_split(text, ' ')) - 1),
                                 si -> array_to_string(string_split(text, ' ')[si:si+2], ' '))
                          ELSE []::VARCHAR[] END) AS sh
                      FROM documents),
          j AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
                    / CAST(len(list_distinct(list_concat(a.sh, b.sh))) AS DOUBLE) AS jac
                FROM d0 a JOIN d0 b USING (len_bucket)
                WHERE a.doc_id < b.doc_id)
          SELECT doc_a, doc_b, round(jac, 4) AS jaccard FROM j
          WHERE jac >= 0.5 ORDER BY doc_a, doc_b""",
    "q33_simhash_sigs" ->
      s"""WITH t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
                     FROM documents),
          h AS (SELECT doc_id, ${O.md5n("tok")} AS h FROM t),
          eb AS (SELECT doc_id, h, unnest(range(0, 60)) AS b FROM h),
          s AS (SELECT doc_id, b,
                  SUM(CASE WHEN ((h >> b) & 1) = 1 THEN 1 ELSE -1 END) AS s
                FROM eb GROUP BY doc_id, b)
          SELECT doc_id,
                 CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b)
                               ELSE 0 END) AS BIGINT) AS simhash
          FROM s GROUP BY doc_id ORDER BY doc_id"""
  )

  def oracleSql: Map[String, String] = geomOracles ++ textOracles ++ Map(
    "q37_range_join" ->
      """SELECT l_returnflag, COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           AND l_shipdate >= o_orderdate
           AND l_shipdate <= o_orderdate + INTERVAL 30 DAY
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q01_pricing_agg" ->
      """SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) AS sum_price,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS sum_disc_price,
           COUNT(*) AS n_rows
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q53_mixed_city" ->
      s"""WITH pts AS (SELECT object_kind, surface_id, implicit_geom,
                         unnest(ext) AS p FROM ${O.inp("mixed_surfaces")}),
          bpts AS (SELECT building_id, unnest(ext) AS p
                   FROM ${O.inp("mixed_surfaces")}
                   WHERE surface_class IN $StructuralClasses),
          bb AS (SELECT building_id, MIN(p.x) AS xmin, MIN(p.y) AS ymin
                 FROM bpts GROUP BY building_id),
          pr AS (SELECT -trunc(avg(ymin)) AS dy, -trunc(avg(xmin)) AS dx
                 FROM bb)
          SELECT object_kind,
                 COUNT(DISTINCT surface_id) AS n_polys,
                 COUNT(*) AS n_points,
                 CAST(SUM(CAST(p.x + p.y + p.z AS DECIMAL(28,6))) AS DOUBLE)
                   AS coord_checksum,
                 CAST(SUM(CAST(CASE WHEN implicit_geom THEN p.x + p.y + p.z
                      ELSE ((p.x + dx) + (p.y + dy)) + p.z END
                      AS DECIMAL(28,6))) AS DOUBLE) AS tx_checksum
          FROM pts, pr GROUP BY object_kind ORDER BY object_kind""",
    "q56_components" ->
      // full -sepC replay over the mixed city: clean → validate → opening
      // anti-join → component-key CASE (the engine's componentKey — fixture
      // ids are sanitizer-clean, so no hash suffix arises) → per-component
      // vertex dictionary + Euler face counts
      s"""WITH m0 AS (SELECT building_id, surface_id, surface_class,
                        object_kind, feature_id, ${O.clean("ext")} AS c,
                        list_transform(holes, h -> ${O.clean("h")}) AS hs
                      FROM ${O.inp("mixed_surfaces")}),
          m1 AS (SELECT *, ${O.normalCols("c")} FROM m0),
          mv AS (SELECT * FROM m1 WHERE ${O.isValid("c")}),
          op AS (SELECT DISTINCT c AS oc FROM mv
                 WHERE surface_class IN ('Window','Door')),
          th AS (SELECT mv.* FROM mv LEFT JOIN op ON mv.c = op.oc
                 WHERE op.oc IS NULL
                   AND mv.surface_class NOT IN ('Window','Door')),
          ck AS (SELECT *, CASE
                   WHEN object_kind NOT IN ('Building','None') THEN 'Other'
                   WHEN surface_class IN ('BuildingInstallation',
                     'BuildingConstructiveElement','outerBuildingInstallation')
                     THEN building_id || '__'
                          || COALESCE(NULLIF(feature_id, ''), surface_class)
                   ELSE building_id END AS comp
                 FROM th),
          pv AS (SELECT comp, unnest(list_concat(${O.open("c")},
                   flatten(list_transform(
                     list_filter(hs, h -> len(${O.open("h")}) >= 3),
                     h -> ${O.open("h")})))) AS p FROM ck),
          vd AS (SELECT DISTINCT comp, p.x AS x, p.y AS y, p.z AS z FROM pv),
          vs AS (SELECT comp, COUNT(*) AS n_vertices,
                   CAST(SUM(CAST(x + y + z AS DECIMAL(28,6))) AS DOUBLE)
                     AS coord_checksum
                 FROM vd GROUP BY comp),
          fs AS (SELECT comp, CAST(SUM($eulerT) AS BIGINT) AS n_faces
                 FROM ck GROUP BY comp)
          SELECT vs.comp AS component, n_vertices, coord_checksum, n_faces
          FROM vs JOIN fs USING (comp) ORDER BY component""",
    "q57_frame_sample" ->
      s"""SELECT video_id, frame_idx, 8 AS w, 8 AS h, px_sum
          FROM ${O.inp("video_frames")}
          WHERE frame_idx % 3 = 0
          ORDER BY video_id, frame_idx""",
    "q58_audio_energy" ->
      s"""SELECT clip_id, window_idx, 400 AS n_samples, abs_sum
          FROM ${O.inp("audio_windows")}
          ORDER BY clip_id, window_idx""",
    "q59_seq_pack" ->
      """WITH t AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens
                    FROM documents),
          c AS (SELECT doc_id, n_tokens,
                  SUM(n_tokens) OVER (ORDER BY doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM t)
          SELECT doc_id, n_tokens,
                 CAST(cum - n_tokens AS BIGINT) AS start_offset,
                 CAST((cum - n_tokens) // 2048 AS BIGINT) AS first_bin,
                 CAST(CASE WHEN n_tokens > 0 THEN (cum - 1) // 2048
                      ELSE (cum - n_tokens) // 2048 END AS BIGINT) AS last_bin
          FROM c ORDER BY doc_id""",
    "q61_mix" ->
      s"""WITH m AS (SELECT source, doc_id,
                 ${O.md5n("doc_id::VARCHAR || '@13'")} % 1000000 AS hkey,
                 CASE source WHEN 'src0' THEN 500000 WHEN 'src1' THEN 250000
                      WHEN 'src2' THEN 0 ELSE 1000000 END AS thr
               FROM documents)
          SELECT source, COUNT(*) AS n_docs,
                 CAST(SUM(doc_id) AS BIGINT) AS id_sum
          FROM m WHERE hkey < thr GROUP BY source ORDER BY source""",
    "q83_incremental_dedup" ->
      // exact = md5(text) equality vs documents; near = band-count ≥ 3
      // over the dumped increment/history band tables; same CASE routing
      s"""WITH inc AS (SELECT doc_id, text FROM ${O.inp("incr_docs")}),
          ex AS (SELECT i.doc_id, COUNT(*)::BIGINT AS n_exact
                 FROM inc i JOIN documents h ON md5(i.text) = md5(h.text)
                 GROUP BY 1),
          nb AS (SELECT ib.doc_id, hb.doc_id AS old_id, COUNT(*) AS nb
                 FROM ${O.inp("incr_bands")} ib
                 JOIN ${O.inp("minhash_bands")} hb
                   ON ib.band_idx = hb.band_idx
                  AND ib.band_hash = hb.band_hash
                 GROUP BY 1, 2),
          nr AS (SELECT doc_id, MIN(old_id) AS near_match
                 FROM nb WHERE nb >= 3 GROUP BY 1)
          SELECT i.doc_id,
            COALESCE(ex.n_exact, 0) AS n_exact,
            COALESCE(nr.near_match, -1) AS near_match,
            CASE WHEN COALESCE(ex.n_exact, 0) > 0 THEN 'exact_dup'
                 WHEN COALESCE(nr.near_match, -1) >= 0 THEN 'near_dup'
                 ELSE 'new' END AS status
          FROM inc i LEFT JOIN ex USING (doc_id) LEFT JOIN nr USING (doc_id)
          ORDER BY i.doc_id""",
    "q101_stream_interval_join" ->
      // the streaming interval join must equal the relational one
      """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
           epoch_us(v.ts) AS view_us, epoch_us(c.ts) AS click_us
         FROM events v JOIN events c ON c.user_id = v.user_id
          AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 120 MINUTE
         WHERE v.event_type = 'view' AND c.event_type = 'click'
         ORDER BY view_id, click_id""",
    "q102_weighted_sample" ->
      // identical uniform (md5+1)/2^60, identical score chain
      // round(ln(u)/w, 9) + 0.0, same (score DESC, doc_id) cut
      s"""WITH h AS (SELECT doc_id, source, n_chars,
                       (${O.md5n("doc_id::VARCHAR || '@ws7'")} + 1)::DOUBLE
                         / 1152921504606846976.0 AS u
                     FROM documents),
          sc AS (SELECT doc_id, source, n_chars,
                   round(ln(u) / n_chars, 9) + 0.0 AS score FROM h),
          rk AS (SELECT *, row_number() OVER (PARTITION BY source
                   ORDER BY score DESC, doc_id) AS rnk FROM sc)
          SELECT source, doc_id, n_chars AS weight, score FROM rk
          WHERE rnk <= 10 ORDER BY source, doc_id""",
    "q103_pagerank" ->
      // the 5 integer-math iterations unrolled as a CTE chain: same
      // ordinals, same md5 edge targets, same div/floor chain — rank_u
      // must match bit for bit
      s"""WITH nodes AS (SELECT doc_id,
                           row_number() OVER (ORDER BY doc_id) - 1 AS ord
                         FROM documents),
          n AS (SELECT COUNT(*) AS n FROM nodes),
          edges AS (SELECT nd.ord AS src,
                      ${O.md5n("nd.doc_id::VARCHAR || '@pr' || k.k")}
                        % (SELECT n FROM n) AS dst
                    FROM nodes nd
                    CROSS JOIN (SELECT unnest(range(0, 3)) AS k) k),
          r0 AS (SELECT ord AS id,
                   (1000000000000::BIGINT // (SELECT n FROM n)) AS rank_u
                 FROM nodes),
          ${(1 to 5).map { i =>
        s"""i$i AS (SELECT e.dst AS id,
                      CAST(SUM(r.rank_u // 3) AS BIGINT) AS s
                    FROM edges e JOIN r${i - 1} r ON r.id = e.src
                    GROUP BY e.dst),
          r$i AS (SELECT nd.ord AS id,
                    ((1000000000000::BIGINT * 15 // 100) // (SELECT n FROM n))
                      + (85 * COALESCE(i.s, 0)) // 100 AS rank_u
                  FROM nodes nd LEFT JOIN i$i i ON i.id = nd.ord)"""
      }.mkString(",\n          ")}
          SELECT nd.doc_id, r.rank_u FROM r5 r
          JOIN nodes nd ON nd.ord = r.id
          ORDER BY nd.doc_id""",
    "q104_quality_classifier" ->
      // the full integer-GD training run replayed as a LINEAR CTE chain:
      // identical features, centering, hard sigmoid, gradient div chain
      // and update rule — weights (and so every score) match bit for bit.
      // Each g$i carries the previous weights through as MIN()s so the
      // chain references each predecessor exactly once (iters scans, not
      // 2^iters re-inlinings).
      s"""WITH raw AS (SELECT doc_id,
            CAST(CASE WHEN n_chars >= 250
                   AND (length(text)-length(replace(text,'the','')))//3
                       * 1000 >=
                       8 * ((length(text)-length(replace(text,' ','')))+1)
                 THEN 1 ELSE 0 END AS BIGINT) AS y,
            ((n_chars*1000000)
              // ((length(text)-length(replace(text,' ','')))+1)) // 16
              AS r1,
            ((length(text)-length(replace(text,' ',''))) * 1000000)
              // greatest(n_chars,1) AS r2,
            (least(n_chars,512)*1000000) // 512 AS r3,
            ((length(text)-length(replace(text,'the','')))//3 * 1000000)
              // ((length(text)-length(replace(text,' ','')))+1) AS r4
          FROM documents),
          nn AS (SELECT COUNT(*) AS n FROM raw),
          mu AS (SELECT CAST(SUM(r1) AS BIGINT)//(SELECT n FROM nn) AS m1,
                   CAST(SUM(r2) AS BIGINT)//(SELECT n FROM nn) AS m2,
                   CAST(SUM(r3) AS BIGINT)//(SELECT n FROM nn) AS m3,
                   CAST(SUM(r4) AS BIGINT)//(SELECT n FROM nn) AS m4
                 FROM raw),
          feat AS (SELECT doc_id, y, r1-m1 AS x1, r2-m2 AS x2,
                     r3-m3 AS x3, r4-m4 AS x4 FROM raw CROSS JOIN mu),
          w0 AS (SELECT 0::BIGINT AS b, 0::BIGINT AS w1, 0::BIGINT AS w2,
                   0::BIGINT AS w3, 0::BIGINT AS w4),
          ${(1 to 8).map { i =>
        s"""g$i AS (SELECT CAST(SUM(e) AS BIGINT) AS gb,
              CAST(SUM((e*x1)//1000000) AS BIGINT) AS g1,
              CAST(SUM((e*x2)//1000000) AS BIGINT) AS g2,
              CAST(SUM((e*x3)//1000000) AS BIGINT) AS g3,
              CAST(SUM((e*x4)//1000000) AS BIGINT) AS g4,
              MIN(pb) AS pb, MIN(pw1) AS pw1, MIN(pw2) AS pw2,
              MIN(pw3) AS pw3, MIN(pw4) AS pw4, COUNT(*) AS n
            FROM (SELECT least(greatest(
                    ((w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + w.w4*f.x4)
                      //1000000 + w.b)//4 + 500000, 0), 1000000)
                    - f.y*1000000 AS e,
                  f.x1, f.x2, f.x3, f.x4, w.b AS pb, w.w1 AS pw1,
                  w.w2 AS pw2, w.w3 AS pw3, w.w4 AS pw4
                  FROM feat f CROSS JOIN w${i - 1} w)),
          w$i AS (SELECT pb - (2*gb)//n AS b, pw1 - (2*g1)//n AS w1,
                    pw2 - (2*g2)//n AS w2, pw3 - (2*g3)//n AS w3,
                    pw4 - (2*g4)//n AS w4 FROM g$i)"""
      }.mkString(",\n          ")},
          scored AS (SELECT f.doc_id, f.y,
            least(greatest(
              ((w.w1*f.x1 + w.w2*f.x2 + w.w3*f.x3 + w.w4*f.x4)//1000000
                + w.b)//4 + 500000, 0), 1000000) AS score_u
            FROM feat f CROSS JOIN w8 w)
          SELECT doc_id, y, score_u,
            CAST(CASE WHEN score_u >= 500000 THEN 1 ELSE 0 END AS BIGINT)
              AS keep
          FROM scored ORDER BY doc_id""",
    "q105_canonical_by_quality" ->
      // q62's transitive-closure components + the keep-by-quality argmax:
      // best score wins, ties to the smallest id (the window tiebreak
      // resolves identically to the engine's max_by(id, (score, -id)))
      s"""WITH RECURSIVE e AS (
            SELECT doc_a AS a, doc_b AS b FROM ${O.inp("neardup_edges")}
            UNION SELECT doc_b, doc_a FROM ${O.inp("neardup_edges")}),
          reach(v, r) AS (
            SELECT doc_id, doc_id FROM ${O.inp("neardup_vertices")}
            UNION
            SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.v),
          c AS (SELECT v AS doc_id, MIN(r) AS component
                FROM reach GROUP BY v),
          sc AS (SELECT c.doc_id, c.component, v.n_chars AS score
                 FROM c JOIN ${O.inp("neardup_vertices")} v USING (doc_id)),
          rk AS (SELECT *, row_number() OVER (PARTITION BY component
                   ORDER BY score DESC, doc_id) AS rnk FROM sc),
          k AS (SELECT component, doc_id AS keep_doc_id FROM rk
                WHERE rnk = 1)
          SELECT sc.doc_id, sc.component, sc.score, k.keep_doc_id,
            sc.doc_id = k.keep_doc_id AS is_keep
          FROM sc JOIN k USING (component) ORDER BY sc.doc_id""",
    "q106_zonal_stats" ->
      // zones from the dumped surfaces (the q24 AABB derivation, buffer
      // 0), tiles from images+pixels; the per-pixel center-in-zone
      // predicate and the raw 299r+587g+114b numerators are the exact
      // expressions the engine folds — the cell prefilter is plan-side
      // only (the rect join is a conservative superset; pairs with no
      // center inside vanish from both engines)
      s"""WITH pts AS (SELECT building_ord, unnest(ext) AS p
                       FROM ${O.inp("surfaces")}
                       WHERE surface_class IN $StructuralClasses),
          z AS (SELECT building_ord, MIN(p.x) AS xmin, MAX(p.x) AS xmax,
                  MIN(p.y) AS ymin, MAX(p.y) AS ymax FROM pts GROUP BY 1),
          img AS (SELECT i.image_id, i.anchor_x, i.anchor_y, i.w, i.h, x.px
                  FROM ${O.inp("images")} i
                  JOIN ${O.inp("pixels")} x USING (image_id)),
          pair AS (SELECT z.building_ord, m.*, z.xmin, z.xmax, z.ymin,
                     z.ymax
                   FROM z JOIN img m ON m.anchor_x <= z.xmax
                    AND m.anchor_x + m.w * 1.0 >= z.xmin
                    AND m.anchor_y <= z.ymax
                    AND m.anchor_y + m.h * 1.0 >= z.ymin),
          gpx AS (SELECT p.building_ord, p.image_id, COUNT(*) AS n_px,
                    CAST(SUM(299*p.px[(jy.jy*16 + ix.ix)*3 + 1]
                           + 587*p.px[(jy.jy*16 + ix.ix)*3 + 2]
                           + 114*p.px[(jy.jy*16 + ix.ix)*3 + 3]) AS BIGINT)
                      AS lsum
                  FROM pair p
                  CROSS JOIN (SELECT unnest(range(0,16)) AS ix) ix
                  CROSS JOIN (SELECT unnest(range(0,16)) AS jy) jy
                  WHERE p.anchor_x + (ix.ix + 0.5) * 1.0
                          BETWEEN p.xmin AND p.xmax
                    AND p.anchor_y + (jy.jy + 0.5) * 1.0
                          BETWEEN p.ymin AND p.ymax
                  GROUP BY 1, 2)
          SELECT building_ord, COUNT(*)::BIGINT AS n_images,
            CAST(SUM(n_px) AS BIGINT) AS n_px,
            CAST(SUM(lsum) AS BIGINT) AS luma_sum,
            CAST(SUM(lsum) AS BIGINT) // CAST(SUM(n_px) AS BIGINT)
              AS mean_luma
          FROM gpx GROUP BY 1 ORDER BY 1""",
    "q107_hotspots" ->
      // identical floor-grid bucketing, 3×3 window sum, and integer
      // cross-multiplied hot flag (n_window·n_cells > 36·n_points)
      s"""WITH pt AS (SELECT CAST(floor(anchor_x / 16.0) AS BIGINT) AS cx,
                        CAST(floor(anchor_y / 16.0) AS BIGINT) AS cy
                      FROM ${O.inp("images")}),
          cells AS (SELECT cx, cy, COUNT(*)::BIGINT AS n_self
                    FROM pt GROUP BY 1, 2),
          tot AS (SELECT CAST(SUM(n_self) AS BIGINT) AS n_points,
                    COUNT(*)::BIGINT AS n_cells FROM cells),
          nbr AS (SELECT c.cx + dx.dx AS cx, c.cy + dy.dy AS cy,
                    CAST(SUM(c.n_self) AS BIGINT) AS n_window
                  FROM cells c
                  CROSS JOIN (SELECT unnest(range(-1,2)) AS dx) dx
                  CROSS JOIN (SELECT unnest(range(-1,2)) AS dy) dy
                  GROUP BY 1, 2)
          SELECT c.cx, c.cy, c.n_self, n.n_window,
            n.n_window * (SELECT n_cells FROM tot)
              > 36 * (SELECT n_points FROM tot) AS is_hot
          FROM cells c JOIN nbr n USING (cx, cy) ORDER BY cx, cy""",
    "q108_solar_exposure" ->
      // clean → validate → RoofSurface; incidence from the raw Newell
      // normal (newellRaw replay), area from the first-3-normal shoelace
      // (the q38 replay); per-term round(·,6)+0.0 then exact DECIMAL sums
      s"""WITH s0 AS (SELECT building_id, surface_id, surface_class,
                        ${O.clean("ext")} AS c FROM ${O.inp("surfaces")}),
          s1 AS (SELECT *, ${O.normalCols("c")} FROM s0),
          sv AS (SELECT * FROM s1 WHERE ${O.isValid("c")}
                 AND surface_class = 'RoofSurface'),
          nw AS (SELECT building_id, c, nx, ny, nz,
                   ${O.newellRaw("c", "x")} AS rwx,
                   ${O.newellRaw("c", "y")} AS rwy,
                   ${O.newellRaw("c", "z")} AS rwz
                 FROM sv),
          ex AS (SELECT building_id,
                   round(${O.area("c")} * greatest(0.0,
                     (rwx*0.0 + rwy*-0.7071067811865476
                       + rwz*0.7071067811865476)
                       / sqrt(rwx*rwx + rwy*rwy + rwz*rwz)), 6) + 0.0
                     AS expo
                 FROM nw)
          SELECT building_id, COUNT(*)::BIGINT AS n_roofs,
            round(CAST(SUM(CAST(expo AS DECIMAL(28,6))) AS DOUBLE), 6)
              + 0.0 AS exposure
          FROM ex GROUP BY 1 ORDER BY 1""",
    "q109_clip_transfer" ->
      // the SAME dialect-abstracted clip template (OracleSql.shClip /
      // shArea) rendered for DuckDB — both engines run the identical
      // IEEE expression tree over the dumped ground triangles
      s"""WITH t AS (SELECT ax, ay, bx, by, cx, cy
                     FROM ${O.inp("triangles")}
                     WHERE surface_class = 'GroundSurface'),
          b AS (SELECT *,
                  CAST(floor(least(ax,bx,cx) / 16.0) AS BIGINT) AS gx0,
                  CAST(floor(greatest(ax,bx,cx) / 16.0) AS BIGINT) AS gx1,
                  CAST(floor(least(ay,by,cy) / 16.0) AS BIGINT) AS gy0,
                  CAST(floor(greatest(ay,by,cy) / 16.0) AS BIGINT) AS gy1
                FROM t),
          gxs AS (SELECT *, unnest(range(gx0, gx1 + 1)) AS gx FROM b),
          g AS (SELECT *, unnest(range(gy0, gy1 + 1)) AS gy FROM gxs),
          q0 AS (SELECT gx, gy, gx*16.0 AS rx0, (gx+1)*16.0 AS rx1,
                   gy*16.0 AS ry0, (gy+1)*16.0 AS ry1,
                   [{'x': ax, 'y': ay}, {'x': bx, 'y': by},
                    {'x': cx, 'y': cy}] AS p0
                 FROM g),
          q1 AS (SELECT *, ${O.shClip("p0", 'x', isMin = true, "rx0",
        spark = false)} AS p1 FROM q0),
          q2 AS (SELECT *, ${O.shClip("p1", 'x', isMin = false, "rx1",
        spark = false)} AS p2 FROM q1),
          q3 AS (SELECT *, ${O.shClip("p2", 'y', isMin = true, "ry0",
        spark = false)} AS p3 FROM q2),
          q4 AS (SELECT *, ${O.shClip("p3", 'y', isMin = false, "ry1",
        spark = false)} AS p4 FROM q3),
          a AS (SELECT gx, gy,
                  round(${O.shArea("p4", spark = false)}, 6) + 0.0 AS ar
                FROM q4)
          SELECT gx, gy,
            CAST(SUM(CASE WHEN ar > 0 THEN 1 ELSE 0 END) AS BIGINT)
              AS n_tris,
            round(CAST(SUM(CAST(ar AS DECIMAL(28,6))) AS DOUBLE), 6) + 0.0
              AS area_sum
          FROM a GROUP BY 1, 2
          HAVING CAST(SUM(CASE WHEN ar > 0 THEN 1 ELSE 0 END) AS BIGINT) > 0
          ORDER BY 1, 2""",
    "q110_skyline" ->
      // textbook NOT-EXISTS dominance: b dominates a iff ≥ in both dims
      // and > in one — duplicates of a frontier point all survive
      """WITH f AS (SELECT doc_id, n_chars,
             len(list_distinct(string_split(text, ' ')))::BIGINT AS n_toks
           FROM documents)
         SELECT a.doc_id, a.n_chars, a.n_toks FROM f a
         WHERE NOT EXISTS (SELECT 1 FROM f b
           WHERE b.n_chars >= a.n_chars AND b.n_toks >= a.n_toks
             AND (b.n_chars > a.n_chars OR b.n_toks > a.n_toks))
         ORDER BY a.doc_id""",
    "q111_idw_surface" ->
      // luma sums recomputed from the pixels dump; identical weight chain
      // (1/(d²+1)), identical per-term round(·,9) → DECIMAL(38,12) sums
      s"""WITH ls AS (SELECT i.image_id, i.anchor_x, i.anchor_y,
                        CAST(list_reduce(list_transform(range(0, 256), j ->
                          299*x.px[j*3+1] + 587*x.px[j*3+2]
                            + 114*x.px[j*3+3]),
                          (la, lv) -> la + lv) AS BIGINT) AS lum_sum,
                        CAST(floor(i.anchor_x / 16.0) AS BIGINT) AS scx,
                        CAST(floor(i.anchor_y / 16.0) AS BIGINT) AS scy
                      FROM ${O.inp("images")} i
                      JOIN ${O.inp("pixels")} x USING (image_id)),
          occ AS (SELECT DISTINCT scx, scy FROM ls),
          con AS (SELECT ls.scx + dx.dx AS cx, ls.scy + dy.dy AS cy,
                    anchor_x, anchor_y, lum_sum
                  FROM ls
                  CROSS JOIN (SELECT unnest(range(-1,2)) AS dx) dx
                  CROSS JOIN (SELECT unnest(range(-1,2)) AS dy) dy),
          t AS (SELECT cx, cy, anchor_x, anchor_y, lum_sum,
                  (CAST(cx AS DOUBLE) + 0.5) * 16.0 AS mx,
                  (CAST(cy AS DOUBLE) + 0.5) * 16.0 AS my FROM con),
          t2 AS (SELECT cx, cy, lum_sum,
                   (anchor_x - mx) * (anchor_x - mx)
                     + (anchor_y - my) * (anchor_y - my) AS d2 FROM t),
          t3 AS (SELECT cx, cy, lum_sum, 1.0 / (d2 + 1.0) AS w FROM t2),
          agg AS (SELECT cx, cy, COUNT(*)::BIGINT AS n_samples,
                    SUM(CAST(round(w * CAST(lum_sum AS DOUBLE), 9)
                      AS DECIMAL(38,12))) AS num,
                    SUM(CAST(round(w, 9) AS DECIMAL(38,12))) AS den
                  FROM t3 GROUP BY 1, 2)
          SELECT a.cx, a.cy, a.n_samples,
            CAST(floor(CAST(a.num AS DOUBLE) / CAST(a.den AS DOUBLE)
              * 1000000.0) AS BIGINT) AS idw_micro
          FROM agg a JOIN occ o ON o.scx = a.cx AND o.scy = a.cy
          ORDER BY 1, 2""",
    "q112_psi_drift" ->
      // identical binning, Laplace smoothing, and nano-unit term rounding;
      // totals as scalar subqueries equal the engine's collected literals
      """WITH d AS (SELECT least(n_chars // 64, 7) AS bin,
              CAST(substr(source, 4) AS INT) < 10 AS is_ref
            FROM documents),
          c AS (SELECT bin,
                  CAST(SUM(CASE WHEN is_ref THEN 1 ELSE 0 END) AS BIGINT)
                    AS ref_n,
                  CAST(SUM(CASE WHEN is_ref THEN 0 ELSE 1 END) AS BIGINT)
                    AS cur_n
                FROM d GROUP BY 1),
          t AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS rt,
                  CAST(SUM(cur_n) AS BIGINT) AS ct FROM c),
          sp AS (SELECT unnest(range(0, 8)) AS bin),
          f AS (SELECT sp.bin, COALESCE(c.ref_n, 0) AS ref_n,
                  COALESCE(c.cur_n, 0) AS cur_n
                FROM sp LEFT JOIN c USING (bin)),
          pq AS (SELECT bin, ref_n, cur_n,
                   CAST(ref_n + 1 AS DOUBLE)
                     / CAST((SELECT rt FROM t) + 8 AS DOUBLE) AS pr,
                   CAST(cur_n + 1 AS DOUBLE)
                     / CAST((SELECT ct FROM t) + 8 AS DOUBLE) AS qc
                 FROM f)
          SELECT bin, ref_n, cur_n,
            CAST(round((pr - qc) * ln(pr / qc) * 1000000000.0, 0)
              AS BIGINT) AS term_nano
          FROM pq ORDER BY bin""",
    "q135_shortest_paths" ->
      // 32 generated relaxation rounds — identical min-over-union math;
      // past the hop diameter every extra round is the fixpoint identity.
      // MATERIALIZED: each round references its predecessor twice, and
      // DuckDB's default CTE inlining would expand the chain 2^32-fold
      s"""WITH g AS (SELECT src, dst, w FROM ${O.inp("grid_edges")}),
          r0 AS (SELECT CAST(0 AS BIGINT) AS v, CAST(0 AS BIGINT) AS dist),
          r1 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r0
            UNION ALL
            SELECT e.dst AS v, r0.dist + e.w AS dist
            FROM r0 JOIN g e ON e.src = r0.v) GROUP BY v),
          r2 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r1
            UNION ALL
            SELECT e.dst AS v, r1.dist + e.w AS dist
            FROM r1 JOIN g e ON e.src = r1.v) GROUP BY v),
          r3 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r2
            UNION ALL
            SELECT e.dst AS v, r2.dist + e.w AS dist
            FROM r2 JOIN g e ON e.src = r2.v) GROUP BY v),
          r4 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r3
            UNION ALL
            SELECT e.dst AS v, r3.dist + e.w AS dist
            FROM r3 JOIN g e ON e.src = r3.v) GROUP BY v),
          r5 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r4
            UNION ALL
            SELECT e.dst AS v, r4.dist + e.w AS dist
            FROM r4 JOIN g e ON e.src = r4.v) GROUP BY v),
          r6 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r5
            UNION ALL
            SELECT e.dst AS v, r5.dist + e.w AS dist
            FROM r5 JOIN g e ON e.src = r5.v) GROUP BY v),
          r7 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r6
            UNION ALL
            SELECT e.dst AS v, r6.dist + e.w AS dist
            FROM r6 JOIN g e ON e.src = r6.v) GROUP BY v),
          r8 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r7
            UNION ALL
            SELECT e.dst AS v, r7.dist + e.w AS dist
            FROM r7 JOIN g e ON e.src = r7.v) GROUP BY v),
          r9 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r8
            UNION ALL
            SELECT e.dst AS v, r8.dist + e.w AS dist
            FROM r8 JOIN g e ON e.src = r8.v) GROUP BY v),
          r10 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r9
            UNION ALL
            SELECT e.dst AS v, r9.dist + e.w AS dist
            FROM r9 JOIN g e ON e.src = r9.v) GROUP BY v),
          r11 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r10
            UNION ALL
            SELECT e.dst AS v, r10.dist + e.w AS dist
            FROM r10 JOIN g e ON e.src = r10.v) GROUP BY v),
          r12 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r11
            UNION ALL
            SELECT e.dst AS v, r11.dist + e.w AS dist
            FROM r11 JOIN g e ON e.src = r11.v) GROUP BY v),
          r13 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r12
            UNION ALL
            SELECT e.dst AS v, r12.dist + e.w AS dist
            FROM r12 JOIN g e ON e.src = r12.v) GROUP BY v),
          r14 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r13
            UNION ALL
            SELECT e.dst AS v, r13.dist + e.w AS dist
            FROM r13 JOIN g e ON e.src = r13.v) GROUP BY v),
          r15 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r14
            UNION ALL
            SELECT e.dst AS v, r14.dist + e.w AS dist
            FROM r14 JOIN g e ON e.src = r14.v) GROUP BY v),
          r16 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r15
            UNION ALL
            SELECT e.dst AS v, r15.dist + e.w AS dist
            FROM r15 JOIN g e ON e.src = r15.v) GROUP BY v),
          r17 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r16
            UNION ALL
            SELECT e.dst AS v, r16.dist + e.w AS dist
            FROM r16 JOIN g e ON e.src = r16.v) GROUP BY v),
          r18 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r17
            UNION ALL
            SELECT e.dst AS v, r17.dist + e.w AS dist
            FROM r17 JOIN g e ON e.src = r17.v) GROUP BY v),
          r19 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r18
            UNION ALL
            SELECT e.dst AS v, r18.dist + e.w AS dist
            FROM r18 JOIN g e ON e.src = r18.v) GROUP BY v),
          r20 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r19
            UNION ALL
            SELECT e.dst AS v, r19.dist + e.w AS dist
            FROM r19 JOIN g e ON e.src = r19.v) GROUP BY v),
          r21 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r20
            UNION ALL
            SELECT e.dst AS v, r20.dist + e.w AS dist
            FROM r20 JOIN g e ON e.src = r20.v) GROUP BY v),
          r22 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r21
            UNION ALL
            SELECT e.dst AS v, r21.dist + e.w AS dist
            FROM r21 JOIN g e ON e.src = r21.v) GROUP BY v),
          r23 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r22
            UNION ALL
            SELECT e.dst AS v, r22.dist + e.w AS dist
            FROM r22 JOIN g e ON e.src = r22.v) GROUP BY v),
          r24 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r23
            UNION ALL
            SELECT e.dst AS v, r23.dist + e.w AS dist
            FROM r23 JOIN g e ON e.src = r23.v) GROUP BY v),
          r25 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r24
            UNION ALL
            SELECT e.dst AS v, r24.dist + e.w AS dist
            FROM r24 JOIN g e ON e.src = r24.v) GROUP BY v),
          r26 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r25
            UNION ALL
            SELECT e.dst AS v, r25.dist + e.w AS dist
            FROM r25 JOIN g e ON e.src = r25.v) GROUP BY v),
          r27 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r26
            UNION ALL
            SELECT e.dst AS v, r26.dist + e.w AS dist
            FROM r26 JOIN g e ON e.src = r26.v) GROUP BY v),
          r28 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r27
            UNION ALL
            SELECT e.dst AS v, r27.dist + e.w AS dist
            FROM r27 JOIN g e ON e.src = r27.v) GROUP BY v),
          r29 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r28
            UNION ALL
            SELECT e.dst AS v, r28.dist + e.w AS dist
            FROM r28 JOIN g e ON e.src = r28.v) GROUP BY v),
          r30 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r29
            UNION ALL
            SELECT e.dst AS v, r29.dist + e.w AS dist
            FROM r29 JOIN g e ON e.src = r29.v) GROUP BY v),
          r31 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r30
            UNION ALL
            SELECT e.dst AS v, r30.dist + e.w AS dist
            FROM r30 JOIN g e ON e.src = r30.v) GROUP BY v),
          r32 AS MATERIALIZED (SELECT v, MIN(dist) AS dist FROM (
            SELECT v, dist FROM r31
            UNION ALL
            SELECT e.dst AS v, r31.dist + e.w AS dist
            FROM r31 JOIN g e ON e.src = r31.v) GROUP BY v)
          SELECT v, dist FROM r32 ORDER BY v""",
    "q151_channel_corr" ->
      // same six integer sums from the pixel dump, same single-rounded
      // correlation expression, same 0.99 flag
      s"""WITH c AS (SELECT image_id,
              CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(px[j.j*3+1]) AS BIGINT) AS sr,
              CAST(SUM(px[j.j*3+2]) AS BIGINT) AS sg,
              CAST(SUM(px[j.j*3+1] * px[j.j*3+1]) AS BIGINT) AS srr,
              CAST(SUM(px[j.j*3+2] * px[j.j*3+2]) AS BIGINT) AS sgg,
              CAST(SUM(px[j.j*3+1] * px[j.j*3+2]) AS BIGINT) AS srg
            FROM ${O.inp("pixels")}, range(0,256) AS j(j) GROUP BY 1)
          SELECT image_id,
            CAST(round(CAST(n*srg - sr*sg AS DOUBLE)
              / sqrt(CAST(n*srr - sr*sr AS DOUBLE)
                * (n*sgg - sg*sg)) * 1000000000.0, 0) AS BIGINT)
              AS r_nano,
            CAST(round(CAST(n*srg - sr*sg AS DOUBLE)
              / sqrt(CAST(n*srr - sr*sr AS DOUBLE)
                * (n*sgg - sg*sg)) * 1000000000.0, 0) AS BIGINT)
              > 990000000 AS grayish
          FROM c WHERE n*srr - sr*sr <> 0 AND n*sgg - sg*sg <> 0
          ORDER BY image_id""",
    "q150_stop_hotspots" ->
      // q133's dwell replay -> 64 m cell centers -> blocking-independent
      // brute argmin against the dumped track-domain segments
      s"""WITH t AS (SELECT walker_id, seq, ts_us,
              x // 64 AS cx, y // 64 AS cy FROM ${O.inp("tracks")}),
          b AS (SELECT *, CASE WHEN LAG(cx) OVER w = cx
                AND LAG(cy) OVER w = cy THEN 0 ELSE 1 END AS brk
            FROM t WINDOW w AS (PARTITION BY walker_id ORDER BY seq)),
          g AS (SELECT *, SUM(brk) OVER (PARTITION BY walker_id
              ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS grp FROM b),
          st AS (SELECT walker_id, cx, cy, MIN(ts_us) AS enter_us
            FROM g GROUP BY walker_id, grp, cx, cy
            HAVING COUNT(*) >= 10),
          pt AS (SELECT ${O.md5n(
              "CAST(walker_id AS VARCHAR) || '_' || CAST(enter_us AS VARCHAR)")}
              AS point_id, cx * 64 + 32 AS x, cy * 64 + 32 AS y FROM st),
          c AS (SELECT pt.point_id, s.seg_id,
              pt.x - s.x1 AS vx, pt.y - s.y1 AS vy,
              pt.x - s.x2 AS wx, pt.y - s.y2 AS wy,
              s.x2 - s.x1 AS dx, s.y2 - s.y1 AS dy
            FROM pt CROSS JOIN ${O.inp("seg_t")} s),
          dd AS (SELECT point_id, seg_id,
              CASE WHEN dx*dx + dy*dy = 0 OR vx*dx + vy*dy <= 0
                THEN CAST(vx*vx + vy*vy AS DOUBLE)
              WHEN vx*dx + vy*dy >= dx*dx + dy*dy
                THEN CAST(wx*wx + wy*wy AS DOUBLE)
              ELSE CAST((vx*dy - vy*dx)*(vx*dy - vy*dx) AS DOUBLE)
                / (dx*dx + dy*dy) END AS d2
            FROM c),
          f AS (SELECT point_id, seg_id, d2, ROW_NUMBER() OVER
              (PARTITION BY point_id ORDER BY d2 ASC, seg_id ASC) AS rn
            FROM dd WHERE d2 <= 4096.0)
          SELECT seg_id, CAST(COUNT(*) AS BIGINT) AS n_stops,
            MIN(d2) AS d2_min
          FROM f WHERE rn = 1 GROUP BY seg_id ORDER BY seg_id""",
    "q149_quadtree_zonal" ->
      // q128's leaf assignment verbatim, joined with raw luma recomputed
      // from the pixel dump and the same micro-meter rounding
      s"""WITH p AS (SELECT image_id,
              ${O.cell("anchor_x", "anchor_y", 16)} AS cmax,
              CAST(round(anchor_x * 1000000.0, 0) AS BIGINT) AS ax_micro,
              CAST(round(anchor_y * 1000000.0, 0) AS BIGINT) AS ay_micro
            FROM ${O.inp("images")}),
          e AS (SELECT image_id, cmax, l.l AS l,
              (l.l << 48) | ((cmax & 281474976710655) >> (2*(16 - l.l))) AS cell
            FROM p CROSS JOIN range(10, 17) l(l)),
          c AS (SELECT l, cell, COUNT(*) AS n FROM e GROUP BY 1, 2),
          leaf AS (SELECT e.image_id,
              COALESCE(MIN(CASE WHEN c.n <= 64 THEN e.l END), 16) AS ll,
              MIN(e.cmax) AS cmax
            FROM e JOIN c ON c.l = e.l AND c.cell = e.cell
            GROUP BY e.image_id),
          lum AS (SELECT image_id,
              CAST(SUM(299*px[j.j*3+1] + 587*px[j.j*3+2]
                + 114*px[j.j*3+3]) AS BIGINT) AS lum_sum
            FROM ${O.inp("pixels")}, range(0,256) AS j(j) GROUP BY 1)
          SELECT CAST(leaf.ll AS BIGINT) AS level,
            (leaf.ll << 48) | ((leaf.cmax & 281474976710655) >> (2*(16 - leaf.ll)))
              AS cell_id,
            CAST(COUNT(*) AS BIGINT) AS n_images,
            CAST(SUM(lum.lum_sum) AS BIGINT) AS lum_sum,
            CAST(SUM(p.ax_micro) AS BIGINT) AS ax_micro_sum,
            CAST(SUM(p.ay_micro) AS BIGINT) AS ay_micro_sum
          FROM leaf JOIN lum USING (image_id) JOIN p USING (image_id)
          GROUP BY 1, 2 ORDER BY level, cell_id""",
    "q148_ab_srm" ->
      // same md5 bucketing, same exact counts, same chi-square double
      // expression and 3.841 nano threshold
      s"""WITH u AS (SELECT user_id, MAX(CASE WHEN event_type = 'purchase'
               THEN 1 ELSE 0 END) AS converted FROM events GROUP BY 1),
          v AS (SELECT user_id, converted,
              ${O.md5n("'ab1' || CAST(user_id AS VARCHAR)")} % 2 AS variant
            FROM u),
          p AS (SELECT variant, COUNT(*)::BIGINT AS n_users,
              CAST(SUM(converted) AS BIGINT) AS n_converted
            FROM v GROUP BY 1),
          t AS (SELECT CAST(SUM(n_users) AS DOUBLE) / 2.0 AS e FROM p)
          SELECT p.variant, p.n_users, p.n_converted,
            CAST(round(((p.n_users - t.e) * (p.n_users - t.e) / t.e)
              * 2.0 * 1000000000.0, 0) AS BIGINT) AS chi2_nano,
            CAST(round(((p.n_users - t.e) * (p.n_users - t.e) / t.e)
              * 2.0 * 1000000000.0, 0) AS BIGINT) > 3841000000 AS srm
          FROM p CROSS JOIN t ORDER BY variant""",
    "q147_peak_concurrency" ->
      // q88's session assignment verbatim -> interval bounds -> grouped
      // boundary sweep; candidate = state after starts, before ends
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS ts_us
             FROM events),
         l AS (SELECT *, LAG(ts_us) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id) AS prev_us FROM e),
         g AS (SELECT *, CASE WHEN prev_us IS NOT NULL
               AND ts_us - prev_us > 1800000000 THEN 1 ELSE 0 END AS brk
             FROM l),
         sa AS (SELECT user_id, ts_us, SUM(brk) OVER (PARTITION BY user_id
               ORDER BY ts_us, event_id ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW) AS session_id FROM g),
         sb AS (SELECT user_id, session_id, MIN(ts_us) AS start_us,
               MAX(ts_us) AS end_us FROM sa GROUP BY 1, 2),
         b AS (SELECT us, SUM(p) AS plus, SUM(m) AS minus FROM (
             SELECT start_us AS us, 1 AS p, 0 AS m FROM sb
             UNION ALL SELECT end_us + 1, 0, 1 FROM sb) GROUP BY 1),
         c AS (SELECT us, SUM(plus - minus) OVER (ORDER BY us
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               + minus AS cand FROM b)
         SELECT CAST((SELECT MAX(cand) FROM c) AS BIGINT) AS peak,
           (SELECT MIN(us) FROM c
             WHERE cand = (SELECT MAX(cand) FROM c)) AS peak_us,
           (SELECT COUNT(*) FROM sb)::BIGINT AS n_sessions""",
    "q145_twap" ->
      // same (us, event_id)-ordered LEAD holds, same DECIMAL(18,6)
      // value cast, same exact sums
      """WITH e AS (SELECT user_id, event_id,
             CAST(value AS DECIMAL(18,6)) AS v, epoch_us(ts) AS us
             FROM events),
         h AS (SELECT user_id, v, us,
             LEAD(us) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS next_us FROM e)
         SELECT user_id,
           CAST(CAST(SUM(v * (next_us - us)) AS DECIMAL(28,6))
             AS VARCHAR) AS vt_sum,
           CAST(SUM(next_us - us) AS BIGINT) AS hold_us_sum,
           CAST(COUNT(*) AS BIGINT) AS n_holds
         FROM h WHERE next_us IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "q146_entropy" ->
      // same per-bin term: round(c * ln(n/c) / n * 1e9), integer-summed
      s"""WITH l AS (SELECT image_id,
              ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                // 1000) AS lum
            FROM ${O.inp("pixels")}, range(0,256) AS j(j)),
          h AS (SELECT image_id, lum, CAST(COUNT(*) AS BIGINT) AS c
                FROM l GROUP BY 1, 2),
          n AS (SELECT image_id, CAST(SUM(c) AS BIGINT) AS n
                FROM h GROUP BY 1)
          SELECT h.image_id,
            CAST(SUM(CAST(round(h.c * ln(CAST(n.n AS DOUBLE) / h.c)
              / n.n * 1000000000.0, 0) AS BIGINT)) AS BIGINT)
              AS entropy_nano
          FROM h JOIN n USING (image_id)
          GROUP BY 1 ORDER BY image_id""",
    "q143_retention" ->
      // same integer epoch-week floors, same first-signup anchor, same
      // distinct (user, week) activity set
      """WITH e AS (SELECT user_id, event_type,
             epoch_us(ts) AS us FROM events),
         c AS (SELECT user_id, MIN(us) // 604800000000 AS cohort_week
             FROM e WHERE event_type = 'signup' GROUP BY 1),
         a AS (SELECT DISTINCT user_id, us // 604800000000 AS week FROM e)
         SELECT c.cohort_week, a.week - c.cohort_week AS week_offset,
           CAST(COUNT(*) AS BIGINT) AS n_users
         FROM a JOIN c USING (user_id) WHERE a.week >= c.cohort_week
         GROUP BY 1, 2 ORDER BY cohort_week, week_offset""",
    "q144_transitions" ->
      // same (us, event_id)-ordered LEAD bigrams
      """WITH e AS (SELECT user_id, event_id, event_type,
             epoch_us(ts) AS us FROM events),
         b AS (SELECT event_type AS from_type,
             LEAD(event_type) OVER (PARTITION BY user_id
               ORDER BY us, event_id) AS to_type FROM e)
         SELECT from_type, to_type, CAST(COUNT(*) AS BIGINT) AS n
         FROM b WHERE to_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY from_type, to_type""",
    "q142_funnel" ->
      // same first-touch chain: earliest step-1 anchor, earliest
      // strictly-later qualifying event per step, 3-day horizon
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS us
             FROM events),
         s1 AS (SELECT user_id, MIN(us) AS t1 FROM e
             WHERE event_type = 'view' GROUP BY 1),
         s2 AS (SELECT e.user_id, s1.t1, MIN(e.us) AS t2
             FROM e JOIN s1 ON e.user_id = s1.user_id
               AND e.us > s1.t1 AND e.event_type = 'click'
             GROUP BY 1, 2 HAVING MIN(e.us) - s1.t1 <= 259200000000),
         s3 AS (SELECT e.user_id, s2.t1, MIN(e.us) AS t3
             FROM e JOIN s2 ON e.user_id = s2.user_id
               AND e.us > s2.t2 AND e.event_type = 'purchase'
             GROUP BY 1, 2 HAVING MIN(e.us) - s2.t1 <= 259200000000)
         SELECT CAST(1 AS BIGINT) AS step, 'view' AS step_name,
           (SELECT COUNT(*) FROM s1)::BIGINT AS n_users,
           CAST(0 AS BIGINT) AS lag_us_sum
         UNION ALL
         SELECT 2, 'click', (SELECT COUNT(*) FROM s2)::BIGINT,
           COALESCE((SELECT CAST(SUM(t2 - t1) AS BIGINT) FROM s2), 0)
         UNION ALL
         SELECT 3, 'purchase', (SELECT COUNT(*) FROM s3)::BIGINT,
           COALESCE((SELECT CAST(SUM(t3 - t1) AS BIGINT) FROM s3), 0)
         ORDER BY step""",
    "q141_phrase_index" ->
      // same tokenization, same consecutive-position trigram join, same
      // (count DESC, lexicographic) top-3, same per-doc occurrence counts
      """WITH t0x AS (SELECT doc_id, string_split(text, ' ') AS parts
             FROM documents),
         t1x AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS i,
             parts FROM t0x),
         t AS (SELECT doc_id, i - 1 AS pos, parts[i::INT] AS tok
           FROM t1x WHERE length(parts[i::INT]) > 0),
         tri AS (SELECT a.doc_id, a.pos, a.tok AS w0, b.tok AS w1,
             c.tok AS w2
           FROM t a
           JOIN t b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
           JOIN t c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
         top AS (SELECT w0, w1, w2 FROM (
             SELECT w0, w1, w2, ROW_NUMBER() OVER
               (ORDER BY COUNT(*) DESC, w0, w1, w2) AS rk
             FROM tri GROUP BY w0, w1, w2) WHERE rk <= 3)
         SELECT w0 || ' ' || w1 || ' ' || w2 AS phrase, tri.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_occ
         FROM tri JOIN top USING (w0, w1, w2)
         GROUP BY 1, 2 ORDER BY phrase, doc_id""",
    "q140_mad_outliers" ->
      // identical dual nearest-rank (ceil(0.5*n) over distinct-value
      // cumulative counts), identical integer threshold
      """WITH b AS (SELECT doc_id, source, CAST(n_chars AS BIGINT) AS value
             FROM documents),
         c1 AS (SELECT source, value, COUNT(*) AS c FROM b GROUP BY 1, 2),
         m1 AS (SELECT source, MIN(CASE WHEN cum >= ceil(0.5 * n)
               THEN value END) AS med
           FROM (SELECT source, value,
               SUM(c) OVER (PARTITION BY source ORDER BY value) AS cum,
               SUM(c) OVER (PARTITION BY source) AS n FROM c1)
           GROUP BY source),
         d AS (SELECT b.doc_id, b.source, b.value, m1.med,
             abs(b.value - m1.med) AS dev FROM b JOIN m1 USING (source)),
         c2 AS (SELECT source, dev, COUNT(*) AS c FROM d GROUP BY 1, 2),
         m2 AS (SELECT source, MIN(CASE WHEN cum >= ceil(0.5 * n)
               THEN dev END) AS mad
           FROM (SELECT source, dev,
               SUM(c) OVER (PARTITION BY source ORDER BY dev) AS cum,
               SUM(c) OVER (PARTITION BY source) AS n FROM c2)
           GROUP BY source)
         SELECT d.doc_id, d.source, d.value, d.med, CAST(m2.mad AS BIGINT)
             AS mad
         FROM d JOIN m2 USING (source)
         WHERE d.dev > 2 * m2.mad ORDER BY d.doc_id""",
    "q139_pmi" ->
      // same split (empty tokens dropped), same two shifts, same
      // marginals OVER ALL pairs (min support applies after), same
      // round(ln(...)*1e9) double expression
      """WITH t0 AS (SELECT doc_id, string_split(text, ' ') AS parts
             FROM documents),
         t1 AS (SELECT doc_id, unnest(range(1, len(parts) + 1)) AS i,
             parts FROM t0),
         t AS (SELECT doc_id, i - 1 AS pos, parts[i::INT] AS tok
           FROM t1 WHERE length(parts[i::INT]) > 0),
         pr AS (SELECT a.tok AS tok_a, b.tok AS tok_b
             FROM t a JOIN t b ON b.doc_id = a.doc_id
               AND (b.pos = a.pos + 1 OR b.pos = a.pos + 2)),
         pc AS (SELECT tok_a, tok_b, CAST(COUNT(*) AS BIGINT) AS n_ab
             FROM pr GROUP BY 1, 2),
         nn AS (SELECT CAST(SUM(n_ab) AS BIGINT) AS n FROM pc),
         cl AS (SELECT tok_a, CAST(SUM(n_ab) AS BIGINT) AS cl
             FROM pc GROUP BY 1),
         cr AS (SELECT tok_b, CAST(SUM(n_ab) AS BIGINT) AS cr
             FROM pc GROUP BY 1)
         SELECT pc.tok_a, pc.tok_b, pc.n_ab,
           CAST(round(ln(CAST(pc.n_ab * nn.n AS DOUBLE)
             / CAST(cl.cl * cr.cr AS DOUBLE)) * 1000000000.0, 0)
             AS BIGINT) AS pmi_nano
         FROM pc CROSS JOIN nn
         JOIN cl USING (tok_a) JOIN cr USING (tok_b)
         WHERE pc.n_ab >= 5 ORDER BY tok_a, tok_b""",
    "q138_budget_cut" ->
      // same md5 rank, same per-source ROWS cumsum, same
      // exclusive-prefix < budget keep rule
      """WITH r AS (SELECT doc_id, source, n_chars,
             md5('bc' || CAST(doc_id AS VARCHAR)) AS rk FROM documents),
         c AS (SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (PARTITION BY source ORDER BY rk, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
           FROM r)
         SELECT doc_id, source, CAST(n_chars AS BIGINT) AS weight,
           CAST(cum AS BIGINT) AS cum
         FROM c WHERE cum - n_chars < 4000 ORDER BY doc_id""",
    "q137_median" ->
      // same clipped neighborhoods by 9-offset equi-joins, same lower
      // median (1-based (k+1)//2 of the sorted list), same checksums
      s"""WITH l AS (SELECT image_id, (j.j % 16) AS x, (j.j // 16) AS y,
              ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                // 1000) AS l
            FROM ${O.inp("pixels")}, range(0,256) AS j(j)),
          n AS (SELECT a.image_id, a.x, a.y, b.l AS bl
            FROM l a
            CROSS JOIN range(-1,2) dx(dx) CROSS JOIN range(-1,2) dy(dy)
            JOIN l b ON b.image_id = a.image_id
              AND b.x = a.x + dx.dx AND b.y = a.y + dy.dy),
          m AS (SELECT image_id, x, y,
              list_sort(list(bl))[(COUNT(*) + 1) // 2] AS med
            FROM n GROUP BY 1, 2, 3)
          SELECT image_id, CAST(SUM(med) AS BIGINT) AS med_sum,
            CAST(SUM(med * (y*16 + x + 1)) AS BIGINT) AS med_posw
          FROM m GROUP BY 1 ORDER BY image_id""",
    "q136_kde" ->
      // same floor cells, same separable 4-2-1 kernel, same domain clamp
      s"""WITH p AS (SELECT CAST(floor(anchor_x / 64.0) AS BIGINT) AS ix,
              CAST(floor(anchor_y / 64.0) AS BIGINT) AS iy
            FROM ${O.inp("images")}),
          s AS (SELECT ix + dx.dx AS cx, iy + dy.dy AS cy,
              (CASE abs(dx.dx) WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END)
              * (CASE abs(dy.dy) WHEN 0 THEN 4 WHEN 1 THEN 2 ELSE 1 END)
                AS w
            FROM p CROSS JOIN range(-2, 3) dx(dx)
            CROSS JOIN range(-2, 3) dy(dy))
          SELECT cx, cy, CAST(SUM(w) AS BIGINT) AS density
          FROM s WHERE cx >= 0 AND cy >= 0 AND cx < 16384 AND cy < 16384
          GROUP BY cx, cy ORDER BY cx, cy""",
    "q134_cdc" ->
      // inserts = fresh %3=2 keys; deletes = %9=0 keys not re-inserted;
      // updates = %18=0 keys re-inserted with the new payload
      s"""SELECT doc_id, 'insert' AS change_type,
            CAST(-1 AS BIGINT) AS pre_h, ${O.md5n("text")} AS post_h
          FROM documents WHERE doc_id % 3 = 2
          UNION ALL
          SELECT doc_id, 'delete', ${O.md5n("text")}, CAST(-1 AS BIGINT)
          FROM documents WHERE doc_id % 9 = 0 AND doc_id % 18 <> 0
          UNION ALL
          SELECT doc_id, 'update', ${O.md5n("text")},
            ${O.md5n("'updated: ' || text")}
          FROM documents WHERE doc_id % 18 = 0
          ORDER BY doc_id""",
    "q133_stops" ->
      // verbatim replay: same floor-div cells, same LAG break test, same
      // running-sum run ids, same HAVING threshold
      s"""WITH t AS (SELECT walker_id, seq, ts_us,
              x // 64 AS cx, y // 64 AS cy
            FROM ${O.inp("tracks")}),
          b AS (SELECT *, CASE WHEN LAG(cx) OVER w = cx
                AND LAG(cy) OVER w = cy THEN 0 ELSE 1 END AS brk
            FROM t WINDOW w AS (PARTITION BY walker_id ORDER BY seq)),
          g AS (SELECT *, SUM(brk) OVER (PARTITION BY walker_id
              ORDER BY seq ROWS BETWEEN UNBOUNDED PRECEDING AND
              CURRENT ROW) AS grp FROM b)
          SELECT walker_id, CAST(cx AS BIGINT) AS cx,
            CAST(cy AS BIGINT) AS cy,
            MIN(ts_us) AS enter_us, MAX(ts_us) AS exit_us,
            CAST(COUNT(*) AS BIGINT) AS n_points
          FROM g GROUP BY walker_id, grp, cx, cy
          HAVING COUNT(*) >= 10
          ORDER BY walker_id, enter_us""",
    "q132_snap" ->
      // exact same piecewise distance (endpoint / projection arms, one
      // IEEE division), same radius filter and (d2, seg_id) argmin
      s"""WITH c AS (SELECT p.point_id, s.seg_id,
              p.x - s.x1 AS vx, p.y - s.y1 AS vy,
              p.x - s.x2 AS wx, p.y - s.y2 AS wy,
              s.x2 - s.x1 AS dx, s.y2 - s.y1 AS dy
            FROM ${O.inp("snap_points")} p
            CROSS JOIN ${O.inp("seg_a")} s),
          d AS (SELECT point_id, seg_id,
              CASE WHEN dx*dx + dy*dy = 0 OR vx*dx + vy*dy <= 0
                THEN CAST(vx*vx + vy*vy AS DOUBLE)
              WHEN vx*dx + vy*dy >= dx*dx + dy*dy
                THEN CAST(wx*wx + wy*wy AS DOUBLE)
              ELSE CAST((vx*dy - vy*dx)*(vx*dy - vy*dx) AS DOUBLE)
                / (dx*dx + dy*dy) END AS d2
            FROM c),
          f AS (SELECT point_id, seg_id, d2, ROW_NUMBER() OVER
              (PARTITION BY point_id ORDER BY d2 ASC, seg_id ASC) AS rn
            FROM d WHERE d2 <= 4096.0)
          SELECT point_id, seg_id, d2 FROM f WHERE rn = 1
          ORDER BY point_id""",
    "q131_otsu" ->
      // same candidate set (populated bins + 1), same exact score, same
      // first-maximum tie-break via (score DESC, t ASC)
      s"""WITH l AS (SELECT image_id,
              ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                // 1000) AS lum
            FROM ${O.inp("pixels")}, range(0,256) AS j(j)),
          h AS (SELECT image_id, lum, CAST(COUNT(*) AS BIGINT) AS c
                FROM l GROUP BY 1, 2),
          tot AS (SELECT image_id, CAST(SUM(c) AS BIGINT) AS n,
                CAST(SUM(c * lum) AS BIGINT) AS stot FROM h GROUP BY 1),
          cum AS (SELECT image_id, lum,
              CAST(SUM(c) OVER w AS BIGINT) AS c0,
              CAST(SUM(c * lum) OVER w AS BIGINT) AS s0
            FROM h WINDOW w AS (PARTITION BY image_id ORDER BY lum
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
          sc AS (SELECT cum.image_id, cum.lum + 1 AS t,
              tot.n - cum.c0 AS c1, tot.stot - cum.s0 AS s1,
              CAST((cum.s0*(tot.n - cum.c0)
                  - (tot.stot - cum.s0)*cum.c0)
                * (cum.s0*(tot.n - cum.c0)
                  - (tot.stot - cum.s0)*cum.c0) AS DOUBLE)
                / (cum.c0 * (tot.n - cum.c0)) AS score
            FROM cum JOIN tot USING (image_id)
            WHERE tot.n - cum.c0 > 0),
          best AS (SELECT image_id, t, c1, s1, ROW_NUMBER() OVER
              (PARTITION BY image_id ORDER BY score DESC, t ASC) AS rn
            FROM sc)
          SELECT image_id, CAST(t AS BIGINT) AS otsu_t,
            c1 AS n_fg, s1 AS fg_luma_sum
          FROM best WHERE rn = 1 ORDER BY image_id""",
    "q130_hilbert_skip" ->
      // pruning legs replay as plain filters (equality proves no pruned
      // scan lost rows, `skipped` pinned TRUE); the key leg replays the
      // 8 xy2d rotation steps as chained CTEs — same integer math
      s"""WITH h0 AS (SELECT doc_id, doc_id % 256 AS x, n_chars % 256 AS y,
            CAST(0 AS BIGINT) AS d FROM documents),
          h1 AS (SELECT doc_id,
            CASE WHEN (y & 128) = 0 THEN CASE WHEN (x & 128) > 0
              THEN 128-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 128) = 0 THEN CASE WHEN (x & 128) > 0
              THEN 128-1-x ELSE x END ELSE y END AS y,
            d + 16384 * xor(CASE WHEN (x & 128) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 128) > 0 THEN 1 ELSE 0 END) AS d
          FROM h0),
          h2 AS (SELECT doc_id,
            CASE WHEN (y & 64) = 0 THEN CASE WHEN (x & 64) > 0
              THEN 64-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 64) = 0 THEN CASE WHEN (x & 64) > 0
              THEN 64-1-x ELSE x END ELSE y END AS y,
            d + 4096 * xor(CASE WHEN (x & 64) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 64) > 0 THEN 1 ELSE 0 END) AS d
          FROM h1),
          h3 AS (SELECT doc_id,
            CASE WHEN (y & 32) = 0 THEN CASE WHEN (x & 32) > 0
              THEN 32-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 32) = 0 THEN CASE WHEN (x & 32) > 0
              THEN 32-1-x ELSE x END ELSE y END AS y,
            d + 1024 * xor(CASE WHEN (x & 32) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 32) > 0 THEN 1 ELSE 0 END) AS d
          FROM h2),
          h4 AS (SELECT doc_id,
            CASE WHEN (y & 16) = 0 THEN CASE WHEN (x & 16) > 0
              THEN 16-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 16) = 0 THEN CASE WHEN (x & 16) > 0
              THEN 16-1-x ELSE x END ELSE y END AS y,
            d + 256 * xor(CASE WHEN (x & 16) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 16) > 0 THEN 1 ELSE 0 END) AS d
          FROM h3),
          h5 AS (SELECT doc_id,
            CASE WHEN (y & 8) = 0 THEN CASE WHEN (x & 8) > 0
              THEN 8-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 8) = 0 THEN CASE WHEN (x & 8) > 0
              THEN 8-1-x ELSE x END ELSE y END AS y,
            d + 64 * xor(CASE WHEN (x & 8) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 8) > 0 THEN 1 ELSE 0 END) AS d
          FROM h4),
          h6 AS (SELECT doc_id,
            CASE WHEN (y & 4) = 0 THEN CASE WHEN (x & 4) > 0
              THEN 4-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 4) = 0 THEN CASE WHEN (x & 4) > 0
              THEN 4-1-x ELSE x END ELSE y END AS y,
            d + 16 * xor(CASE WHEN (x & 4) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 4) > 0 THEN 1 ELSE 0 END) AS d
          FROM h5),
          h7 AS (SELECT doc_id,
            CASE WHEN (y & 2) = 0 THEN CASE WHEN (x & 2) > 0
              THEN 2-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 2) = 0 THEN CASE WHEN (x & 2) > 0
              THEN 2-1-x ELSE x END ELSE y END AS y,
            d + 4 * xor(CASE WHEN (x & 2) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 2) > 0 THEN 1 ELSE 0 END) AS d
          FROM h6),
          h8 AS (SELECT doc_id,
            CASE WHEN (y & 1) = 0 THEN CASE WHEN (x & 1) > 0
              THEN 1-1-y ELSE y END ELSE x END AS x,
            CASE WHEN (y & 1) = 0 THEN CASE WHEN (x & 1) > 0
              THEN 1-1-x ELSE x END ELSE y END AS y,
            d + 1 * xor(CASE WHEN (x & 1) > 0 THEN 3 ELSE 0 END,
              CASE WHEN (y & 1) > 0 THEN 1 ELSE 0 END) AS d
          FROM h7)
          SELECT 'doc_id' AS dim, COUNT(*)::BIGINT AS n_rows,
            CAST(SUM(doc_id) AS BIGINT) AS id_sum,
            CAST(SUM(n_chars) AS BIGINT) AS chars_sum, TRUE AS skipped
          FROM documents WHERE doc_id BETWEEN 100 AND 140
          UNION ALL
          SELECT 'key_xor', COUNT(*)::BIGINT, bit_xor(d), 0, TRUE FROM h8
          UNION ALL
          SELECT 'n_chars', COUNT(*)::BIGINT, CAST(SUM(doc_id) AS BIGINT),
            CAST(SUM(n_chars) AS BIGINT), TRUE
          FROM documents WHERE n_chars BETWEEN 150 AND 300
          ORDER BY dim""",
    "q129_seg_crossings" ->
      // proper crossing iff both segments strictly separate each other's
      // endpoints: products of integer orientation determinants < 0
      s"""SELECT a.seg_id AS a_id, b.seg_id AS b_id
          FROM ${O.inp("seg_a")} a CROSS JOIN ${O.inp("seg_b")} b
          WHERE ((a.x2-a.x1)*(b.y1-a.y1) - (a.y2-a.y1)*(b.x1-a.x1))
              * ((a.x2-a.x1)*(b.y2-a.y1) - (a.y2-a.y1)*(b.x2-a.x1)) < 0
            AND ((b.x2-b.x1)*(a.y1-b.y1) - (b.y2-b.y1)*(a.x1-b.x1))
              * ((b.x2-b.x1)*(a.y2-b.y1) - (b.y2-b.y1)*(a.x2-b.x1)) < 0
          ORDER BY a_id, b_id""",
    "q128_quadtree" ->
      // same finest-level Morton id, same ancestor shifts, same
      // first-fitting-level rule with the monotone-counts collapse
      s"""WITH p AS (SELECT image_id,
              ${O.cell("anchor_x", "anchor_y", 16)} AS cmax
            FROM ${O.inp("images")}),
          e AS (SELECT image_id, cmax, l.l AS l,
              (l.l << 48) | ((cmax & 281474976710655) >> (2*(16 - l.l))) AS cell
            FROM p CROSS JOIN range(10, 17) l(l)),
          c AS (SELECT l, cell, COUNT(*) AS n FROM e GROUP BY 1, 2),
          leaf AS (SELECT e.image_id,
              COALESCE(MIN(CASE WHEN c.n <= 64 THEN e.l END), 16) AS ll,
              MIN(e.cmax) AS cmax
            FROM e JOIN c ON c.l = e.l AND c.cell = e.cell
            GROUP BY e.image_id)
          SELECT CAST(ll AS BIGINT) AS level,
            (ll << 48) | ((cmax & 281474976710655) >> (2*(16 - ll))) AS cell_id,
            CAST(COUNT(*) AS BIGINT) AS n_points
          FROM leaf GROUP BY 1, 2 ORDER BY level, cell_id""",
    "q127_morphology" ->
      // same integer luma, clipped 3x3 min/max via 9 offset equi-joins,
      // same per-tile rollup with the ring-0 edge count
      s"""WITH pxl AS (SELECT tile_x*16 + (j.j % 16) AS wx,
              tile_y*16 + (j.j // 16) AS wy,
              (299*px[j.j*3+1] + 587*px[j.j*3+2]
                + 114*px[j.j*3+3]) // 1000 AS l
            FROM ${O.inp("mosaic_pixels")}, range(0,256) j(j)),
          m AS (SELECT a.wx, a.wy, MIN(b.l) AS ero, MAX(b.l) AS dil
            FROM pxl a
            CROSS JOIN range(-1,2) dx(dx) CROSS JOIN range(-1,2) dy(dy)
            JOIN pxl b ON b.wx = a.wx + dx.dx AND b.wy = a.wy + dy.dy
            GROUP BY a.wx, a.wy)
          SELECT CAST(wx // 16 AS BIGINT) AS tile_x,
            CAST(wy // 16 AS BIGINT) AS tile_y,
            CAST(SUM(ero) AS BIGINT) AS ero_sum,
            CAST(SUM(dil) AS BIGINT) AS dil_sum,
            CAST(SUM(CASE WHEN wx % 16 IN (0, 15) OR wy % 16 IN (0, 15)
              THEN 1 ELSE 0 END) AS BIGINT) AS n_edge
          FROM m GROUP BY 1, 2 ORDER BY tile_x, tile_y""",
    "q126_merge_on_read" ->
      // survivors by commit arithmetic: s1 keeps doc_id%8 in (4,5), s2
      // keeps %8=6, the s3 delete wipes %8 in (0,1,2) from s1/s2, s4
      // re-inserts %16=0 above the delete sequence
      s"""SELECT doc_id, CAST(1 AS BIGINT) AS src_seq,
            ${O.md5n("text")} AS text_h, TRUE AS compact_equal
          FROM documents WHERE doc_id % 8 IN (4, 5)
          UNION ALL
          SELECT doc_id, CAST(2 AS BIGINT), ${O.md5n("text")}, TRUE
          FROM documents WHERE doc_id % 8 = 6
          UNION ALL
          SELECT doc_id, CAST(4 AS BIGINT),
            ${O.md5n("'reinserted: ' || text")}, TRUE
          FROM documents WHERE doc_id % 16 = 0
          ORDER BY doc_id, src_seq""",
    "q125_dup_spans" ->
      // full replay: same 60-bit gram hash, same >=2 global count, same
      // gap<=L island merge via LAG + ROWS-framed running sum
      s"""WITH c AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM ${O.inp("incr_docs")}),
          g AS (SELECT doc_id,
                  unnest(range(1, length(text) - 30 + 2)) AS pos, text
                FROM c WHERE length(text) >= 30),
          h AS (SELECT doc_id, pos,
                  ${O.md5n("substr(text, pos::INT, 30)")} AS h60 FROM g),
          d AS (SELECT h60 FROM h GROUP BY 1 HAVING COUNT(*) >= 2),
          m AS (SELECT doc_id, pos FROM h
                WHERE h60 IN (SELECT h60 FROM d)),
          b AS (SELECT doc_id, pos,
                  CASE WHEN pos - LAG(pos) OVER
                    (PARTITION BY doc_id ORDER BY pos) > 30
                  THEN 1 ELSE 0 END AS brk FROM m),
          s AS (SELECT doc_id, pos,
                  SUM(brk) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                FROM b)
          SELECT doc_id, MIN(pos) AS span_start,
            MAX(pos) + 29 AS span_end,
            MAX(pos) + 29 - MIN(pos) + 1 AS span_chars,
            CAST(COUNT(*) AS BIGINT) AS n_grams
          FROM s GROUP BY doc_id, sid
          ORDER BY doc_id, span_start""",
    "q124_winnowing" ->
      // full winnowing replay: same 40-bit hash, same packed min key,
      // same full-window filter, same containment threshold
      s"""WITH c AS (SELECT doc_id, text FROM documents
                     UNION ALL SELECT doc_id, text FROM ${O.inp("incr_docs")}),
          g AS (SELECT doc_id,
                  unnest(range(1, length(text) - 12 + 2)) AS pos, text
                FROM c WHERE length(text) >= 12),
          h AS (SELECT doc_id, pos,
                  (${O.md5n("substr(text, pos::INT, 12)")})
                    % 1099511627776 AS h40,
                  CAST(COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS ng
                FROM g),
          k AS (SELECT doc_id, pos, ng,
                  h40 * 1048576 + (1048575 - pos) AS key FROM h),
          w AS (SELECT doc_id, pos, ng,
                  MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND 7 FOLLOWING) AS wkey
                FROM k),
          f AS (SELECT DISTINCT doc_id, wkey // 1048576 AS fh FROM w
                WHERE pos <= ng - 8 + 1),
          n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nf
                FROM f GROUP BY 1),
          m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                  CAST(COUNT(*) AS BIGINT) AS n_shared
                FROM f a JOIN f b ON a.fh = b.fh AND a.doc_id < b.doc_id
                GROUP BY 1, 2)
          SELECT m.doc_a, m.doc_b, m.n_shared,
            CAST(100 * m.n_shared // LEAST(na.nf, nb.nf) AS BIGINT)
              AS containment_pct
          FROM m JOIN n na ON na.doc_id = m.doc_a
                 JOIN n nb ON nb.doc_id = m.doc_b
          WHERE 100 * m.n_shared >= 50 * LEAST(na.nf, nb.nf)
          ORDER BY m.doc_a, m.doc_b""",
    "q122_pcm_resample" ->
      // per-output-sample integer blend replay from the source samples
      s"""WITH o AS (SELECT clip_id, samples, k.k AS k,
            LEAST((k.k * 341) // 256, len(samples) - 2) AS x0,
            (k.k * 341)
              - LEAST((k.k * 341) // 256, len(samples) - 2) * 256 AS f
          FROM ${O.inp("audio_samples")}, range(0,1200) k(k)),
          v AS (SELECT clip_id, k,
              ((samples[x0 + 1] + 32768) * (256 - f)
               + (samples[x0 + 2] + 32768) * f + 128) // 256 - 32768 AS val
            FROM o)
          SELECT clip_id, CAST(1200 AS BIGINT) AS n_out,
            CAST(SUM(val) AS BIGINT) AS v_sum,
            CAST(SUM(val * (k + 1)) AS BIGINT) AS vw_sum
          FROM v GROUP BY clip_id ORDER BY clip_id""",
    "q123_audio_features" ->
      // sign products, peak, and |sample| sums from the source samples
      s"""WITH e AS (SELECT clip_id,
              unnest(range(1, len(samples) + 1)) AS i, samples
            FROM ${O.inp("audio_samples")})
          SELECT clip_id, CAST(COUNT(*) AS BIGINT) AS n_samples,
            CAST(SUM(CASE WHEN i > 1 AND samples[i - 1] * samples[i] < 0
              THEN 1 ELSE 0 END) AS BIGINT) AS zcr,
            CAST(MAX(ABS(samples[i])) AS BIGINT) AS peak,
            CAST(SUM(ABS(samples[i])) AS BIGINT) AS abs_sum
          FROM e GROUP BY clip_id ORDER BY clip_id""",
    "q121_bilinear" ->
      // per-output-pixel integer bilinear replay: fixed-point positions,
      // LEAST clamp, exact // 65536 blend — mirrored from the typed loop
      s"""WITH src AS (SELECT image_id, px FROM ${O.inp("pixels")}
                       WHERE CAST(SUBSTR(image_id, 4) AS BIGINT) % 10 = 0),
          o AS (SELECT image_id, px, i.i AS i, j.j AS j, c.c AS c,
                  LEAST((i.i * 341 + 42) // 256, 14) AS x0,
                  LEAST((j.j * 341 + 42) // 256, 14) AS y0,
                  (i.i * 341 + 42)
                    - LEAST((i.i * 341 + 42) // 256, 14) * 256 AS fx,
                  (j.j * 341 + 42)
                    - LEAST((j.j * 341 + 42) // 256, 14) * 256 AS fy
                FROM src, range(0,12) i(i), range(0,12) j(j),
                     range(0,3) c(c)),
          v AS (SELECT image_id, i, j, c,
                  ((256 - fx) * (256 - fy) * px[(y0*16 + x0)*3 + c + 1]
                   + fx * (256 - fy) * px[(y0*16 + x0 + 1)*3 + c + 1]
                   + (256 - fx) * fy * px[((y0+1)*16 + x0)*3 + c + 1]
                   + fx * fy * px[((y0+1)*16 + x0 + 1)*3 + c + 1]
                   + 32768) // 65536 AS val
                FROM o)
          SELECT image_id, CAST(12 AS BIGINT) AS out_w,
            CAST(12 AS BIGINT) AS out_h,
            CAST(SUM(val) AS BIGINT) AS v_sum,
            CAST(SUM(val * ((j*12 + i)*3 + c + 1)) AS BIGINT) AS vw_sum
          FROM v GROUP BY image_id ORDER BY image_id""",
    "q120_marching_squares" ->
      // every 2×2 world cell by 4-way self-join on world ordinals; same
      // TL+2·TR+4·BR+8·BL case bits, same saddle segment table
      s"""WITH pxl AS (SELECT tile_x*16 + (j.j % 16) AS wx,
              tile_y*16 + (j.j // 16) AS wy,
              CASE WHEN ((299*px[j.j*3+1] + 587*px[j.j*3+2]
                + 114*px[j.j*3+3]) // 1000) >= 128 THEN 1 ELSE 0 END AS b
            FROM ${O.inp("mosaic_pixels")}, range(0,256) j(j)),
          n AS (SELECT wy*4194304 + wx AS p, wx, wy, b FROM pxl),
          cells AS (SELECT a.wx, a.wy,
              (a.wx % 16 = 15 OR a.wy % 16 = 15) AS straddle,
              a.b + 2*r.b + 4*dr.b + 8*d.b AS ms_case
            FROM n a JOIN n r ON r.p = a.p + 1 AND r.wy = a.wy
                   JOIN n d ON d.p = a.p + 4194304
                   JOIN n dr ON dr.p = a.p + 4194305 AND dr.wy = a.wy + 1)
          SELECT CAST(ms_case AS BIGINT) AS ms_case,
            CAST(COUNT(*) AS BIGINT) AS n_cells,
            CAST(SUM(CASE WHEN straddle THEN 1 ELSE 0 END) AS BIGINT)
              AS n_straddle,
            CAST(COUNT(*) * (CASE WHEN ms_case IN (0,15) THEN 0
              WHEN ms_case IN (5,10) THEN 2 ELSE 1 END) AS BIGINT)
              AS n_segments
          FROM cells GROUP BY ms_case ORDER BY ms_case""",
    "q119_haversine" ->
      // blocking-independent brute force: every ordered pair through the
      // mirrored haversine expression tree, meters-rounded, same rollup
      s"""WITH p AS (SELECT image_id, anchor_x / 1000.0 AS lon,
                       anchor_y / 1000.0 AS lat
                     FROM ${O.inp("images")}
                     WHERE CAST(SUBSTR(image_id, 4) AS BIGINT) % 10 = 0),
          d AS (SELECT a.image_id AS ia,
                  CAST(round(2.0 * 6371000.0 * asin(sqrt(
                    sin((radians(b.lat) - radians(a.lat)) / 2)
                      * sin((radians(b.lat) - radians(a.lat)) / 2)
                    + cos(radians(a.lat)) * cos(radians(b.lat))
                      * sin((radians(b.lon) - radians(a.lon)) / 2)
                      * sin((radians(b.lon) - radians(a.lon)) / 2))), 0)
                    AS BIGINT) AS dm
                FROM p a JOIN p b ON a.image_id <> b.image_id)
          SELECT ia AS image_id, CAST(COUNT(*) AS BIGINT) AS n_nbr,
            CAST(SUM(dm) AS BIGINT) AS sum_dist_m,
            CAST(MIN(dm) AS BIGINT) AS min_dist_m
          FROM d WHERE dm <= 500 GROUP BY ia ORDER BY ia""",
    "q118_phash" ->
      // full pHash replay: the same 1e6-rounded cosine table (every entry
      // ≥ 0.03 from a rounding boundary — libm-portable), integer DCT
      // sums, 32nd-smallest median, bit packing
      s"""WITH ct AS (SELECT x.x AS x, u.u AS u,
            CAST(round(cos(pi() * (2*x.x + 1) * u.u / 32) * 1000000, 0)
              AS BIGINT) AS c
          FROM range(0,16) x(x), range(0,8) u(u)),
          l AS (SELECT image_id, (j.j % 16) AS x, (j.j // 16) AS y,
                  ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                    // 1000) AS lum
                FROM ${O.inp("pixels")}, range(0,256) AS j(j)
                WHERE CAST(SUBSTR(image_id, 4) AS BIGINT) % 40 = 0),
          d AS (SELECT l.image_id, cu.u AS u, cv.u AS v,
                  SUM(l.lum * cu.c * cv.c) AS coef
                FROM l JOIN ct cu ON cu.x = l.x JOIN ct cv ON cv.x = l.y
                GROUP BY 1, 2, 3),
          ac AS (SELECT image_id, u, v, coef FROM d
                 WHERE NOT (u = 0 AND v = 0)),
          md AS (SELECT image_id, coef AS med FROM (
                   SELECT image_id, coef, ROW_NUMBER() OVER (
                     PARTITION BY image_id ORDER BY coef, u, v) AS rn
                   FROM ac) WHERE rn = 32)
          SELECT ac.image_id,
            CAST(SUM(CASE WHEN ac.coef > md.med
              THEN (1::BIGINT << (ac.v*8 + ac.u - 1)) ELSE 0 END) AS BIGINT)
              AS phash,
            CAST(SUM(CASE WHEN ac.coef > md.med THEN 1 ELSE 0 END)
              AS BIGINT) AS n_above
          FROM ac JOIN md USING (image_id) GROUP BY 1
          ORDER BY ac.image_id""",
    "q117_geohash" ->
      // bit-exact geohash replay: quantize → interleave (lon first) →
      // base32 via substr — every shift mirrored from the Spark column tree
      s"""WITH a AS (SELECT image_id, anchor_x, anchor_y,
            LEAST(CAST(FLOOR((anchor_x / 1000.0 + 180.0) / 360.0
              * 1048576.0) AS BIGINT), 1048575) AS xn,
            LEAST(CAST(FLOOR((anchor_y / 1000.0 + 90.0) / 180.0
              * 1048576.0) AS BIGINT), 1048575) AS yn
          FROM ${O.inp("images")}),
          b AS (SELECT image_id, anchor_x, anchor_y, ${
            (0 until 20).map(k =>
              s"(((xn >> ${19 - k}) & 1) << ${39 - 2 * k}) | " +
              s"(((yn >> ${19 - k}) & 1) << ${38 - 2 * k})").mkString(" | ")
          } AS inter FROM a),
          g AS (SELECT image_id, anchor_x, anchor_y, ${
            (0 until 8).map(i =>
              "substr('0123456789bcdefghjkmnpqrstuvwxyz', " +
              s"CAST(((inter >> ${35 - 5 * i}) & 31) + 1 AS INT), 1)")
              .mkString(" || ")
          } AS gh FROM b)
          SELECT substr(gh, 1, 5) AS gh5, CAST(COUNT(*) AS BIGINT)
              AS n_images,
            MIN(anchor_x) AS min_x, MAX(anchor_x) AS max_x,
            MIN(anchor_y) AS min_y, MAX(anchor_y) AS max_y
          FROM g GROUP BY 1 ORDER BY 1""",
    "q116_dsir_resample" ->
      // full DSIR replay: bigram positions → 60-bit md5 buckets →
      // smoothed ln ratio in nano-nats → per-doc integer sums
      s"""WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS tk
                     FROM documents),
          g AS (SELECT doc_id, source,
                  unnest(CASE WHEN len(tk) >= 2 THEN
                    list_transform(range(1, len(tk)),
                      i -> tk[i] || ' ' || tk[i+1]) ELSE [] END) AS gram
                FROM t),
          gb AS (SELECT doc_id, source, ${O.md5n("gram")} % 1024 AS b
                 FROM g),
          c AS (SELECT b,
                  SUM(CASE WHEN source = 'src0' THEN 1 ELSE 0 END) AS ref_n,
                  COUNT(*) AS raw_n FROM gb GROUP BY b),
          tot AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS rt,
                         CAST(SUM(raw_n) AS BIGINT) AS qt FROM c),
          w AS (SELECT b, CAST(round(
                  (ln((ref_n + 1.0) / ((SELECT rt FROM tot) + 1024.0))
                   - ln((raw_n + 1.0) / ((SELECT qt FROM tot) + 1024.0)))
                  * 1000000000.0, 0) AS BIGINT) AS w_nano FROM c),
          s AS (SELECT gb.doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
                  CAST(SUM(w.w_nano) AS BIGINT) AS score_nano
                FROM gb JOIN w USING (b) GROUP BY 1)
          SELECT d.doc_id, COALESCE(s.n_grams, 0) AS n_grams,
            COALESCE(s.score_nano, 0) AS score_nano,
            COALESCE(s.score_nano, 0) > 0 AS keep
          FROM documents d LEFT JOIN s USING (doc_id)
          ORDER BY d.doc_id""",
    "q115_hist_equalize" ->
      // histogram → ROWS-frame CDF → first-bin cdf_min → exact integer
      // floor remap, per image, over the decoded pixel dump
      s"""WITH l AS (
            SELECT image_id,
              ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                // 1000) AS lum
            FROM ${O.inp("pixels")}, range(0, 256) AS j(j)
            WHERE CAST(SUBSTR(image_id, 4) AS BIGINT) % 40 = 0),
          h AS (SELECT image_id, lum, CAST(COUNT(*) AS BIGINT) AS n
                FROM l GROUP BY 1, 2),
          c AS (SELECT image_id, lum, n,
                  SUM(n) OVER (PARTITION BY image_id ORDER BY lum
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cdf,
                  SUM(n) OVER (PARTITION BY image_id) AS npx,
                  FIRST_VALUE(n) OVER (PARTITION BY image_id ORDER BY lum)
                    AS cdfmin
                FROM h)
          SELECT image_id, CAST(lum AS BIGINT) AS lum, n,
            CAST(cdf AS BIGINT) AS cdf,
            CAST(CASE WHEN npx > cdfmin
                 THEN (cdf - cdfmin) * 255 // (npx - cdfmin)
                 ELSE 0 END AS BIGINT) AS eq
          FROM c ORDER BY image_id, lum""",
    "q114_raster_cc" ->
      // whole-raster pixel CCL from first principles: decoded dump →
      // integer BT.601 mask → 4-adjacency edges by world ordinal
      // (wy·2^22 + wx) → transitive-closure CTE (the q62 machinery over
      // a pixel graph) → per-component rollup
      s"""WITH RECURSIVE pxl AS (
            SELECT tile_x*16 + (j.j % 16) AS wx,
                   tile_y*16 + (j.j // 16) AS wy,
                   ((299*px[j.j*3+1] + 587*px[j.j*3+2] + 114*px[j.j*3+3])
                     // 1000) AS lum
            FROM ${O.inp("mosaic_pixels")}, range(0, 256) AS j(j)),
          nodes AS (SELECT wy*4194304 + wx AS p, wx, wy, lum FROM pxl
                    WHERE lum >= 128),
          e AS (SELECT a.p AS a, b.p AS b FROM nodes a JOIN nodes b
                  ON b.p = a.p + 1 AND b.wy = a.wy
                UNION ALL
                SELECT a.p, b.p FROM nodes a JOIN nodes b
                  ON b.p = a.p + 4194304),
          sym AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
          reach(v, r) AS (
            SELECT p, p FROM nodes
            UNION
            SELECT sym.b, reach.r FROM reach JOIN sym ON sym.a = reach.v),
          comp AS (SELECT v, MIN(r) AS component FROM reach GROUP BY v)
          SELECT c.component, CAST(COUNT(*) AS BIGINT) AS n_px,
            CAST(COUNT(DISTINCT (n.wy // 16) * 1024 + (n.wx // 16))
              AS BIGINT) AS n_tiles,
            CAST(MIN(n.wx) AS BIGINT) AS min_wx,
            CAST(MIN(n.wy) AS BIGINT) AS min_wy,
            CAST(MAX(n.wx) AS BIGINT) AS max_wx,
            CAST(MAX(n.wy) AS BIGINT) AS max_wy,
            CAST(SUM(n.lum) AS BIGINT) AS lum_sum
          FROM comp c JOIN nodes n ON n.p = c.v
          GROUP BY c.component ORDER BY c.component""",
    "q113_pair_verify" ->
      // the q51 pair derivation (dHash + pigeonhole blocking + exact
      // hamming, replayed in full), then the exact SAD fold over both
      // pair members' decoded pixel lists
      s"""WITH dh_im AS (SELECT i.image_id, i.w, i.h, p.px
                         FROM ${O.inp("images")} i
                         JOIN ${O.inp("pixels")} p USING (image_id)
                         UNION ALL
                         SELECT image_id, w, h, px FROM ${O.inp("dup_pixels")}),
          $dhashCtes,
          g AS (SELECT bits, MIN(image_id) AS rep FROM dh_bits GROUP BY bits),
          gp AS (SELECT g.rep AS img_a, d.image_id AS img_b
                 FROM dh_bits d JOIN g USING (bits) WHERE d.image_id <> g.rep),
          ch AS (SELECT rep, bits, ci.ci AS ci,
                   substr(bits, ci * 16 + 1, 16) AS chunk
                 FROM g, range(0, 4) AS ci(ci)),
          cand AS (SELECT DISTINCT a.rep AS img_a, b.rep AS img_b,
                     a.bits AS ba, b.bits AS bb
                   FROM ch a JOIN ch b ON a.ci = b.ci AND a.chunk = b.chunk
                     AND a.rep < b.rep),
          hm AS (SELECT img_a, img_b,
                   len(list_filter(range(1, 65),
                     hb -> substr(ba, hb, 1) <> substr(bb, hb, 1))) AS hamming
                 FROM cand),
          pr AS (SELECT img_a, img_b FROM hm WHERE hamming <= 3
                 UNION ALL SELECT img_a, img_b FROM gp),
          j AS (SELECT pr.img_a, pr.img_b, a.px AS pa, b.px AS pb
                FROM pr JOIN dh_im a ON a.image_id = pr.img_a
                        JOIN dh_im b ON b.image_id = pr.img_b),
          s2 AS (SELECT img_a, img_b,
                   CAST(list_reduce(list_transform(range(1, len(pa) + 1),
                     zi -> abs(pa[zi] - pb[zi])), (za, zv) -> za + zv)
                     AS BIGINT) AS sad,
                   len(pa)::BIGINT AS n_px
                 FROM j)
          SELECT img_a, img_b, sad, n_px, (sad * 1000) // n_px AS mae_milli
          FROM s2 ORDER BY img_a, img_b""",
    "q99_leakage_safe_split" ->
      // q62's transitive-closure components + the same representative-hash
      // split thresholds
      s"""WITH RECURSIVE e AS (
            SELECT doc_a AS a, doc_b AS b FROM ${O.inp("neardup_edges")}
            UNION SELECT doc_b, doc_a FROM ${O.inp("neardup_edges")}),
          reach(v, r) AS (
            SELECT doc_id, doc_id FROM ${O.inp("neardup_vertices")}
            UNION
            SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.v),
          c AS (SELECT v AS doc_id, MIN(r) AS component
                FROM reach GROUP BY v),
          hh AS (SELECT doc_id, component,
                   ${O.md5n("component::VARCHAR || '@split'")} % 10 AS h
                 FROM c)
          SELECT doc_id, component,
            CASE WHEN h < 8 THEN 'train' WHEN h < 9 THEN 'val'
                 ELSE 'test' END AS split
          FROM hh ORDER BY doc_id""",
    "q100_profile" ->
      // identical aggregate set; exact mean as sum::DOUBLE / count
      """SELECT source, COUNT(*)::BIGINT AS n_rows,
           CAST(SUM(CASE WHEN text IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS null_text,
           COUNT(DISTINCT lang)::BIGINT AS n_langs,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           round(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*), 6) + 0.0
             AS avg_chars,
           COUNT(DISTINCT md5(text))::BIGINT AS n_distinct_texts
         FROM documents GROUP BY source ORDER BY source""",
    "q97_pair_construction" ->
      // identical caption regex + per-building rollup join
      s"""WITH b AS (SELECT building_ord, COUNT(*)::BIGINT AS n_surfaces,
                       CAST(SUM(CASE WHEN surface_class = 'RoofSurface'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_roof
                     FROM ${O.inp("surfaces")} GROUP BY 1)
          SELECT i.image_id,
            CAST(regexp_extract(i.caption, 'building (\\d+) ', 1)
              AS BIGINT) AS bref,
            COALESCE(b.n_surfaces, 0) AS n_surfaces,
            COALESCE(b.n_roof, 0) AS n_roof
          FROM ${O.inp("images")} i
          LEFT JOIN b ON b.building_ord =
            CAST(regexp_extract(i.caption, 'building (\\d+) ', 1) AS BIGINT)
          ORDER BY i.image_id""",
    "q98_negative_sampling" ->
      // identical md5 bit fields, self-bump, and dense-index partner join
      s"""WITH i AS (SELECT image_id,
                       CAST(regexp_extract(caption, 'building (\\d+) ', 1)
                         AS BIGINT) AS bref,
                       CAST(substr(image_id, 4, 12) AS BIGINT) AS img_ord
                     FROM ${O.inp("images")}),
          n AS (SELECT COUNT(*) AS n FROM i),
          x AS (SELECT i.image_id, i.img_ord, s.neg_slot,
                  ${O.md5n("i.image_id || '@neg' || s.neg_slot")} AS hsh
                FROM i CROSS JOIN (SELECT unnest(range(0, 2)) AS neg_slot) s),
          y AS (SELECT image_id, img_ord, neg_slot,
                  hsh % (SELECT n FROM n) AS cand FROM x),
          z AS (SELECT image_id, neg_slot,
                  CASE WHEN cand = img_ord
                       THEN (cand + 1) % (SELECT n FROM n)
                       ELSE cand END AS neg_ord
                FROM y)
          SELECT z.image_id, z.neg_slot, p.image_id AS neg_image_id,
            p.bref AS neg_bref
          FROM z JOIN i p ON p.img_ord = z.neg_ord
          ORDER BY z.image_id, z.neg_slot""",
    "q96_cell_pyramid" ->
      // every level recomputed INDEPENDENTLY from the anchors (the engine
      // rolls coarser levels up from the finer level's aggregates — the
      // two paths must land on identical pyramids)
      s"""SELECT CAST(14 AS BIGINT) AS level,
            ${O.cell("anchor_x", "anchor_y", 14)} AS cell_id,
            COUNT(*)::BIGINT AS n_images
          FROM ${O.inp("images")} GROUP BY 2
          UNION ALL
          SELECT CAST(12 AS BIGINT),
            ${O.cell("anchor_x", "anchor_y", 12)}, COUNT(*)::BIGINT
          FROM ${O.inp("images")} GROUP BY 2
          UNION ALL
          SELECT CAST(10 AS BIGINT),
            ${O.cell("anchor_x", "anchor_y", 10)}, COUNT(*)::BIGINT
          FROM ${O.inp("images")} GROUP BY 2
          ORDER BY level, cell_id""",
    "q95_stream_sessions" ->
      // the session_window semantics replayed relationally: the gap is
      // INCLUSIVE (SessionizeSpec pins it) — a session closes only when
      // the next event is STRICTLY more than 30 min after the previous,
      // identical to the batch op's boundary
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
                    FROM events),
          l AS (SELECT *, LAG(ts_us) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
                FROM e),
          b AS (SELECT user_id, value, ts_us,
                  CASE WHEN prev_us IS NOT NULL
                            AND ts_us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS boundary
                FROM l),
          a AS (SELECT user_id, value, ts_us,
                  SUM(boundary) OVER (PARTITION BY user_id
                    ORDER BY ts_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
                FROM b)
          SELECT user_id, MIN(ts_us) AS session_start_us,
            COUNT(*)::BIGINT AS n_events,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS val_sum
          FROM a GROUP BY user_id, session_id
          ORDER BY user_id, session_start_us""",
    "q94_rag_chunks" ->
      // identical chunk-count arithmetic, 1-based list slice, and 60-bit
      // md5 over the space-rejoined chunk
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS toks
                     FROM documents),
          c AS (SELECT doc_id, toks,
                  unnest(range(0, CASE WHEN len(toks) <= 32 THEN 1
                    ELSE (len(toks) - 32 + 23) // 24 + 1 END)) AS chunk_idx
                FROM t),
          s AS (SELECT doc_id, chunk_idx,
                  list_slice(toks, chunk_idx*24 + 1, chunk_idx*24 + 32)
                    AS chunk
                FROM c)
          SELECT doc_id, chunk_idx,
            len(chunk)::BIGINT AS n_chunk_tokens,
            ${O.md5n("array_to_string(chunk, ' ')")} AS chunk_hash
          FROM s ORDER BY doc_id, chunk_idx""",
    "q93_time_travel" ->
      // v1 = the pre-append subset, v2 = full, v3 = full (compaction
      // preserves content) — all three reconstructed from documents
      """SELECT 'v1' AS version, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum
         FROM documents WHERE doc_id < 400
         UNION ALL
         SELECT 'v2', COUNT(*)::BIGINT, CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(n_chars) AS BIGINT) FROM documents
         UNION ALL
         SELECT 'v3', COUNT(*)::BIGINT, CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(n_chars) AS BIGINT) FROM documents
         ORDER BY version""",
    "q92_bucketed_join" ->
      // the same join + rollup over the dumped band table (identical
      // k/bands/rows); `shuffle_free` pinned TRUE
      s"""SELECT d.doc_id, d.n_chars, COUNT(*)::BIGINT AS n_bands,
            MIN(b.band_hash) AS hash_min, MAX(b.band_hash) AS hash_max,
            TRUE AS shuffle_free
          FROM documents d JOIN ${O.inp("minhash_bands")} b USING (doc_id)
          GROUP BY d.doc_id, d.n_chars ORDER BY d.doc_id""",
    "q91_compaction" ->
      // plain per-source aggregates over documents — equality proves the
      // compacted fleet lost/duplicated nothing; both pins TRUE
      """SELECT source, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           TRUE AS compacted, TRUE AS big_kept
         FROM documents GROUP BY source ORDER BY source""",
    "q88_sessionize" ->
      // identical epoch-microsecond gap test, identical ROWS-framed running
      // boundary sum with the event_id tiebreak, same DECIMAL(28,6) sums
      """WITH e AS (SELECT user_id, event_id, value, epoch_us(ts) AS ts_us
                    FROM events),
          l AS (SELECT *, LAG(ts_us) OVER
                  (PARTITION BY user_id ORDER BY ts_us, event_id) AS prev_us
                FROM e),
          b AS (SELECT user_id, event_id, value, ts_us,
                  CASE WHEN prev_us IS NOT NULL
                            AND ts_us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS boundary
                FROM l),
          a AS (SELECT user_id, event_id, value, ts_us,
                  SUM(boundary) OVER (PARTITION BY user_id
                    ORDER BY ts_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS session_id
                FROM b)
          SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
            COUNT(*)::BIGINT AS n_events,
            CAST(SUM(event_id) AS BIGINT) AS id_sum,
            CAST(MAX(ts_us) - MIN(ts_us) AS BIGINT) AS dur_us,
            CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS val_sum
          FROM a GROUP BY user_id, session_id
          ORDER BY user_id, session_id""",
    "q89_shot_bounds" ->
      // identical |delta| > threshold boundary test + running count over
      // the dumped source-pixel truth table
      s"""WITH t AS (SELECT video_id, frame_idx, px_sum,
                       LAG(px_sum) OVER (PARTITION BY video_id
                         ORDER BY frame_idx) AS prev
                     FROM ${O.inp("video_frames")}),
          b AS (SELECT video_id, frame_idx, px_sum,
                  (prev IS NOT NULL AND abs(px_sum - prev) > 2000)
                    AS boundary
                FROM t)
          SELECT video_id, frame_idx, px_sum, boundary,
            CAST(SUM(CASE WHEN boundary THEN 1 ELSE 0 END) OVER
              (PARTITION BY video_id ORDER BY frame_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS shot_id
          FROM b ORDER BY video_id, frame_idx""",
    "q90_dominant_color" ->
      // identical 12-bit floor quantization; mode = max count, ties to the
      // smallest code
      s"""WITH pj AS (SELECT i.image_id, unnest(range(0, i.w * i.h)) AS j,
                        p.px
                      FROM ${O.inp("images")} i
                      JOIN ${O.inp("pixels")} p USING (image_id)),
          cd AS (SELECT image_id,
                   (px[3*j+1] // 16) * 256 + (px[3*j+2] // 16) * 16
                     + (px[3*j+3] // 16) AS code
                 FROM pj),
          ct AS (SELECT image_id, code, COUNT(*) AS n
                 FROM cd GROUP BY 1, 2),
          rk AS (SELECT image_id, code, n,
                   ROW_NUMBER() OVER (PARTITION BY image_id
                     ORDER BY n DESC, code ASC) AS rn,
                   COUNT(*) OVER (PARTITION BY image_id) AS n_colors
                 FROM ct)
          SELECT image_id, CAST(code AS BIGINT) AS dom_color,
            CAST(n AS BIGINT) AS dom_count,
            CAST(n_colors AS BIGINT) AS n_colors
          FROM rk WHERE rn = 1 ORDER BY image_id""",
    "q87_cell_mosaic" ->
      // identical Morton cell at JoinLevel=14 (5-step shift-or-mask),
      // identical per-position sums and floor-divided means from the
      // dumped pixels; size guard mirrors the engine's never-fail skip
      s"""WITH ic AS (SELECT i.image_id,
                        ${O.cell("i.anchor_x", "i.anchor_y", 14)} AS cell_id,
                        p.px
                      FROM ${O.inp("images")} i
                      JOIN ${O.inp("pixels")} p USING (image_id)
                      WHERE i.w * i.h * 3 = 768),
          pj AS (SELECT cell_id, unnest(range(0, 768)) AS j, px FROM ic),
          ps AS (SELECT cell_id, j, SUM(px[j+1]) AS s, COUNT(*) AS n
                 FROM pj GROUP BY 1, 2)
          SELECT cell_id, CAST(MAX(n) AS BIGINT) AS n_images,
            CAST(SUM(s // n) AS BIGINT) AS mos_sum,
            CAST(SUM((j+1) * (s // n)) AS BIGINT) AS mos_wsum
          FROM ps GROUP BY cell_id ORDER BY cell_id""",
    "q86_scd2_merge" ->
      // identical change detection (md5 payload compare incl. missing key),
      // identical close/keep/open routing and epoch literals
      """WITH cur AS (SELECT doc_id, text, CAST(1 AS BIGINT) AS valid_from,
                        CAST(9999999999 AS BIGINT) AS valid_to,
                        TRUE AS is_current
                      FROM documents),
          upd AS (SELECT doc_id, text || ' rev2' AS text FROM documents
                  WHERE doc_id % 7 = 3
                  UNION ALL
                  SELECT doc_id, text FROM documents WHERE doc_id % 7 = 4
                  UNION ALL
                  SELECT doc_id + 9000000, 'ins ' || doc_id FROM documents
                  WHERE doc_id % 101 = 5),
          chg AS (SELECT u.doc_id, u.text FROM upd u
                  LEFT JOIN cur c ON c.doc_id = u.doc_id
                  WHERE c.doc_id IS NULL OR md5(c.text) <> md5(u.text)),
          closed AS (SELECT c.doc_id, c.text, c.valid_from,
                       CAST(2 AS BIGINT) AS valid_to, FALSE AS is_current
                     FROM cur c JOIN chg USING (doc_id)),
          kept AS (SELECT c.* FROM cur c WHERE NOT EXISTS
                     (SELECT 1 FROM chg WHERE chg.doc_id = c.doc_id)),
          opened AS (SELECT doc_id, text, CAST(2 AS BIGINT),
                       CAST(9999999999 AS BIGINT), TRUE FROM chg)
          SELECT * FROM kept UNION ALL SELECT * FROM closed
          UNION ALL SELECT * FROM opened
          ORDER BY doc_id, valid_from""",
    "q85_image_quality" ->
      // identical integer BT.601 luma (floor //1000), identical 4-neighbor
      // Laplacian over interior pixels, variance/mean derived from the
      // same integer sums in the same expression order
      s"""WITH im AS (SELECT i.image_id, i.w, i.h, p.px
                      FROM ${O.inp("images")} i
                      JOIN ${O.inp("pixels")} p USING (image_id)),
          kk AS (SELECT image_id, w, h, px,
                   unnest(range(0, (w-2)*(h-2))) AS k FROM im),
          ii AS (SELECT image_id, w, h, px,
                   ((1 + k // (w-2)) * w + 1 + k % (w-2)) AS j FROM kk),
          lp AS (SELECT image_id,
                   4*${q85Lum("j")} - ${q85Lum("j-1")} - ${q85Lum("j+1")}
                     - ${q85Lum("j-w")} - ${q85Lum("j+w")} AS lap
                 FROM ii),
          lm AS (SELECT image_id, w, h, px,
                   unnest(range(0, w*h)) AS j FROM im),
          ls AS (SELECT image_id,
                   CAST(SUM(${q85Lum("j")}) AS BIGINT) AS luma_sum,
                   MAX(w*h) AS npx
                 FROM lm GROUP BY image_id),
          ag AS (SELECT image_id, COUNT(*)::BIGINT AS n_int,
                   CAST(SUM(lap) AS BIGINT) AS lap_sum,
                   CAST(SUM(lap*lap) AS BIGINT) AS lap_sq_sum
                 FROM lp GROUP BY 1)
          SELECT a.image_id, a.n_int, a.lap_sum, a.lap_sq_sum,
            round((a.lap_sq_sum::DOUBLE - a.lap_sum::DOUBLE *
              a.lap_sum::DOUBLE / a.n_int) / a.n_int, 4) + 0.0 AS blur_var,
            round(l.luma_sum::DOUBLE / l.npx, 4) + 0.0 AS mean_luma,
            ((a.lap_sq_sum::DOUBLE - a.lap_sum::DOUBLE *
              a.lap_sum::DOUBLE / a.n_int) / a.n_int) >= 48500.0 AS sharp
          FROM ag a JOIN ls l USING (image_id) ORDER BY a.image_id""",
    "q84_zorder_skip" ->
      // plain filters over documents — equality proves neither pruned scan
      // lost rows; `skipped` pinned TRUE for BOTH dimensions
      """SELECT 'doc_id' AS dim, COUNT(*)::BIGINT AS n_rows,
           CAST(SUM(doc_id) AS BIGINT) AS id_sum,
           CAST(SUM(n_chars) AS BIGINT) AS chars_sum, TRUE AS skipped
         FROM documents WHERE doc_id BETWEEN 100 AND 140
         UNION ALL
         SELECT 'n_chars', COUNT(*)::BIGINT, CAST(SUM(doc_id) AS BIGINT),
           CAST(SUM(n_chars) AS BIGINT), TRUE
         FROM documents WHERE n_chars BETWEEN 150 AND 300
         ORDER BY dim""",
    "q82_manifest_skip" ->
      // plain filter+agg over documents — equality proves the pruned scan
      // lost no rows; `skipped` pinned TRUE
      """SELECT source, COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars,
           TRUE AS skipped
         FROM documents WHERE n_chars >= 150 AND n_chars <= 300
         GROUP BY source ORDER BY source""",
    "q81_augment" ->
      // identical bit-field offsets (hsh % span, (hsh>>8) % span,
      // (hsh>>16)&1), identical flipped-crop index arithmetic over the
      // dumped pixels; k = (y*12 + x)*3 + c is the output-position weight
      s"""WITH im AS (SELECT i.image_id, i.w, i.h, p.px
                      FROM ${O.inp("images")} i
                      JOIN ${O.inp("pixels")} p USING (image_id)),
          par AS (SELECT image_id, w, h, px,
                    ${O.md5n("image_id || '@81'")} AS hsh FROM im),
          geo AS (SELECT image_id, w, px,
                    hsh % (w - 11) AS ox, (hsh >> 8) % (h - 11) AS oy,
                    ((hsh >> 16) & 1) = 1 AS flip FROM par),
          kk AS (SELECT image_id, w, px, ox, oy, flip,
                   unnest(range(0, 432)) AS k FROM geo),
          v AS (SELECT image_id, ox, oy, flip, k,
                  px[((oy + (k//3)//12) * w + ox +
                      (CASE WHEN flip THEN 11 - ((k//3)%12)
                            ELSE (k//3)%12 END)) * 3 + (k%3) + 1] AS val
                FROM kk)
          SELECT image_id, ox, oy, flip,
            CAST(SUM(val) AS BIGINT) AS aug_sum,
            CAST(SUM(val * (k + 1)) AS BIGINT) AS aug_wsum
          FROM v GROUP BY image_id, ox, oy, flip ORDER BY image_id""",
    "q80_pii_scrub" ->
      // identical patterns (Java∩RE2 dialect), identical email→SSN→phone
      // replacement order on the running text; counts on the original
      s"""SELECT doc_id,
            len(regexp_extract_all(text, '${TextOps.EmailRe}'))::BIGINT AS n_emails,
            len(regexp_extract_all(text, '${TextOps.SsnRe}'))::BIGINT AS n_ssns,
            len(regexp_extract_all(text, '${TextOps.PhoneRe}'))::BIGINT AS n_phones,
            regexp_replace(regexp_replace(regexp_replace(text,
              '${TextOps.EmailRe}', '[EMAIL]', 'g'),
              '${TextOps.SsnRe}', '[SSN]', 'g'),
              '${TextOps.PhoneRe}', '[PHONE]', 'g') AS clean_text
          FROM ${O.inp("pii_docs")} ORDER BY doc_id""",
    "q79_semdedup" ->
      // q45's assignment replay + within-cluster exact-cosine threshold
      // join + q62's transitive-closure CTE — keep = min vec_id reachable
      s"""WITH RECURSIVE
          ct AS (SELECT list_id, centroid FROM ${O.inp("ivf_centroids")}),
          asg AS (SELECT vec_id, list_id FROM (
                    SELECT e.vec_id, ct.list_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${O.cos("e.embedding", "ct.centroid")} DESC,
                                 ct.list_id ASC) AS rn
                    FROM embeddings e CROSS JOIN ct) WHERE rn = 1),
          pr AS (SELECT a.vec_id AS va, b.vec_id AS vb
                 FROM asg a JOIN asg b USING (list_id)
                 JOIN embeddings ea ON ea.vec_id = a.vec_id
                 JOIN embeddings eb ON eb.vec_id = b.vec_id
                 WHERE a.vec_id < b.vec_id
                   AND ${O.cos("ea.embedding", "eb.embedding")} >= 0.35),
          e AS (SELECT va AS a, vb AS b FROM pr
                UNION SELECT vb, va FROM pr),
          reach(v, r) AS (
            SELECT vec_id, vec_id FROM embeddings
            UNION
            SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.v)
          SELECT v AS vec_id, MIN(r) AS component, MIN(r) = v AS is_keep
          FROM reach GROUP BY v ORDER BY vec_id""",
    "q78_paragraph_dedup" ->
      // identical chunking (disjoint 10-token slices, empties filtered,
      // positions renumbered over survivors), 60-bit md5 hot set at
      // nd >= 2, position-ordered reassembly
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         | ch0 AS (SELECT doc_id, i, array_to_string(tk[i*10+1 : i*10+10], ' ') AS para
         |        FROM (SELECT doc_id, tk,
         |                unnest(range(0, CAST(ceil(len(tk)::DOUBLE / 10) AS BIGINT))) AS i
         |              FROM t)),
         | ch AS (SELECT doc_id,
         |          ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) - 1 AS pos, para
         |        FROM ch0 WHERE length(para) > 0),
         | hh AS (SELECT doc_id, pos, para, ${O.md5n("para")} AS h FROM ch),
         | hot AS (SELECT h FROM (SELECT h, COUNT(DISTINCT doc_id) AS nd
         |                        FROM hh GROUP BY 1) WHERE nd >= 2),
         | keep AS (SELECT * FROM hh WHERE h NOT IN (SELECT h FROM hot))
         | SELECT doc_id, COUNT(*)::BIGINT AS n_paras,
         |        string_agg(para, ' ' ORDER BY pos) AS clean_text
         | FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    "q77_unigram_lm" ->
      // identical micro-nat table (rounded ln scaled to integer, so the
      // per-doc sum is exact integer math — order-independent), relational
      // unnest + join replay of the zero-shuffle literal-map fold
      """WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
        | v AS (SELECT tok, COUNT(*)::BIGINT AS c
        |       FROM (SELECT unnest(tk) AS tok FROM t) GROUP BY 1),
        | tot AS (SELECT CAST(SUM(c) AS BIGINT) AS s FROM v),
        | lp AS (SELECT tok,
        |          CAST(round(ln(c::DOUBLE / s::DOUBLE) * 1000000.0, 0) AS BIGINT) AS micro
        |        FROM v, tot),
        | e AS (SELECT doc_id, unnest(tk) AS tok FROM t),
        | sm AS (SELECT e.doc_id, CAST(SUM(lp.micro) AS BIGINT) AS sum_micro
        |        FROM e JOIN lp USING (tok) GROUP BY 1),
        | nt AS (SELECT doc_id, len(tk)::BIGINT AS n_tokens FROM t)
        | SELECT nt.doc_id, nt.n_tokens, sm.sum_micro,
        |   round((sm.sum_micro::DOUBLE / 1000000.0) / nt.n_tokens::DOUBLE, 6) + 0.0
        |     AS avg_logp
        | FROM nt JOIN sm USING (doc_id) ORDER BY doc_id""".stripMargin,
    "q76_bm25" -> bm25OracleSql,
    "q75_exact_quantiles" ->
      // identical count + cumulative-rank select; ties impossible in the
      // window (values are grouped distinct), so RANGE == ROWS frames
      """WITH c AS (SELECT source, n_chars AS v, COUNT(*) AS c
              FROM documents GROUP BY 1, 2),
         cm AS (SELECT source, v,
                  SUM(c) OVER (PARTITION BY source ORDER BY v) AS cum,
                  SUM(c) OVER (PARTITION BY source) AS n FROM c)
         SELECT source, CAST(MAX(n) AS BIGINT) AS n,
           CAST(MIN(CASE WHEN cum >= ceil(0.5 * n) THEN v END) AS BIGINT) AS p50,
           CAST(MIN(CASE WHEN cum >= ceil(0.95 * n) THEN v END) AS BIGINT) AS p95
         FROM cm GROUP BY source ORDER BY source""",
    "q74_stratified_sample" ->
      // identical seeded-hash window: same md5 permutation, same
      // (hash, doc_id) total order, same top-5 cut
      s"""WITH h AS (SELECT source, doc_id,
                ${O.md5n("doc_id::VARCHAR || '@7'")} AS hv FROM documents),
         r AS (SELECT source, doc_id,
                 ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY hv, doc_id) AS sample_rank FROM h)
         SELECT source, doc_id, sample_rank FROM r WHERE sample_rank <= 5
         ORDER BY source, sample_rank""",
    "q73_countmin" -> q73Oracle,
    "q72_stream_window" ->
      // batch replay of the streaming windows: 1-hour tumbling == hour
      // truncation; same DECIMAL(28,6) sum discipline as q08
      """SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M')
             AS window_start,
           event_type, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""",
    "q71_bloom_filter" ->
      // full bit replay: same k=4 md5 positions per key, same 64-bit word
      // OR-fold, same all-bits-set probe — false positives and all
      s"""WITH keys AS (SELECT DISTINCT o_orderkey FROM orders
                WHERE o_totalprice > 480000.0),
         pos AS (SELECT ${O.md5n("o_orderkey::VARCHAR || '#' || j::VARCHAR")}
                   % 4096 AS p
                 FROM keys, range(0, 4) r(j)),
         words AS (SELECT p // 64 AS w,
                     bit_or(${O.bitMask("p % 64")}) AS word
                   FROM pos GROUP BY 1),
         li AS (SELECT l_orderkey, ROW_NUMBER() OVER () AS rid
                FROM lineitem),
         pp AS (SELECT l.rid, l.l_orderkey, r.j,
                  ${O.md5n("l.l_orderkey::VARCHAR || '#' || j::VARCHAR")}
                    % 4096 AS p
                FROM li l, range(0, 4) r(j)),
         hit AS (SELECT rid, MIN(l_orderkey) AS l_orderkey,
                   COUNT(*) FILTER (WHERE (w2.word &
                     ${O.bitMask("pp.p % 64")}) <> 0) AS nset
                 FROM pp LEFT JOIN words w2 ON w2.w = pp.p // 64
                 GROUP BY rid),
         fl AS (SELECT l_orderkey, (nset = 4) AS pass,
                  l_orderkey IN (SELECT o_orderkey FROM keys) AS tru
                FROM hit)
         SELECT COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(SUM(CASE WHEN tru THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(SUM(CASE WHEN pass AND NOT tru THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_pos,
           CAST(SUM(CASE WHEN tru AND NOT pass THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_neg,
           CAST(SUM(CASE WHEN pass THEN l_orderkey ELSE 0 END) AS BIGINT)
             AS pass_key_sum
         FROM fl""",
    "q70_hll" ->
      // register-exact replay: same (h>>52) index, same trailing-zero rho
      // over the 52-bit window, max per register, then the identical
      // estimate arithmetic (integer-scaled Σ2^-M, literal alpha·m², ln
      // small-range branch) rounded on both sides
      s"""WITH tokd AS (SELECT DISTINCT source, tok FROM
                (SELECT source, unnest(string_split(text, ' ')) AS tok
                 FROM documents)),
         h AS (SELECT source, ${O.md5n("tok")} AS h FROM tokd),
         r AS (SELECT source, (h >> 52) & 255 AS idx,
                 h & 4503599627370495 AS w FROM h),
         rr AS (SELECT source, idx,
                  MAX(CASE WHEN w = 0 THEN 53 ELSE ${O.tz52("w")} + 1 END) AS m
                FROM r GROUP BY source, idx),
         ag AS (SELECT source, COUNT(*) AS nonzero,
                  CAST(SUM(m) AS BIGINT) AS reg_checksum,
                  CAST(SUM(1::BIGINT << CAST(53 - m AS INTEGER)) AS BIGINT) AS ps
                FROM rr GROUP BY source),
         ex AS (SELECT source, COUNT(DISTINCT tok) AS n_exact
                FROM tokd GROUP BY source),
         es AS (SELECT source, reg_checksum,
                  CAST(256 - nonzero AS BIGINT) AS n_zero,
                  (ps + (256 - nonzero) * 9007199254740992)::DOUBLE
                    / 9007199254740992.0 AS s
                FROM ag)
         SELECT es.source, ex.n_exact, es.reg_checksum, es.n_zero,
           round(CASE WHEN (0.7213/(1.0 + 1.079/256.0)*65536.0) / es.s <= 640.0
                       AND es.n_zero > 0
                 THEN 256.0 * ln(256.0 / es.n_zero::DOUBLE)
                 ELSE (0.7213/(1.0 + 1.079/256.0)*65536.0) / es.s END, 6)
             AS hll_estimate
         FROM es JOIN ex USING (source) ORDER BY es.source""",
    "q69_decontaminate" ->
      // same snippet slice (tokens 5..12), same 60-bit md5 hash, same
      // overlap semantics — n_hits counts gram POSITIONS, n_grams distinct
      // eval grams
      s"""WITH t AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
         ev AS (SELECT DISTINCT ${O.md5n("array_to_string(tk[5:12], ' ')")} AS h
                FROM t WHERE doc_id % 97 = 0 AND len(tk) >= 12),
         pos AS (SELECT doc_id, tk, unnest(range(1, len(tk) - 6)) AS i
                 FROM t WHERE len(tk) >= 8),
         dg AS (SELECT doc_id,
                  ${O.md5n("array_to_string(tk[i:i+7], ' ')")} AS h FROM pos)
         SELECT doc_id, COUNT(*) AS n_hits, COUNT(DISTINCT h) AS n_grams
         FROM dg JOIN ev USING (h)
         GROUP BY doc_id ORDER BY doc_id""",
    "q68_repetition" ->
      // relational replay of the per-row fold: unnest + group-by counts;
      // ORDER BY c DESC, gram ASC mirrors the fold's strict-> tiebreak
      """WITH t AS (SELECT doc_id, length(text) AS nc,
                string_split(text, ' ') AS tk FROM documents),
         b AS (SELECT doc_id, nc, len(tk) AS n,
                 CASE WHEN len(tk) >= 2 THEN list_transform(range(1, len(tk)),
                   i -> tk[i] || ' ' || tk[i+1]) ELSE [] END AS bi,
                 CASE WHEN len(tk) >= 3 THEN list_transform(range(1, len(tk)-1),
                   i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2]) ELSE [] END AS tri
               FROM t),
         bg AS (SELECT doc_id, unnest(bi) AS gram FROM b),
         bgc AS (SELECT doc_id, gram, COUNT(*) AS c FROM bg GROUP BY 1, 2),
         top AS (SELECT doc_id, gram, c FROM (
                   SELECT doc_id, gram, c,
                     ROW_NUMBER() OVER (PARTITION BY doc_id
                       ORDER BY c DESC, gram ASC) AS rn
                   FROM bgc) WHERE rn = 1),
         tg AS (SELECT doc_id, unnest(tri) AS gram FROM b),
         t3 AS (SELECT doc_id, COUNT(DISTINCT gram) AS nd3 FROM tg GROUP BY 1)
         SELECT b.doc_id, b.n AS n_tokens,
           COALESCE(top.gram, '') AS top2_gram,
           COALESCE(top.c, 0) AS top2_count,
           CASE WHEN b.nc > 0 THEN
             (COALESCE(top.c, 0) * length(COALESCE(top.gram, '')))::DOUBLE
               / b.nc::DOUBLE ELSE 0.0 END AS top2_char_frac,
           CASE WHEN b.n >= 3 THEN (b.n - 2 - t3.nd3)::DOUBLE
                / (b.n - 2)::DOUBLE ELSE 0.0 END AS dup3_frac
         FROM b LEFT JOIN top USING (doc_id) LEFT JOIN t3 USING (doc_id)
         ORDER BY b.doc_id""",
    "q67_asof_join" ->
      // identical union + ordered window: right rows sort before left rows
      // at the same (ts) via side, tiebreak on event_id totalizes the order
      """WITH u AS (
           SELECT user_id, ts, 1 AS side, event_id AS tb, event_id,
                  NULL::BIGINT AS a_id, NULL::DOUBLE AS a_val
           FROM events WHERE event_type = 'purchase'
           UNION ALL
           SELECT user_id, ts, 0 AS side, event_id AS tb, NULL::BIGINT,
                  event_id, value
           FROM events WHERE event_type = 'click'),
         w AS (
           SELECT *,
             LAST_VALUE(a_id IGNORE NULLS) OVER win AS l_id,
             LAST_VALUE(a_val IGNORE NULLS) OVER win AS l_val
           FROM u
           WINDOW win AS (PARTITION BY user_id ORDER BY ts, side, tb
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
         SELECT event_id, user_id, COALESCE(l_id, -1) AS last_click_id,
                COALESCE(l_val, 0.0) AS last_click_value
         FROM w WHERE side = 1 ORDER BY event_id""",
    "q66_ivf_pq" ->
      // full IVF-PQ replay: per-subspace L2 code assignment (mirrors the
      // engine's zip_with fold exactly), reconstruction by ordered
      // codebook concat, probe lists, PQ-approx shortlist (ark ≤ 32),
      // exact re-rank (rk ≤ 5)
      s"""WITH ct AS (SELECT list_id, centroid FROM ${O.inp("ivf_centroids")}),
          asg AS (SELECT vec_id, list_id FROM (
                    SELECT e.vec_id, ct.list_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${O.cos("e.embedding", "ct.centroid")} DESC,
                                 ct.list_id ASC) AS rn
                    FROM embeddings e CROSS JOIN ct) WHERE rn = 1),
          cb AS (SELECT sub_idx, code, centroid FROM ${O.inp("pq_codebooks")}),
          sv AS (SELECT e.vec_id, s.s AS sub_idx,
                   list_transform(range(s.s*8+1, s.s*8+9),
                     i -> e.embedding[i]::DOUBLE) AS sub
                 FROM embeddings e, range(0, 8) s(s)),
          pasn AS (SELECT vec_id, sub_idx, code FROM (
                     SELECT sv.vec_id, sv.sub_idx, cb.code,
                       ROW_NUMBER() OVER (PARTITION BY sv.vec_id, sv.sub_idx
                         ORDER BY list_reduce(list_transform(range(1, 9),
                           i -> (sv.sub[i] - cb.centroid[i])
                              * (sv.sub[i] - cb.centroid[i])),
                           (l2a, l2v) -> l2a + l2v) ASC, cb.code ASC) AS rn
                     FROM sv JOIN cb USING (sub_idx)) WHERE rn = 1),
          x AS (SELECT p.vec_id,
                  flatten(list(cb2.centroid ORDER BY p.sub_idx)) AS recon
                FROM pasn p JOIN cb cb2 ON cb2.sub_idx = p.sub_idx
                  AND cb2.code = p.code
                GROUP BY p.vec_id),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 3),
          ql AS (SELECT query_id, list_id FROM (
                   SELECT q.query_id, ct.list_id,
                     ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ${O.cos("q.q_emb", "ct.centroid")} DESC,
                                ct.list_id ASC) AS rn
                   FROM q CROSS JOIN ct) WHERE rn <= 4),
          sl AS (SELECT query_id, vec_id, ca FROM (
                   SELECT ql.query_id, a.vec_id,
                     ${O.cos("x.recon", "q.q_emb")} AS ca,
                     ROW_NUMBER() OVER (PARTITION BY ql.query_id
                       ORDER BY ${O.cos("x.recon", "q.q_emb")} DESC,
                                a.vec_id ASC) AS ark
                   FROM ql JOIN asg a USING (list_id)
                           JOIN x ON x.vec_id = a.vec_id
                           JOIN q ON q.query_id = ql.query_id
                   WHERE a.vec_id <> ql.query_id) WHERE ark <= 32),
          d AS (SELECT sl.query_id, sl.vec_id, sl.ca,
                  ${O.cos("e.embedding", "q.q_emb")} AS cos_raw
                FROM sl JOIN embeddings e ON e.vec_id = sl.vec_id
                        JOIN q ON q.query_id = sl.query_id)
          SELECT query_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, vec_id ASC) AS rk,
                 vec_id, round(cos_raw, 6) AS cos, round(ca, 6) AS cos_approx
          FROM d QUALIFY rk <= 5 ORDER BY query_id, rk""",
    "q65_recipe" ->
      // ALL SEVEN recipe stages in one statement: exact dedup (md5 group),
      // clustering (recursive-CTE closure over the dumped edges), quality
      // (exact-integer stopword hits), mix (md5 threshold CASE), BPE
      // (recursive encode from the dumped merges), packing window, shuffle
      // rank — each fragment identical to its single-stage oracle
      s"""WITH RECURSIVE
          ek AS (SELECT MIN(doc_id) AS doc_id FROM documents
                 GROUP BY md5(text)),
          k1 AS (SELECT d.doc_id, d.text, d.source FROM documents d
                 JOIN ek USING (doc_id)),
          e AS (SELECT doc_a AS a, doc_b AS b FROM ${O.inp("recipe_edges")}
                UNION SELECT doc_b, doc_a FROM ${O.inp("recipe_edges")}),
          reach(v, r) AS (
            SELECT doc_id, doc_id FROM k1
            UNION
            SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.v),
          k2 AS (SELECT k1.doc_id, k1.text, k1.source FROM k1
                 JOIN (SELECT v, MIN(r) AS c FROM reach GROUP BY v) cc
                   ON cc.v = k1.doc_id AND cc.c = k1.doc_id),
          q AS (SELECT * FROM k2
                WHERE len(list_filter(string_split(text, ' '),
                  t -> t IN ('the','a','of','and','to'))) >= 1),
          m AS (SELECT * FROM q
                WHERE ${O.md5n("doc_id::VARCHAR || '@7'")} % 1000000
                  < CASE source WHEN 'src0' THEN 500000 ELSE 1000000 END),
          mg AS (SELECT rank, a, b, a || b AS ab,
                   ' '||a||' '||b||' ' AS pat FROM ${O.inp("bpe_merges")}),
          words AS (SELECT DISTINCT w FROM
                      (SELECT unnest(string_split(text,' ')) AS w FROM m)
                    WHERE w <> ''),
          enc(w, s) AS (
            SELECT w, ' ' || list_aggregate(
                list_transform(range(1,len(w)+1), i -> substr(w,i,1)),
                'string_agg', ' ') || ' '
            FROM words
            UNION ALL
            SELECT e2.w,
              substr(e2.s, 1, strpos(e2.s, m1.pat)-1) || ' ' || m1.ab || ' '
                || substr(e2.s, strpos(e2.s, m1.pat) + len(m1.pat))
            FROM enc e2 JOIN mg m1 ON strpos(e2.s, m1.pat) > 0
            WHERE NOT EXISTS (SELECT 1 FROM mg m2
                              WHERE m2.rank < m1.rank
                                AND strpos(e2.s, m2.pat) > 0)),
          fin AS (SELECT w, len(string_split(trim(s), ' ')) AS n FROM enc e3
                  WHERE NOT EXISTS (SELECT 1 FROM mg
                                    WHERE strpos(e3.s, mg.pat) > 0)),
          counts AS (SELECT dw.doc_id,
                       CAST(SUM(f.n) AS BIGINT) AS n_bpe_tokens
                     FROM (SELECT doc_id, unnest(string_split(text,' ')) AS w
                           FROM m) dw
                     JOIN fin f USING (w) GROUP BY dw.doc_id),
          c2 AS (SELECT doc_id, n_bpe_tokens,
                   SUM(n_bpe_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                 FROM counts),
          rk AS (SELECT doc_id,
                   CAST(ROW_NUMBER() OVER (ORDER BY
                     ${O.md5n("doc_id::VARCHAR || '#99'")}, doc_id) AS BIGINT)
                     AS shuffle_rank FROM m)
          SELECT c2.doc_id, n_bpe_tokens,
            CAST(cum - n_bpe_tokens AS BIGINT) AS start_offset,
            CAST((cum - n_bpe_tokens) // 1024 AS BIGINT) AS first_bin,
            CAST(CASE WHEN n_bpe_tokens > 0 THEN (cum - 1) // 1024
                 ELSE (cum - n_bpe_tokens) // 1024 END AS BIGINT) AS last_bin,
            rk.shuffle_rank
          FROM c2 JOIN rk USING (doc_id) ORDER BY c2.doc_id""",
    "q64_hog" ->
      // full HOG replay from decoded pixels: integer luma sums, central
      // differences over the interior 14×14, comparison-only sector CASE,
      // L1 magnitudes per cell — dense grid via LEFT JOIN (zero cells kept)
      s"""WITH sl AS (
            SELECT p.image_id, p.px
            FROM ${O.inp("pixels")} p
            JOIN ${O.inp("images")} i USING (image_id)
            WHERE i.phash % 16 = 0),
          g AS (
            SELECT image_id, x.x AS x, y.y AS y,
              (px[((y.y)*16 + x.x+1)*3+1] + px[((y.y)*16 + x.x+1)*3+2] + px[((y.y)*16 + x.x+1)*3+3])
                - (px[((y.y)*16 + x.x-1)*3+1] + px[((y.y)*16 + x.x-1)*3+2] + px[((y.y)*16 + x.x-1)*3+3]) AS gx,
              (px[((y.y+1)*16 + x.x)*3+1] + px[((y.y+1)*16 + x.x)*3+2] + px[((y.y+1)*16 + x.x)*3+3])
                - (px[((y.y-1)*16 + x.x)*3+1] + px[((y.y-1)*16 + x.x)*3+2] + px[((y.y-1)*16 + x.x)*3+3]) AS gy
            FROM sl, range(1, 15) x(x), range(1, 15) y(y)),
          agg AS (
            SELECT image_id, x // 8 AS cell_x, y // 8 AS cell_y,
              (CASE WHEN gx >= 0 THEN 4 ELSE 0 END)
                + (CASE WHEN gy >= 0 THEN 2 ELSE 0 END)
                + (CASE WHEN abs(gx) >= abs(gy) THEN 1 ELSE 0 END) AS bin,
              CAST(SUM(abs(gx) + abs(gy)) AS BIGINT) AS mag
            FROM g GROUP BY 1, 2, 3, 4),
          grid AS (
            SELECT gr.image_id, cx.cx AS cell_x, cy.cy AS cell_y, bb.b AS bin
            FROM (SELECT DISTINCT image_id FROM sl) gr,
                 range(0, 2) cx(cx), range(0, 2) cy(cy), range(0, 8) bb(b))
          SELECT g2.image_id, CAST(g2.cell_x AS INT) AS cell_x,
                 CAST(g2.cell_y AS INT) AS cell_y, CAST(g2.bin AS INT) AS bin,
                 COALESCE(a.mag, 0) AS mag
          FROM grid g2 LEFT JOIN agg a ON a.image_id = g2.image_id
            AND a.cell_x = g2.cell_x AND a.cell_y = g2.cell_y
            AND a.bin = g2.bin
          ORDER BY g2.image_id, g2.cell_y, g2.cell_x, g2.bin""",
    "q63_bpe_pack" ->
      // full BPE ENCODE replay, one merge splice per recursive-CTE step:
      // each state picks its lowest-rank applicable merge (NOT EXISTS of a
      // lower-ranked applicable one) and splices its LEFTMOST occurrence —
      // exactly BpeTokenizer.encode's loop; then the q59 packing window
      // over the summed per-word counts
      s"""WITH RECURSIVE m AS (
            SELECT rank, a, b, a || b AS ab,
                   ' ' || a || ' ' || b || ' ' AS pat
            FROM ${O.inp("bpe_merges")}),
          words AS (
            SELECT DISTINCT w FROM (
              SELECT unnest(string_split(text, ' ')) AS w FROM documents)
            WHERE w <> ''),
          enc(w, s) AS (
            SELECT w, ' ' || list_aggregate(
                list_transform(range(1, len(w) + 1), i -> substr(w, i, 1)),
                'string_agg', ' ') || ' '
            FROM words
            UNION ALL
            SELECT e.w,
              substr(e.s, 1, strpos(e.s, m1.pat) - 1) || ' ' || m1.ab || ' '
                || substr(e.s, strpos(e.s, m1.pat) + len(m1.pat))
            FROM enc e JOIN m m1 ON strpos(e.s, m1.pat) > 0
            WHERE NOT EXISTS (SELECT 1 FROM m m2
                              WHERE m2.rank < m1.rank
                                AND strpos(e.s, m2.pat) > 0)),
          fin AS (
            SELECT w, len(string_split(trim(s), ' ')) AS n
            FROM enc e
            WHERE NOT EXISTS (SELECT 1 FROM m
                              WHERE strpos(e.s, m.pat) > 0)),
          counts AS (
            SELECT d.doc_id, CAST(SUM(f.n) AS BIGINT) AS n_bpe_tokens
            FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS w
                  FROM documents) d
            JOIN fin f USING (w)
            GROUP BY d.doc_id),
          c AS (
            SELECT doc_id, n_bpe_tokens,
              SUM(n_bpe_tokens) OVER (ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
            FROM counts)
          SELECT doc_id, n_bpe_tokens,
            CAST(cum - n_bpe_tokens AS BIGINT) AS start_offset,
            CAST((cum - n_bpe_tokens) // 512 AS BIGINT) AS first_bin,
            CAST(CASE WHEN n_bpe_tokens > 0 THEN (cum - 1) // 512
                 ELSE (cum - n_bpe_tokens) // 512 END AS BIGINT) AS last_bin
          FROM c ORDER BY doc_id""",
    "q62_neardup_clusters" ->
      // connected components as a transitive-closure recursive CTE (UNION
      // dedup terminates it): component = min reachable id; keep = min
      s"""WITH RECURSIVE e AS (
            SELECT doc_a AS a, doc_b AS b FROM ${O.inp("neardup_edges")}
            UNION SELECT doc_b, doc_a FROM ${O.inp("neardup_edges")}),
          reach(v, r) AS (
            SELECT doc_id, doc_id FROM ${O.inp("neardup_vertices")}
            UNION
            SELECT e.b, reach.r FROM reach JOIN e ON e.a = reach.v)
          SELECT v AS doc_id, MIN(r) AS component, MIN(r) = v AS is_keep
          FROM reach GROUP BY v ORDER BY doc_id""",
    "q60_shuffle" ->
      s"""SELECT doc_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY
                   ${O.md5n("doc_id::VARCHAR || '#42'")}, doc_id) AS BIGINT)
                   AS shuffle_rank
          FROM documents ORDER BY doc_id""",
    "q54_resume" ->
      // same cell-count math as q16 (the triangles input is gated there);
      // `identical` pinned TRUE — restart drift in the engine turns it false
      s"""WITH i AS (SELECT image_id, ${O.cell("anchor_x", "anchor_y", 14)}
                       AS cell_id, anchor_x, anchor_y FROM ${O.inp("images")}),
          m AS (SELECT i.cell_id, i.image_id, t.surface_id
                FROM i JOIN ${O.inp("triangles")} t
                  ON ${O.pip("i.anchor_x", "i.anchor_y", "t.")})
          SELECT cell_id, COUNT(*) AS n_matches,
                 COUNT(DISTINCT image_id) AS n_images,
                 COUNT(DISTINCT surface_id) AS n_surfaces,
                 TRUE AS identical
          FROM m GROUP BY cell_id ORDER BY cell_id""",
    "q55_ivf_sq" ->
      // full IVF-SQ8 replay: per-dim min/max → scale/inv → codes →
      // reconstruction (list ordered by dimension) → probe lists →
      // approx-cosine shortlist (ark ≤ 32) → exact re-rank (rk ≤ 5)
      s"""WITH ct AS (SELECT list_id, centroid FROM ${O.inp("ivf_centroids")}),
          asg AS (SELECT vec_id, list_id FROM (
                    SELECT e.vec_id, ct.list_id,
                      ROW_NUMBER() OVER (PARTITION BY e.vec_id
                        ORDER BY ${O.cos("e.embedding", "ct.centroid")} DESC,
                                 ct.list_id ASC) AS rn
                    FROM embeddings e CROSS JOIN ct) WHERE rn = 1),
          mm AS (SELECT di.di AS di,
                   MIN(e.embedding[di.di]::DOUBLE) AS mn,
                   MAX(e.embedding[di.di]::DOUBLE) AS mx
                 FROM embeddings e, range(1, 65) AS di(di) GROUP BY di.di),
          sc AS (SELECT di, mn, mx,
                   CASE WHEN mx > mn THEN 255.0 / (mx - mn) ELSE 0.0 END AS scale,
                   (mx - mn) / 256.0 AS inv
                 FROM mm),
          r AS (SELECT e.vec_id, s.di,
                  s.mn + (least(greatest(floor((e.embedding[s.di]::DOUBLE - s.mn)
                    * s.scale), 0.0), 255.0) + 0.5) * s.inv AS xr
                FROM embeddings e, sc s),
          x AS (SELECT vec_id, list(xr ORDER BY di) AS recon
                FROM r GROUP BY vec_id),
          q AS (SELECT vec_id AS query_id, embedding AS q_emb
                FROM embeddings WHERE vec_id < 3),
          ql AS (SELECT query_id, list_id FROM (
                   SELECT q.query_id, ct.list_id,
                     ROW_NUMBER() OVER (PARTITION BY q.query_id
                       ORDER BY ${O.cos("q.q_emb", "ct.centroid")} DESC,
                                ct.list_id ASC) AS rn
                   FROM q CROSS JOIN ct) WHERE rn <= 4),
          sl AS (SELECT query_id, vec_id, ca FROM (
                   SELECT ql.query_id, a.vec_id,
                     ${O.cos("x.recon", "q.q_emb")} AS ca,
                     ROW_NUMBER() OVER (PARTITION BY ql.query_id
                       ORDER BY ${O.cos("x.recon", "q.q_emb")} DESC,
                                a.vec_id ASC) AS ark
                   FROM ql JOIN asg a USING (list_id)
                           JOIN x ON x.vec_id = a.vec_id
                           JOIN q ON q.query_id = ql.query_id
                   WHERE a.vec_id <> ql.query_id) WHERE ark <= 32),
          d AS (SELECT sl.query_id, sl.vec_id, sl.ca,
                  ${O.cos("e.embedding", "q.q_emb")} AS cos_raw
                FROM sl JOIN embeddings e ON e.vec_id = sl.vec_id
                        JOIN q ON q.query_id = sl.query_id)
          SELECT query_id,
                 ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, vec_id ASC) AS rk,
                 vec_id, round(cos_raw, 6) AS cos, round(ca, 6) AS cos_approx
          FROM d QUALIFY rk <= 5 ORDER BY query_id, rk""",
    "q52_region_part_revenue" ->
      """SELECT r_name, p_brand,
           COUNT(DISTINCT s_suppkey) AS n_suppliers,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         JOIN part ON l_partkey = p_partkey
         WHERE p_size <= 25
         GROUP BY r_name, p_brand ORDER BY r_name, p_brand""",
    "q02_join_topn" ->
      """SELECT o_orderkey, c_name, o_totalprice
         FROM orders JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""",
    "q03_revenue_by_nation" ->
      """SELECT n_name,
           CAST(SUM(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           JOIN customer ON o_custkey = c_custkey
           JOIN nation ON c_nationkey = n_nationkey
         GROUP BY n_name ORDER BY n_name""",
    "q04_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders
           WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
         ORDER BY c_custkey""",
    "q05_semi_join" ->
      """SELECT p_brand, COUNT(*) AS n_parts FROM part
         WHERE EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
         GROUP BY p_brand ORDER BY p_brand""",
    "q06_window_topk" ->
      """SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
               ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
           FROM orders) t
         WHERE rk <= 3 ORDER BY o_custkey, rk""",
    "q07_rollup" ->
      """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
           COALESCE(l_linestatus, 'ALL') AS ls,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
         ORDER BY rf, ls""",
    "q08_events_daily" ->
      """SELECT event_type, strftime(ts, '%Y-%m-%d') AS day, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE) AS sum_value
         FROM events GROUP BY event_type, strftime(ts, '%Y-%m-%d')
         ORDER BY event_type, day""",
    "q09_sessionize" ->
      """SELECT user_id, CAST(SUM(new_session) AS BIGINT) AS n_sessions,
           COUNT(*) AS n_events
         FROM (
           SELECT user_id,
             CASE WHEN prev_ts IS NULL
                    OR epoch_us(ts) - epoch_us(prev_ts) > 3600000000 THEN 1 ELSE 0 END AS new_session
           FROM (SELECT user_id, ts,
                   LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
                 FROM events) a) b
         GROUP BY user_id ORDER BY user_id""",
    "q10_dedup_exact" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_dups
         FROM documents GROUP BY md5(text) ORDER BY keep_doc_id""",
    "q44_stream_dedup" ->
      """SELECT md5(text) AS text_hash, MIN(doc_id) AS keep_doc_id
         FROM documents GROUP BY md5(text) ORDER BY text_hash""",
    "q152_stream_restart" ->
      """WITH arrivals AS (
           SELECT doc_id, md5(text) AS text_hash, 0 AS ph FROM documents
           UNION ALL
           SELECT doc_id + 10000, md5(text), 1 FROM documents
           WHERE doc_id % 5 = 0
           UNION ALL
           SELECT doc_id + 20000, md5(text || '!'), 1 FROM documents
           WHERE doc_id % 7 = 0)
         SELECT text_hash,
           arg_min(doc_id, ph * 1099511627776 + doc_id) AS keep_doc_id
         FROM arrivals GROUP BY text_hash ORDER BY text_hash""",
    "q158_mf_gd" -> mfOracleSql,
    "q159_douglas_peucker" -> dpOracleSql,
    "q161_heavy_hitters" ->
      // the exactness claim IS the oracle: plain GROUP BY ... HAVING over
      // the token stream (threshold = n div 30, same integer floor)
      """WITH toks AS (SELECT unnest(string_split(text, ' ')) AS token
                       FROM documents),
          nn AS (SELECT COUNT(*) // 30 AS thr FROM toks)
          SELECT token, CAST(COUNT(*) AS BIGINT) AS cnt,
                 TRUE AS exact_guarantee
          FROM toks GROUP BY token
          HAVING COUNT(*) >= (SELECT thr FROM nn)
          ORDER BY token""",
    "q162_harris" -> harrisOracleSql,
    "q163_jl_project" ->
      // per-coordinate replay: sign join + ordered list fold (list_reduce
      // from the first element == Spark's fold from 0.0 — IEEE-identical)
      s"""WITH sg AS (SELECT j, i, s FROM ${O.inp("jl_signs")}),
          t AS (SELECT e.vec_id, sg.j, sg.i,
                  e.embedding[sg.i + 1]::DOUBLE * sg.s AS v
                FROM embeddings e CROSS JOIN sg),
          f AS (SELECT vec_id, j,
                  list_reduce(list(v ORDER BY i), (ja, jb) -> ja + jb) AS y
                FROM t GROUP BY vec_id, j)
          SELECT vec_id, CAST(j AS INT) AS j, round(y, 6) + 0.0 AS y
          FROM f ORDER BY vec_id, j""",
    "q164_dead_kernels" ->
      // centroid over the FULL cleaned ring (closure included — same sum
      // order as Geom.centroid, bit-identical IEEE before the round);
      // collinear replayed both ways: the reference's signed compare and
      // the abs() repair
      s"""WITH $thematicCte
          SELECT surface_id,
            round(list_aggregate(list_transform(c, p -> p.x), 'sum')
              / len(c), 6) + 0.0 AS pi_x,
            round(list_aggregate(list_transform(c, p -> p.y), 'sum')
              / len(c), 6) + 0.0 AS pi_y,
            round(list_aggregate(list_transform(c, p -> p.z), 'sum')
              / len(c), 6) + 0.0 AS pi_z,
            ((c[2].x - c[1].x) * (c[3].y - c[1].y)
              - (c[3].x - c[1].x) * (c[2].y - c[1].y)) < 1e-12 AS col_ref,
            abs((c[2].x - c[1].x) * (c[3].y - c[1].y)
              - (c[3].x - c[1].x) * (c[2].y - c[1].y)) < 1e-12 AS col_fix
          FROM th ORDER BY surface_id""",
    "q165_triangles" ->
      // blocking-independent replay: the naive ordered 3-join enumerates
      // each triangle once as x < y < z over the SAME canonical edge set —
      // the engine's degree-oriented wedge plan must produce the same
      // per-corner counts
      s"""WITH nodes AS (SELECT doc_id,
                           row_number() OVER (ORDER BY doc_id) - 1 AS ord
                         FROM documents),
          n AS (SELECT COUNT(*) AS n FROM nodes),
          raw AS (SELECT nd.ord AS ea,
                    CASE WHEN k.k < 3 THEN
                      ((nd.ord - nd.ord % 8)
                        + ${O.md5n("nd.doc_id::VARCHAR || '@tri' || k.k")}
                          % 8) % (SELECT n FROM n)
                    ELSE ${O.md5n("nd.doc_id::VARCHAR || '@tri' || k.k")}
                      % (SELECT n FROM n) END AS eb
                  FROM nodes nd
                  CROSS JOIN (SELECT unnest(range(0, 4)) AS k) k),
          e AS (SELECT DISTINCT least(ea, eb) AS a, greatest(ea, eb) AS b
                FROM raw WHERE ea <> eb),
          tri AS (SELECT e1.a AS x, e1.b AS y, e2.b AS z
                  FROM e e1
                  JOIN e e2 ON e2.a = e1.a AND e2.b > e1.b
                  JOIN e e3 ON e3.a = e1.b AND e3.b = e2.b),
          corners AS (SELECT x AS v FROM tri
                      UNION ALL SELECT y FROM tri
                      UNION ALL SELECT z FROM tri),
          ct AS (SELECT v, COUNT(*) AS n_tri FROM corners GROUP BY v)
          SELECT nd.doc_id, CAST(ct.n_tri AS BIGINT) AS n_tri
          FROM ct JOIN nodes nd ON ct.v = nd.ord
          ORDER BY nd.doc_id""",
    "q166_jaccard_join" ->
      // blocking-independent: ALL pairs sharing a word, exact integer
      // threshold overlap·(den+num) ≥ num·(sa+sb) ⟺ J ≥ num/den — the
      // engine's prefix filter must lose nothing
      s"""WITH tk AS (SELECT doc_id,
                        unnest(list_distinct(string_split(text, ' '))) AS w
                      FROM documents),
          sz AS (SELECT doc_id, COUNT(*) AS sz FROM tk GROUP BY doc_id),
          ov AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                   COUNT(*) AS overlap
                 FROM tk a JOIN tk b ON a.w = b.w AND a.doc_id < b.doc_id
                 GROUP BY 1, 2)
          SELECT ov.doc_a, ov.doc_b, CAST(ov.overlap AS BIGINT) AS overlap,
            CAST(sa.sz AS BIGINT) AS sa, CAST(sb.sz AS BIGINT) AS sb,
            round(ov.overlap / (sa.sz + sb.sz - ov.overlap), 6) + 0.0 AS jac
          FROM ov JOIN sz sa ON sa.doc_id = ov.doc_a
                  JOIN sz sb ON sb.doc_id = ov.doc_b
          WHERE ov.overlap * 39 >= (sa.sz + sb.sz) * 19
          ORDER BY ov.doc_a, ov.doc_b""",
    "q169_stream_outer_join" ->
      // the streaming LEFT OUTER interval join must equal the relational
      // one — the sentinel protocol guarantees every unmatched view's
      // state expired (and flushed) before the query terminated
      """SELECT v.user_id, v.event_id AS view_id,
           COALESCE(c.event_id, -1) AS click_id
         FROM events v LEFT JOIN events c ON c.user_id = v.user_id
          AND c.event_type = 'click'
          AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 120 MINUTE
         WHERE v.event_type = 'view'
         ORDER BY view_id, click_id""",
    "q172_grouped_ols" ->
      // same micro-unit quantization, same min-centering, HUGEINT exact
      // sums ≡ Spark DECIMAL(38,0), same exact-int→double cast (both
      // round-to-nearest from the same 128-bit value), one division
      """WITH e AS (SELECT event_type, epoch_us(ts) AS xus,
             CAST(round(value * 1000000.0, 0) AS BIGINT) AS yu
           FROM events),
         m AS (SELECT event_type, MIN(xus) AS x0 FROM e GROUP BY 1),
         c AS (SELECT e.event_type, (e.xus - m.x0) AS xp, e.yu AS yp
               FROM e JOIN m USING (event_type)),
         a AS (SELECT event_type, COUNT(*) AS n,
                 CAST(SUM(xp) AS BIGINT) AS sx,
                 CAST(SUM(yp) AS BIGINT) AS sy,
                 SUM(xp::HUGEINT * yp) AS sxy,
                 SUM(xp::HUGEINT * xp) AS sxx
               FROM c GROUP BY 1)
         SELECT event_type, CAST(n AS BIGINT) AS n,
           CAST(sy // n AS BIGINT) AS mean_yu,
           CASE WHEN (n::HUGEINT * sxx - sx::HUGEINT * sx) = 0 THEN NULL
                ELSE round((n::HUGEINT * sxy - sx::HUGEINT * sy)::DOUBLE
                       / (n::HUGEINT * sxx - sx::HUGEINT * sx)::DOUBLE, 9)
                     + 0.0
           END AS slope
         FROM a ORDER BY event_type""",
    "q171_rrf_fusion" -> rrfOracleSql,
    "q170_hough_lines" -> houghOracleSql,
    "q168_kcore" -> {
      // 8 peel rounds as MATERIALIZED CTE pairs (each round references its
      // predecessor three times — default inlining would expand 3^8-fold,
      // the q135 lesson); round 8 ≡ fixpoint on this corpus
      val rounds = (1 to 8).map { i =>
        val prev = if (i == 1) "e0" else s"e${i - 1}"
        s"""d$i AS MATERIALIZED (SELECT a FROM $prev
                GROUP BY a HAVING COUNT(*) >= 4),
          e$i AS MATERIALIZED (SELECT e.a, e.b FROM $prev e
                JOIN d$i x ON e.a = x.a JOIN d$i y ON e.b = y.a)"""
      }.mkString(",\n          ")
      s"""WITH nodes AS (SELECT doc_id,
                           row_number() OVER (ORDER BY doc_id) - 1 AS ord
                         FROM documents),
          n AS (SELECT COUNT(*) AS n FROM nodes),
          raw AS (SELECT nd.ord AS ea,
                    CASE WHEN k.k < 2 + (nd.ord // 8) % 3 THEN
                      ((nd.ord - nd.ord % 8)
                        + ${O.md5n("nd.doc_id::VARCHAR || '@kc' || k.k")}
                          % 8) % (SELECT n FROM n)
                    WHEN k.k = 4 THEN
                      ${O.md5n("nd.doc_id::VARCHAR || '@kc' || k.k")}
                      % (SELECT n FROM n)
                    ELSE NULL END AS eb
                  FROM nodes nd
                  CROSS JOIN (SELECT unnest(range(0, 5)) AS k) k),
          e0 AS MATERIALIZED (SELECT DISTINCT a, b FROM
                 (SELECT ea AS a, eb AS b FROM raw WHERE eb IS NOT NULL
                  UNION ALL
                  SELECT eb, ea FROM raw WHERE eb IS NOT NULL)
               WHERE a <> b),
          $rounds
          SELECT nd.doc_id, CAST(COUNT(*) AS BIGINT) AS deg
          FROM e8 JOIN nodes nd ON e8.a = nd.ord
          GROUP BY nd.doc_id
          ORDER BY nd.doc_id"""
    },
    "q167_integral_image" ->
      // blocking-independent: Σ raw luma over each box straight from the
      // pixel dump — the engine's SAT decomposition (local + row band +
      // col band + corner, 4 signed corners) must reproduce the defining
      // property. W derives from the dump (16·(max tile_x + 1)).
      s"""WITH dims AS (SELECT 16 * (MAX(tile_x) + 1) AS wd
                        FROM ${O.inp("mosaic_pixels")}),
          px AS (SELECT tile_x*16 + (j.j % 16) AS wx,
                   tile_y*16 + (j.j // 16) AS wy,
                   (299*px[j.j*3+1] + 587*px[j.j*3+2]
                     + 114*px[j.j*3+3]) // 1000 AS l
                 FROM ${O.inp("mosaic_pixels")}, range(0,256) j(j)),
          bx AS (SELECT i AS box_id,
                   ${O.md5n("i::VARCHAR || '#bx0'")}
                     % (SELECT wd FROM dims) AS x0,
                   ${O.md5n("i::VARCHAR || '#by0'")}
                     % (SELECT wd FROM dims) AS y0,
                   least(${O.md5n("i::VARCHAR || '#bx0'")}
                       % (SELECT wd FROM dims)
                     + ${O.md5n("i::VARCHAR || '#bxw'")} % 31,
                     (SELECT wd FROM dims) - 1) AS x1,
                   least(${O.md5n("i::VARCHAR || '#by0'")}
                       % (SELECT wd FROM dims)
                     + ${O.md5n("i::VARCHAR || '#byh'")} % 31,
                     (SELECT wd FROM dims) - 1) AS y1
                 FROM (SELECT unnest(range(0, 25)) AS i))
          SELECT bx.box_id, bx.x0, bx.y0, bx.x1, bx.y1,
            CAST(SUM(px.l) AS BIGINT) AS box_sum
          FROM bx JOIN px ON px.wx BETWEEN bx.x0 AND bx.x1
                         AND px.wy BETWEEN bx.y0 AND bx.y1
          GROUP BY 1, 2, 3, 4, 5
          ORDER BY box_id""",
    "q160_bloom_skip" ->
      // bloom membership DECISION replayed relationally: bit P is set in a
      // file's bloom ⟺ some row of that file hashes to P, so "all k key
      // bits present" is a position join + HAVING count(distinct j) = k
      s"""WITH bf AS (SELECT file, doc_id FROM ${O.inp("bloom_files")}),
          probes AS (SELECT CAST(pk AS BIGINT) AS probe_key
                     FROM (VALUES (3), (97), (250), (444), (987654))
                       AS p(pk)),
          fpos AS (SELECT DISTINCT file, pos FROM (
            SELECT file, ${O.md5n("doc_id::VARCHAR || '#bloom0'")} % 256
              AS pos FROM bf
            UNION ALL
            SELECT file, ${O.md5n("doc_id::VARCHAR || '#bloom1'")} % 256
              FROM bf
            UNION ALL
            SELECT file, ${O.md5n("doc_id::VARCHAR || '#bloom2'")} % 256
              FROM bf) t),
          kpos AS (
            SELECT probe_key, 0 AS j,
              ${O.md5n("probe_key::VARCHAR || '#bloom0'")} % 256 AS pos
            FROM probes
            UNION ALL
            SELECT probe_key, 1,
              ${O.md5n("probe_key::VARCHAR || '#bloom1'")} % 256 FROM probes
            UNION ALL
            SELECT probe_key, 2,
              ${O.md5n("probe_key::VARCHAR || '#bloom2'")} % 256 FROM probes),
          hits AS (SELECT k.probe_key, f.file
                   FROM kpos k JOIN fpos f USING (pos)
                   GROUP BY k.probe_key, f.file
                   HAVING COUNT(DISTINCT k.j) = 3),
          opened AS (SELECT probe_key, COUNT(*) AS files_opened
                     FROM hits GROUP BY probe_key),
          nr AS (SELECT p.probe_key,
                   CAST(COUNT(d.doc_id) AS BIGINT) AS n_rows
                 FROM probes p LEFT JOIN documents d
                   ON d.doc_id = p.probe_key
                 GROUP BY p.probe_key),
          tot AS (SELECT CAST(COUNT(DISTINCT file) AS BIGINT)
                    AS files_total FROM bf)
          SELECT p.probe_key, nr.n_rows,
            CAST(COALESCE(opened.files_opened, 0) AS BIGINT)
              AS files_opened,
            tot.files_total
          FROM probes p JOIN nr USING (probe_key)
               LEFT JOIN opened USING (probe_key) CROSS JOIN tot
          ORDER BY p.probe_key""",
    "q156_hausdorff" ->
      // blocking-independent replay: exact AABB-gap candidates all-pairs,
      // then max-of-min integer squared distances in both directions
      s"""WITH pts AS (SELECT walker_id, seq, x, y FROM ${O.inp("tracks")}
                       WHERE seq % 4 = 0),
          bb AS (SELECT walker_id, MIN(x) AS mnx, MAX(x) AS mxx,
                   MIN(y) AS mny, MAX(y) AS mxy
                 FROM pts GROUP BY walker_id),
          cand AS (SELECT a.walker_id AS ta, b.walker_id AS tb
                   FROM bb a JOIN bb b ON a.walker_id < b.walker_id
                   WHERE GREATEST(0, a.mnx - b.mxx, b.mnx - a.mxx)
                         * GREATEST(0, a.mnx - b.mxx, b.mnx - a.mxx)
                       + GREATEST(0, a.mny - b.mxy, b.mny - a.mxy)
                         * GREATEST(0, a.mny - b.mxy, b.mny - a.mxy)
                       <= 90000),
          dp AS (SELECT ta AS s, tb AS t FROM cand
                 UNION ALL SELECT tb, ta FROM cand),
          dm AS (SELECT dp.s, dp.t, pa.seq,
                   MIN((pa.x-pb.x)*(pa.x-pb.x)
                     + (pa.y-pb.y)*(pa.y-pb.y)) AS md
                 FROM dp JOIN pts pa ON pa.walker_id = dp.s
                         JOIN pts pb ON pb.walker_id = dp.t
                 GROUP BY dp.s, dp.t, pa.seq),
          h AS (SELECT s, t, MAX(md) AS h FROM dm GROUP BY s, t),
          sym AS (SELECT LEAST(s, t) AS track_a, GREATEST(s, t) AS track_b,
                    MAX(h) AS hausdorff_sq
                  FROM h GROUP BY 1, 2)
          SELECT track_a, track_b, hausdorff_sq FROM sym
          ORDER BY hausdorff_sq, track_a, track_b LIMIT 50""",
    "q155_tfidf_pairs" ->
      // full TF-IDF replay: tf → df cap (≤ half the corpus) → milli-nat
      // idf (rounded ln, both engines) → integer weights/norms/dots via
      // the same posting join → one double division+sqrt → top-25 ranked
      // on the UNROUNDED similarity with (doc_a, doc_b) tiebreaks
      s"""WITH toks AS (SELECT doc_id,
                 unnest(string_split(text, ' ')) AS token FROM documents),
          tf AS (SELECT doc_id, token, COUNT(*) AS tf
                 FROM toks GROUP BY doc_id, token),
          nn AS (SELECT COUNT(*) AS n FROM documents),
          idf AS (SELECT token,
                    CAST(round(ln(((SELECT n FROM nn) + 1.0)
                      / (COUNT(*) + 1.0)) * 1000.0, 0) AS BIGINT) AS idf
                  FROM tf GROUP BY token
                  HAVING CAST(COUNT(*) AS DOUBLE)
                    <= 0.5 * (SELECT n FROM nn)),
          w AS (SELECT tf.doc_id, tf.token, tf.tf * idf.idf AS w
                FROM tf JOIN idf USING (token)),
          nrm AS (SELECT doc_id, CAST(SUM(w*w) AS BIGINT) AS nrm
                  FROM w GROUP BY doc_id),
          dots AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                     CAST(SUM(a.w * b.w) AS BIGINT) AS dot
                   FROM w a JOIN w b
                     ON a.token = b.token AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
          sim AS (SELECT doc_a, doc_b,
                    CAST(dot AS DOUBLE) / sqrt(CAST(na.nrm AS DOUBLE)
                      * CAST(nb.nrm AS DOUBLE)) AS sim_raw
                  FROM dots JOIN nrm na ON na.doc_id = dots.doc_a
                            JOIN nrm nb ON nb.doc_id = dots.doc_b)
          SELECT doc_a, doc_b, round(sim_raw, 6) + 0.0 AS sim
          FROM sim ORDER BY sim_raw DESC, doc_a, doc_b LIMIT 25""",
    "q154_dbscan" ->
      // full DBSCAN replay: brute-force all-pairs eps-neighbors (exact
      // integer math, inclusive boundary), core = |N|+self ≥ 4, clusters =
      // transitive closure of the core-core graph (q62's recursive-CTE
      // shape), border = MIN core-neighbor cluster, noise = -1
      s"""WITH RECURSIVE
          pts AS (SELECT point_id, x, y FROM ${O.inp("dbscan_points")}),
          pr AS (SELECT p.point_id AS a, q.point_id AS b
                 FROM pts p JOIN pts q ON p.point_id <> q.point_id
                  AND (p.x-q.x)*(p.x-q.x) + (p.y-q.y)*(p.y-q.y) <= 625),
          nc AS (SELECT a AS point_id, COUNT(*) AS nn FROM pr GROUP BY a),
          core AS (SELECT point_id FROM nc WHERE nn + 1 >= 4),
          ce AS (SELECT a, b FROM pr
                 WHERE a IN (SELECT point_id FROM core)
                   AND b IN (SELECT point_id FROM core)),
          reach(v, r) AS (
            SELECT point_id, point_id FROM core
            UNION
            SELECT ce.b, reach.r FROM reach JOIN ce ON ce.a = reach.v),
          comp AS (SELECT v AS point_id, MIN(r) AS cluster
                   FROM reach GROUP BY v),
          border AS (SELECT pr.a AS point_id, MIN(c.cluster) AS cluster
                     FROM pr JOIN comp c ON c.point_id = pr.b
                     WHERE pr.a NOT IN (SELECT point_id FROM core)
                     GROUP BY pr.a)
          SELECT p.point_id,
            CASE WHEN cm.cluster IS NOT NULL THEN 'core'
                 WHEN bd.cluster IS NOT NULL THEN 'border'
                 ELSE 'noise' END AS role,
            CAST(COALESCE(cm.cluster, bd.cluster, -1) AS BIGINT) AS cluster
          FROM pts p LEFT JOIN comp cm USING (point_id)
                     LEFT JOIN border bd USING (point_id)
          ORDER BY p.point_id""",
    "q153_linear_probe" -> {
      // the grouped training run replayed relationally: weights live in a
      // per-class CTE relation (3 rows) instead of q104's scalar chain —
      // each iteration is one JOIN + GROUP BY cls, referencing only its
      // predecessor (previous weights ride through as MIN()s)
      val dotW = (1 to 8).map(i => s"w.w$i*cr.x$i").mkString(" + ")
      val dotF = (1 to 8).map(i => s"w.w$i*f.x$i").mkString(" + ")
      val gIter = (1 to 6).map { i =>
        val prev = if (i == 1) "w0" else s"w${i - 1}"
        s"""g$i AS (SELECT cls, CAST(SUM(e) AS BIGINT) AS gb,
              ${(1 to 8).map(j => s"CAST(SUM((e*x$j)//1000000) AS BIGINT) AS g$j").mkString(", ")},
              MIN(pb) AS pb,
              ${(1 to 8).map(j => s"MIN(pw$j) AS pw$j").mkString(", ")},
              COUNT(*) AS n
            FROM (SELECT cr.cls,
                    least(greatest((($dotW)//1000000 + w.b)//4 + 500000,
                      0), 1000000) - cr.y*1000000 AS e,
                    ${(1 to 8).map(j => s"cr.x$j").mkString(", ")},
                    w.b AS pb,
                    ${(1 to 8).map(j => s"w.w$j AS pw$j").mkString(", ")}
                  FROM crossed cr JOIN $prev w ON cr.cls = w.cls) t
            GROUP BY cls),
          w$i AS (SELECT cls, pb - 2*gb//n AS b,
              ${(1 to 8).map(j => s"pw$j - 2*g$j//n AS w$j").mkString(", ")}
            FROM g$i)"""
      }.mkString(",\n          ")
      s"""WITH pf AS (SELECT * FROM ${O.inp("probe_feats")}),
          nn AS (SELECT COUNT(*) AS n FROM pf),
          mu AS (SELECT ${(1 to 8).map(i =>
            s"CAST(SUM(r$i) AS BIGINT)//(SELECT n FROM nn) AS m$i").mkString(", ")}
               FROM pf),
          feat AS (SELECT img_no, label,
              ${(1 to 8).map(i => s"r$i-m$i AS x$i").mkString(", ")}
            FROM pf CROSS JOIN mu),
          crossed AS (SELECT f.*, c.cls,
              CAST(CASE WHEN f.label = c.cls THEN 1 ELSE 0 END AS BIGINT) AS y
            FROM feat f CROSS JOIN
              (SELECT unnest(range(0, 3)) AS cls) c),
          w0 AS (SELECT DISTINCT cls, 0::BIGINT AS b,
              ${(1 to 8).map(i => s"0::BIGINT AS w$i").mkString(", ")}
            FROM crossed),
          $gIter,
          scored AS (SELECT f.img_no, f.label,
              ${(0 to 2).map(c => s"MAX(CASE WHEN w.cls = $c THEN " +
                s"least(greatest((($dotF)//1000000 + w.b)//4 + 500000, 0), " +
                s"1000000) END) AS s$c").mkString(", ")}
            FROM feat f CROSS JOIN w6 w GROUP BY f.img_no, f.label)
          SELECT img_no, label, s0, s1, s2, pred,
            CAST(CASE WHEN pred = label THEN 1 ELSE 0 END AS BIGINT)
              AS correct
          FROM (SELECT *, CAST(CASE WHEN s0 >= s1 AND s0 >= s2 THEN 0
                  WHEN s1 >= s2 THEN 1 ELSE 2 END AS BIGINT) AS pred
                FROM scored) z
          ORDER BY img_no"""
    },
    "q11_token_count" ->
      """SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
           length(text) AS n_chars_calc
         FROM documents ORDER BY doc_id""",
    "q12_quality" ->
      """SELECT doc_id,
           len(string_split(text, ' ')) AS n_tokens,
           round(CAST(length(text) AS DOUBLE) / len(string_split(text, ' ')), 4) AS mean_word_len,
           round(CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to'))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS stopword_ratio,
           round(CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS distinct_ratio
         FROM documents ORDER BY doc_id""",
    "q13_langid" ->
      """SELECT doc_id, lang,
           round(CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) AS en_score,
           CASE WHEN round(CAST(len(list_filter(string_split(text, ' '),
             t -> t IN ('the','a','of','and','to','in'))) AS DOUBLE)
             / len(string_split(text, ' ')), 4) >= 0.05
             THEN 'en-like' ELSE 'unk' END AS pred_lang
         FROM documents ORDER BY doc_id""",
    "q14_source_stats" ->
      """SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(CAST(n_chars AS DECIMAL(28,6))) AS DOUBLE) AS sum_chars
         FROM documents WHERE contains(text, 'spark')
         GROUP BY source ORDER BY source""",
    "q15_ann_bruteforce" ->
      """WITH q AS (SELECT vec_id AS query_id, embedding AS q_emb
                    FROM embeddings WHERE vec_id < 5),
         scored AS (
           SELECT q.query_id, e.vec_id,
             list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                    CAST(q.q_emb AS DOUBLE[])) AS cos_raw
           FROM embeddings e CROSS JOIN q
           WHERE e.vec_id <> q.query_id)
         SELECT query_id,
           ROW_NUMBER() OVER (PARTITION BY query_id
             ORDER BY cos_raw DESC, vec_id ASC) AS rk,
           vec_id, round(cos_raw, 4) AS cos
         FROM scored QUALIFY rk <= 3 ORDER BY query_id, rk"""
  )
}
