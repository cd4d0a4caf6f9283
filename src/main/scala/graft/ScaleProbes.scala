package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-6 linearity sweep (NOT part of the Bench protocol): every
  * data-sized round-5 op runs at two input scales ~10× apart and reports
  * rows/s at both plus the throughput ratio (rps_big / rps_small — ~1.0 is
  * linear scaling, well below ~0.7 flags a super-linear cliff the sf0.01
  * correctness gate cannot see; round-5 verdict item #1). Inputs are
  * localCheckpointed and counted so generation is excluded; each leg is
  * timed `SPARK_GRAFT_SCALE_REPS` times (default 1 — the ratio compares
  * two legs of the SAME run, so box noise largely cancels) after one
  * JVM/codegen warm-up on the small leg. cpu_control prints first, as in
  * Bench, to gauge the box. Numbers recorded in BENCH.md §Round-6.
  * Reproduce: SPARK_GRAFT_CPUS=32 sbt "runMain graft.ScaleProbes"
  */
object ScaleProbes {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft_probe_tmp")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    val reps = sys.env.getOrElse("SPARK_GRAFT_SCALE_REPS", "1").toInt
    // bidirectional substring match so a probe-level selector (e.g.
    // "dup_spans_roll") also opens its enclosing group gate ("dup_spans")
    def sel(name: String): Boolean =
      only.isEmpty || only.exists(o => name.contains(o) || o.contains(name))

    def timeOnce(f: () => Unit): Double = {
      val t0 = System.nanoTime(); f(); (System.nanoTime() - t0) / 1e9
    }
    /** Two-scale probe: warm on the small leg, then min-of-reps each leg. */
    def pair(name: String, n1: Long, n2: Long)
            (small: () => Unit)(big: () => Unit): Unit = {
      if (!sel(name)) return
      small() // warm-up: JIT + codegen + page cache
      spark.catalog.clearCache()
      // ops that localCheckpoint intermediates (dbscan pairs, clustering
      // frontiers) leave dead RDD storage until a GC lets ContextCleaner
      // reap it — force one between legs so the big leg starts clean
      def reap(): Unit = System.gc()
      val s1 = (1 to reps).map(_ => { val t = timeOnce(small); spark.catalog.clearCache(); reap(); t }).min
      val s2 = (1 to reps).map(_ => { val t = timeOnce(big); spark.catalog.clearCache(); reap(); t }).min
      val r1 = n1 / s1; val r2 = n2 / s2
      println(f"[scale] op=$name n1=$n1 sec1=$s1%.2f rps1=${r1.toLong} " +
        f"n2=$n2 sec2=$s2%.2f rps2=${r2.toLong} ratio=${r2 / r1}%.3f")
    }

    // box gauge (same expression as Bench's cpu_control)
    if (sel("cpu_control")) {
      val t = timeOnce(() => {
        spark.range(0, 4L << 30, 1, cpus.toInt)
          .select(max(xxhash64(xxhash64(xxhash64(col("id")))))).head(); ()
      })
      println(f"[scale] op=cpu_control sec=$t%.2f (quiet-box 32c ref 2.14)")
    }

    // ---- q62 near-dup clustering: 1M vs 10M vertices ----
    // chains of 100 (diameter 99 — pointer jumping needs its log rounds),
    // ~0.99 edges/vertex, plus the vertex table
    def graph(n: Long) = {
      val v = spark.range(n).select(col("id").as("doc_id"))
        .localCheckpoint(true)
      val e = spark.range(n).where(pmod(col("id"), lit(100L)) =!= 99L)
        .select(col("id").as("doc_a"), (col("id") + 1L).as("doc_b"))
        .localCheckpoint(true)
      v.count(); e.count(); (v, e)
    }
    if (sel("cluster")) {
      val (v1, e1) = graph(1000000L)
      val (v2, e2) = graph(10000000L)
      pair("cluster", 1000000L, 10000000L)(
        () => assert(ops.Clustering.keepList(v1, e1)
          .where(col("is_keep")).count() == 10000L))(
        () => assert(ops.Clustering.keepList(v2, e2)
          .where(col("is_keep")).count() == 100000L))
    }

    // ---- q114 raster CC: 1.05M vs 10.2M pixels ----
    if (sel("raster_cc")) {
      val t1 = model.Synth.mosaicTiles(spark, side = 64)
        .repartition(64).localCheckpoint(true)
      val t2 = model.Synth.mosaicTiles(spark, side = 200)
        .repartition(64).localCheckpoint(true)
      t1.count(); t2.count()
      pair("raster_cc", 64L * 64 * 256, 200L * 200 * 256)(
        () => ops.ImageOps.rasterComponents(spark, t1)
          .agg(count(lit(1)), sum("n_px")).head())(
        () => ops.ImageOps.rasterComponents(spark, t2)
          .agg(count(lit(1)), sum("n_px")).head())
    }

    // ---- q124/q125 fingerprint ops: 50k vs 500k docs, BOTH hash modes ----
    // (the md5-vs-roll legs are ALSO round-5 item #2's speedup evidence)
    // near-dup structure INDEPENDENT of scale: 3 exact copies per text
    // (gid = id div 3) and ~78% word overlap with gid±1 via a stride-11
    // window over an UNBOUNDED vocabulary — pair cardinality stays O(n) at
    // every scale. (The first sweep used a FIXED 4000-word vocab: at 500k
    // docs every text had 125 exact copies and the match join exploded
    // quadratically — measuring the corpus degeneracy, not the op.)
    def corpus(n: Long, wordsPerDoc: Int) = {
      val d = spark.range(0L, n, 1L, 64).select(
        col("id").as("doc_id"),
        concat_ws(" ", transform(sequence(lit(0), lit(wordsPerDoc - 1)),
          j => concat(lit("w"), expr("id div 3") * 11L + j))).as("text"))
        .localCheckpoint(true)
      d.count(); d
    }
    lazy val w1 = corpus(50000L, 50)
    lazy val w2 = corpus(500000L, 50)
    // long docs (~6.9k chars): the per-position digest DOMINATES here —
    // the shape where md5-vs-roll is the honest comparison
    lazy val wl = corpus(5000L, 1000)
    if (sel("winnow")) {
      pair("winnow_md5_vs_roll_50k", 50000L, 50000L)(
        () => ops.TextOps.winnowMatches(w1, 12, 8, "md5")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.winnowMatches(w1, 12, 8, "roll")
          .agg(count(lit(1))).head())
      pair("winnow_long_md5_vs_roll_5k", 5000L, 5000L)(
        () => ops.TextOps.winnowMatches(wl, 12, 8, "md5")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.winnowMatches(wl, 12, 8, "roll")
          .agg(count(lit(1))).head())
      // fingerprinting alone (no match join): the stage the fused pass
      // replaces — where the md5-vs-roll gap actually lives
      pair("winnow_fps_long_md5_vs_roll_5k", 5000L, 5000L)(
        () => ops.TextOps.winnowFingerprints(wl, 12, 8, "md5")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.winnowFingerprints(wl, 12, 8, "roll")
          .agg(count(lit(1))).head())
      pair("winnow_roll", 50000L, 500000L)(
        () => ops.TextOps.winnowMatches(w1, 12, 8, "roll")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.winnowMatches(w2, 12, 8, "roll")
          .agg(count(lit(1))).head())
    }
    if (sel("dup_spans")) {
      pair("dup_spans_md5_vs_roll_50k", 50000L, 50000L)(
        () => ops.TextOps.dupSpans(w1, 30, "md5")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.dupSpans(w1, 30, "roll")
          .agg(count(lit(1))).head())
      pair("dup_spans_long_md5_vs_roll_5k", 5000L, 5000L)(
        () => ops.TextOps.dupSpans(wl, 30, "md5")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.dupSpans(wl, 30, "roll")
          .agg(count(lit(1))).head())
      pair("dup_spans_roll", 50000L, 500000L)(
        () => ops.TextOps.dupSpans(w1, 30, "roll")
          .agg(count(lit(1))).head())(
        () => ops.TextOps.dupSpans(w2, 30, "roll")
          .agg(count(lit(1))).head())
    }

    // ---- q147 sweep line + q88 sessions under it: 10M vs 100M events ----
    def events(n: Long) = {
      val e = spark.range(0L, n, 1L, 128).select(
        col("id").as("event_id"),
        ((col("id") % 100000L) * 97000000L +
          expr("id div 100000") * 13000000L).as("ts_us_raw"),
        (col("id") % 100000L).as("user_id"))
        .select(col("event_id"), col("user_id"),
          timestamp_micros(col("ts_us_raw")).cast("timestamp_ntz").as("ts"),
          lit(0.0).as("value"))
        .localCheckpoint(true)
      e.count(); e
    }
    if (sel("sweep_line")) {
      val e1 = events(10000000L)
      val e2 = events(100000000L)
      pair("sweep_line", 10000000L, 100000000L)(
        () => ops.Sessionize.peakConcurrency(e1, 1800000000L).head())(
        () => ops.Sessionize.peakConcurrency(e2, 1800000000L).head())
    }

    // ---- q138 budget cut: 10M vs 100M docs ----
    def weighted(n: Long) = {
      val d = spark.range(0L, n, 1L, 128).select(
        col("id").as("doc_id"),
        concat(lit("src"), pmod(col("id"), lit(20L))).as("source"),
        (pmod(xxhash64(col("id")), lit(900L)) + 100L).as("weight"))
        .localCheckpoint(true)
      d.count(); d
    }
    if (sel("budget_cut")) {
      val d1 = weighted(10000000L)
      val d2 = weighted(100000000L)
      pair("budget_cut", 10000000L, 100000000L)(
        () => ops.TextOps.budgetCut(d1, "weight", 50000000L)
          .agg(count(lit(1)), sum("weight")).head())(
        () => ops.TextOps.budgetCut(d2, "weight", 500000000L)
          .agg(count(lit(1)), sum("weight")).head())
    }

    // ---- q106 zonal stats: 1M vs 10M images ----
    if (sel("zonal")) {
      val zones = spark.range(0L, 2000L).select(col("id").as("building_ord"),
          (col("id") % 45L).cast("double") * 22.0 + 100.0,
          (col("id") / 45L).cast("double") * 22.0 + 100.0)
        .toDF("building_ord", "x0", "y0")
        .select(col("building_ord"), col("x0").as("xmin"),
          (col("x0") + 12.0).as("xmax"), col("y0").as("ymin"),
          (col("y0") + 12.0).as("ymax"))
      def imgs(n: Long) = {
        val i = model.Synth.withAnchors(
          model.Synth.images(spark, n, 2000L).toDF(), 2000L)
          .localCheckpoint(true)
        i.count(); i
      }
      val i1 = imgs(1000000L)
      val i2 = imgs(10000000L)
      pair("zonal", 1000000L, 10000000L)(
        () => ops.ImageOps.zonalStats(spark, i1, zones)
          .agg(count(lit(1)), sum("luma_sum")).head())(
        () => ops.ImageOps.zonalStats(spark, i2, zones)
          .agg(count(lit(1)), sum("luma_sum")).head())
    }

    // ---- q82/q84/q130 manifest planning: 100k vs 1M files ----
    if (sel("manifest_plan")) {
      def manifest(n: Long) = {
        val m = spark.range(n).select(
          concat(lit("file:/fleet/part-"),
            lpad(col("id").cast("string"), 8, "0"), lit(".parquet")).as("file"),
          (col("id") * 10L).as("min_v"), (col("id") * 10L + 9L).as("max_v"),
          lit(1000L).as("n_rows"),
          when(pmod(xxhash64(col("id")), lit(5L)) === 0L,
            pmod(xxhash64(col("id"), lit(1L)), lit(40000L)) + 1000L)
            .otherwise(lit(256L * 1024L * 1024L)).as("file_bytes"))
          .localCheckpoint(true)
        m.count(); m
      }
      val m1 = manifest(100000L)
      val m2 = manifest(1000000L)
      pair("manifest_plan", 100000L, 1000000L)(
        () => {
          assert(sources.StatsManifest.planPrune(m1, "v", 0L, Long.MaxValue)
            .count() == 100000L)
          sources.StatsManifest.compactBins(m1, 50000L, 200000L).length; ()
        })(
        () => {
          assert(sources.StatsManifest.planPrune(m2, "v", 0L, Long.MaxValue)
            .count() == 1000000L)
          sources.StatsManifest.compactBins(m2, 50000L, 200000L).length; ()
        })
    }

    // ---- q83 incremental dedup: 50k vs 500k increment against 10× history ----
    if (sel("incr_dedup")) {
      val h1 = corpus(100000L, 50)
      val h2 = corpus(1000000L, 50)
      pair("incr_dedup", 50000L, 500000L)(
        () => ops.TextOps.incrementalDedup(w1, h1)
          .agg(count(lit(1))).head())(
        () => ops.TextOps.incrementalDedup(w2, h2)
          .agg(count(lit(1))).head())
    }

    // ---- r5 item #3 Done criterion: 8k merges on a 1M-word vocabulary ----
    // (driver-local trainer — one collect of the vocab, zero jobs/merge)
    if (sel("bpe_train")) {
      val chars = "abcdefghijklmnopqrstuvwxyz"
      val vocab = Array.tabulate(1000000) { i =>
        val len = 3 + (i % 10)
        val sb = new StringBuilder
        var x = i.toLong * 2654435761L
        (0 until len).foreach { _ =>
          sb += chars(((x >>> 7) % 26).toInt.abs)
          x = x * 6364136223846793005L + 1442695040888963407L
        }
        ((i % 997 + 1).toLong, sb.result())
      }
      val t0 = System.nanoTime()
      val merges = ops.BpeTokenizer.trainLocal(vocab, 8000)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[scale] op=bpe_train_local vocab=1000000 merges=${merges.length} sec=$sec%.1f")
    }

    // ================= round-6 ops (q154-q163) =================

    // ---- q154 DBSCAN: 1M vs 10M points, density held CONSTANT ----
    // clusters of 10 points in ±30 boxes on a 200-spaced center grid that
    // GROWS with n (pair cardinality O(n) at every scale; a fixed domain
    // would measure density blowup, not the op — the winnowing lesson).
    // 10 pts/box ≈ 2-5 eps-neighbors each (> minPts=4 for the box core) —
    // GPS-fix-like density; 40/box made the checkpointed pair stream ~25×n
    // rows and starved execution memory at the 10M leg
    def dbPts(n: Long) = {
      val nc = n / 10
      val g = math.ceil(math.sqrt(nc.toDouble)).toLong
      val d = spark.range(0L, n, 1L, 64).select(
        col("id").as("point_id"),
        (pmod(col("id"), lit(nc)) % g * 200L + 100L +
          pmod(xxhash64(col("id"), lit(1L)), lit(61L)) - 30L).as("x"),
        (expr(s"(id % $nc) div $g") * 200L + 100L +
          pmod(xxhash64(col("id"), lit(2L)), lit(61L)) - 30L).as("y"))
        .localCheckpoint(true)
      d.count(); d
    }
    if (sel("dbscan")) {
      val p1 = dbPts(1000000L); val p2 = dbPts(10000000L)
      pair("dbscan", 1000000L, 10000000L)(
        () => ops.Dbscan.dbscan(p1, 25L, 4)
          .agg(count(lit(1)), countDistinct(col("cluster"))).head())(
        () => ops.Dbscan.dbscan(p2, 25L, 4)
          .agg(count(lit(1)), countDistinct(col("cluster"))).head())
    }

    // ---- q159 Douglas-Peucker: 1M vs 10M track points ----
    if (sel("douglas")) {
      val t1 = SparkEntry.synthTracks(spark, 5000L, 200L)
        .repartition(64).localCheckpoint(true)
      val t2 = SparkEntry.synthTracks(spark, 50000L, 200L)
        .repartition(64).localCheckpoint(true)
      t1.count(); t2.count()
      pair("douglas_peucker", 1000000L, 10000000L)(
        () => ops.TrajectoryOps.douglasPeucker(t1, 48L, 8)
          .agg(count(lit(1))).head())(
        () => ops.TrajectoryOps.douglasPeucker(t2, 48L, 8)
          .agg(count(lit(1))).head())
    }

    // ---- q161 exact heavy hitters: 10M vs 100M tokens ----
    // quadratic-skew stream: token (h² div 1024) for h ~ U[0,1024) —
    // density ∝ 1/√t, a handful of true heavy hitters at thr = n/50.
    // Input lands as tmpfs PARQUET, not heap checkpoint storage: 110M
    // deserialized string rows as RDD storage squeezed the unified pool
    // and the big leg measured eviction, not the sketch
    def hhToks(n: Long) = {
      val path = s"/dev/shm/graft_probe_tmp/hh_$n"
      spark.range(0L, n, 1L, 64)
        .withColumn("h", pmod(xxhash64(col("id"), lit(3L)), lit(1024L)))
        .select(concat(lit("t"), expr("(h * h) div 1024")).as("token"))
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    if (sel("heavy_hitters")) {
      val h1 = hhToks(10000000L); val h2 = hhToks(100000000L)
      pair("heavy_hitters", 10000000L, 100000000L)(
        () => assert(ops.SketchOps.heavyHitters(h1, "token", 10000000L / 50)
          .count() >= 1))(
        () => assert(ops.SketchOps.heavyHitters(h2, "token", 100000000L / 50)
          .count() >= 1))
    }

    // ---- q155 TF-IDF pairs: 50k vs 500k docs (stride corpus — df ≤ ~9,
    // so the posting join's Σdf² stays O(n)) ----
    if (sel("tfidf")) {
      pair("tfidf_pairs", 50000L, 500000L)(
        () => ops.TextOps.tfidfCosinePairs(w1, 100).count())(
        () => ops.TextOps.tfidfCosinePairs(w2, 100).count())
    }

    // ---- q156 Hausdorff: 1M vs 10M track points, start-domain GROWN
    // with √walkers so candidate-pair density is constant. Center spacing
    // 600 vs track extent ≤ ~398 ⇒ in-row neighbor gap ~200 ≤ maxGap 300:
    // every track really enters ~2 full |A|·|B| pair evaluations (an 800
    // spacing left the gap screen rejecting EVERYTHING — the probe then
    // timed the blocking join alone; require(>0) pins against that) ----
    def hwTracks(nW: Long) = {
      val g = math.ceil(math.sqrt(nW.toDouble)).toLong
      val d = spark.range(0L, nW * 200L, 1L, 64).select(
        expr("id div 200").as("walker_id"), (col("id") % 200L).as("seq"))
        .select(col("walker_id"), col("seq"),
          (col("walker_id") % g * 600L + 1000L +
            pmod(xxhash64(col("walker_id"), col("seq"), lit(5L)),
              lit(21L)) * col("seq") / 10L).cast("long").as("x"),
          (expr(s"(walker_id div $g)") * 600L + 1000L +
            pmod(xxhash64(col("walker_id"), col("seq"), lit(6L)),
              lit(21L)) * col("seq") / 10L).cast("long").as("y"))
        .localCheckpoint(true)
      d.count(); d
    }
    if (sel("hausdorff")) {
      val h1 = hwTracks(5000L); val h2 = hwTracks(50000L)
      pair("hausdorff", 1000000L, 10000000L)(
        () => require(ops.TrajectoryOps.hausdorffPairs(h1, 4L, 300L, 1024L, 50)
          .count() > 0, "degenerate hausdorff probe: 0 pairs"))(
        () => require(ops.TrajectoryOps.hausdorffPairs(h2, 4L, 300L, 1024L, 50)
          .count() > 0, "degenerate hausdorff probe: 0 pairs"))
    }

    // ---- q165 triangle counting: 1M vs 10M vertices, 8-node communities
    // (3 in-community + 1 global edge per vertex — triangle count O(n),
    // degree-bounded wedge fan-out) ----
    def triEdges(n: Long) = {
      val d = spark.range(0L, n * 4L, 1L, 64).select(
        expr("id div 4").as("ea"), (col("id") % 4L).as("k"))
        .select(col("ea"),
          when(col("k") < 3,
            expr("ea - ea % 8") + pmod(xxhash64(col("ea"), col("k")), lit(8L)))
          .otherwise(pmod(xxhash64(col("ea"), col("k")), lit(n))).as("eb"))
        .localCheckpoint(true)
      d.count(); d
    }
    if (sel("triangles")) {
      val t1 = triEdges(1000000L); val t2 = triEdges(10000000L)
      pair("triangles", 1000000L, 10000000L)(
        () => require(ops.Clustering.triangleCounts(t1, "ea", "eb")
          .count() > 0))(
        () => require(ops.Clustering.triangleCounts(t2, "ea", "eb")
          .count() > 0))
    }

    // ---- q168 k-core: same communities, heterogeneous density (2/3/4
    // in-community edges by community index), k=4 — peel depth stays
    // constant as n grows because communities are independent ----
    def kcEdges(n: Long) = {
      // tmpfs parquet, not heap checkpoint storage (the heavy_hitters
      // lesson): 40M deserialized rows rooted for the whole probe would
      // fight the peel rounds for heap
      val path = s"/dev/shm/graft_probe_tmp/kc_$n"
      spark.range(0L, n * 5L, 1L, 64).select(
        expr("id div 5").as("ea"), (col("id") % 5L).as("k"))
        .select(col("ea"),
          when(col("k") < lit(2L) + pmod(expr("ea div 8"), lit(3L)),
            expr("ea - ea % 8") + pmod(xxhash64(col("ea"), col("k")), lit(8L)))
          .when(col("k") === 4L, pmod(xxhash64(col("ea"), col("k")), lit(n)))
          .otherwise(lit(null)).as("eb"))
        .where(col("eb").isNotNull)
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    if (sel("kcore")) {
      val k1 = kcEdges(1000000L); val k2 = kcEdges(10000000L)
      pair("kcore", 1000000L, 10000000L)(
        () => require(ops.Clustering.kCore(k1, 4, "ea", "eb").count() > 0))(
        () => require(ops.Clustering.kCore(k2, 4, "ea", "eb").count() > 0))
    }

    // ---- q166 exact Jaccard join: the winnowing corpus (3 exact copies
    // per text, unbounded vocabulary ⇒ scale-independent pair density) ----
    if (sel("jaccard_join")) {
      pair("jaccard_join", 50000L, 500000L)(
        () => require(ops.TextOps.jaccardJoin(w1, 9L, 10L).count() > 0))(
        () => require(ops.TextOps.jaccardJoin(w2, 9L, 10L).count() > 0))
    }

    // ---- q167 integral image: 16M vs 156M pixels (250² vs 780² tiles),
    // 1000 query boxes both legs — times the SAT build + carry prefixes ----
    if (sel("integral")) {
      def mos(side: Int) = {
        val d = graft.model.Synth.mosaicTiles(spark, side)
          .repartition(64).localCheckpoint(true)
        d.count(); d
      }
      val m1 = mos(250); val m2 = mos(780)
      def boxes(side: Int) = {
        val W = side * 16
        spark.range(0L, 1000L, 1L, 4).select(col("id").as("box_id"),
          pmod(xxhash64(col("id"), lit(11L)), lit((W - 120).toLong)).as("x0"),
          pmod(xxhash64(col("id"), lit(12L)), lit((W - 120).toLong)).as("y0"))
          .select(col("box_id"), col("x0"), col("y0"),
            (col("x0") + 100L).as("x1"), (col("y0") + 100L).as("y1"))
      }
      val b1 = boxes(250); val b2 = boxes(780)
      pair("integral", 250L * 250 * 256, 780L * 780 * 256)(
        () => require(ops.ImageOps.integralBoxSums(spark, m1, b1)
          .count() == 1000L))(
        () => require(ops.ImageOps.integralBoxSums(spark, m2, b2)
          .count() == 1000L))
    }

    // ---- q158 MF-GD: 1M vs 10M ratings (100k vs 1M users × ~10) ----
    if (sel("mf_gd")) {
      def ratings(nu: Long) = {
        val d = SparkEntry.synthRatings(spark, nu, nu / 10)
          .repartition(64).localCheckpoint(true)
        (d.count(), d)
      }
      // the rated grid is nu × nu/10 at 1/3 fill → ratings ≈ nu²/30
      val (n1, r1) = ratings(5500L)  // ≈1.0M
      val (n2, r2) = ratings(17400L) // ≈10.1M
      pair("mf_gd", n1, n2)(
        () => { val (u, v) = ops.MlOps.mfTrain(r1, 2, 3, 2L, 5L)
          u.agg(count(lit(1))).head(); v.agg(count(lit(1))).head(); () })(
        () => { val (u, v) = ops.MlOps.mfTrain(r2, 2, 3, 2L, 5L)
          u.agg(count(lit(1))).head(); v.agg(count(lit(1))).head(); () })
    }

    spark.stop()
  }
}
