package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-5 op-scale probes (NOT part of the Bench protocol — the driver's
  * headline metric is untouched): min-of-3 interleaved reps after a
  * warm-up, 32 cores, inputs localCheckpointed so generation cost is
  * excluded. Numbers recorded in BENCH.md §"Round-5 op probes".
  * Reproduce: SPARK_GRAFT_CPUS=32 sbt "runMain graft.OpProbes"
  */
object OpProbes {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.local.dir", "/dev/shm/graft_probe_tmp")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // SPARK_GRAFT_PROBE_ONLY: comma-separated name substrings to run
    val only = sys.env.get("SPARK_GRAFT_PROBE_ONLY")
      .map(_.split(",").toSeq).getOrElse(Nil)
    def time[A](name: String, n: Long)(f: => A): Unit = {
      if (only.nonEmpty && !only.exists(name.contains)) return
      val reps = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      val best = reps.min
      println(f"[probe] $name: min ${best}%.2f s over ${reps.map(r => f"$r%.2f").mkString("/")} -> ${(n / best).toLong} rows/s")
    }

    val nImg = 1000000L
    val imgs = graft.model.Synth.withAnchors(
      graft.model.Synth.images(spark, nImg, 2000L).toDF(), 2000L)
      .localCheckpoint(true)
    // warm-up
    ops.ImageOps.qualityStats(spark, imgs, 48500.0).agg(count(lit(1))).head

    time("quality_1m", nImg) {
      ops.ImageOps.qualityStats(spark, imgs, 48500.0)
        .agg(count(lit(1)), sum("lap_sq_sum")).head
    }
    time("dominant_color_1m", nImg) {
      ops.ImageOps.dominantColor(spark, imgs)
        .agg(count(lit(1)), sum("dom_count")).head
    }
    time("mosaic_1m", nImg) {
      ops.ImageOps.mosaic(spark,
        ops.SpatialOps.imageCells(imgs)).agg(count(lit(1)), sum("mos_sum")).head
    }
    val nEv = 10000000L
    val ev = spark.range(0L, nEv, 1L, 64).select(
      col("id").as("event_id"),
      timestamp_micros(((col("id") % 100000L) * 97000000L +
        (col("id") / 100000L).cast("long") * 13L).cast("long"))
        .cast("timestamp_ntz").as("ts"),
      (col("id") % 100000L).as("user_id"),
      lit("click").as("event_type"),
      (col("id") % 100).cast("double").as("value"),
      lit("{}").as("props")).localCheckpoint(true)
    ev.count()
    time("sessionize_10m", nEv) {
      ops.Sessionize.sessions(ev, 1800000000L)
        .agg(count(lit(1)), sum("n_events")).head
    }
    val docs = spark.range(0L, 2000000L, 1L, 64).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(59)),
        j => concat(lit("w"), (col("id") * 61L + j) % 5000L))).as("text"))
      .localCheckpoint(true)
    docs.count()
    time("rag_chunks_2m", 2000000L) {
      ops.TextOps.ragChunks(docs, 32, 24)
        .agg(count(lit(1)), max("chunk_hash")).head
    }
    // ---- late-round-5 ops ----
    time("zonal_stats_1m", nImg) {
      val pts = spark.range(0L, 2000L).select(col("id").as("building_ord"),
        (col("id") % 45L).cast("double") * 22.0 + 100.0,
        (col("id") / 45L).cast("double") * 22.0 + 100.0)
        .toDF("building_ord", "x0", "y0")
        .select(col("building_ord"), col("x0").as("xmin"),
          (col("x0") + 12.0).as("xmax"), col("y0").as("ymin"),
          (col("y0") + 12.0).as("ymax"))
      ops.ImageOps.zonalStats(spark, imgs, pts)
        .agg(count(lit(1)), sum("luma_sum")).head
    }
    time("hotspots_1m", nImg) {
      ops.SpatialOps.hotSpots(imgs)
        .agg(count(lit(1)), sum("n_window")).head
    }
    time("idw_samples_1m", nImg) {
      ops.ImageOps.lumaSamples(spark, imgs)
        .agg(count(lit(1)), sum("lum_sum")).head
    }
    val tris = spark.range(0L, 2000000L, 1L, 64).select(
      (col("id") % 1000L).cast("double") * 40.0,
      (col("id") / 1000L).cast("double") * 1.7,
      lit(0.0), lit(0.0))
      .toDF("x0", "y0", "z1", "z2")
      .select((col("x0") + 1.0).as("ax"), (col("y0") + 1.0).as("ay"),
        (col("x0") + 29.0).as("bx"), (col("y0") + 3.0).as("by"),
        (col("x0") + 11.0).as("cx"), (col("y0") + 27.0).as("cy"))
      .localCheckpoint(true)
    tris.count()
    time("clip_transfer_2m_tris", 2000000L) {
      ops.SpatialOps.clipTransfer(tris)
        .agg(count(lit(1)), sum("n_tris")).head
    }
    val sky = spark.range(0L, 20000000L, 1L, 64).select(
      col("id").as("doc_id"),
      pmod(col("id") * 2654435761L, lit(1000000L)).as("x"),
      pmod(col("id") * 1103515245L + 12345L, lit(1000000L)).as("y"))
      .localCheckpoint(true)
    sky.count()
    time("skyline_20m", 20000000L) {
      ops.Skyline.skyline2(spark, sky, "doc_id", "x", "y")
        .agg(count(lit(1))).head
    }
    val feats = spark.range(0L, 20000000L, 1L, 64).select(
      (col("id") % 2L).as("y"),
      (pmod(col("id") * 31L, lit(1000000L)) - 500000L).as("x1"),
      (pmod(col("id") * 37L, lit(1000000L)) - 500000L).as("x2"))
      .localCheckpoint(true)
    feats.count()
    time("lr_train_8iter_20m", 20000000L * 8) {
      ops.MlOps.trainHardSigmoidLr(feats, "y", Seq("x1", "x2"),
        iters = 8, lr = 2L)
    }

    // ---- session-2 round-5 ops (q124-q136) ----
    time("otsu_1m", nImg) {
      ops.ImageOps.otsuThreshold(spark, imgs)
        .agg(count(lit(1)), sum("otsu_t")).head
    }
    time("kde_1m", nImg) {
      ops.SpatialOps.kernelDensity(imgs, "anchor_x", "anchor_y", 14)
        .agg(count(lit(1)), sum("density")).head
    }
    time("quadtree_1m", nImg) {
      ops.SpatialOps.quadtreeLeaves(imgs, "image_id", "anchor_x",
        "anchor_y", 10, 16, 4096L)
        .agg(count(lit(1)), sum("n_points")).head
    }
    time("hilbert_key_20m", 20000000L) {
      sky.select(graft.expr.GeomFunctions.hilbert_index(col("x"), col("y"),
        lit(16)).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head
    }
    val bigTiles = graft.model.Synth.mosaicTiles(spark, side = 200)
      .localCheckpoint(true)
    bigTiles.count()
    time("morphology_10m_px", 200L * 200 * 256) {
      ops.ImageOps.morphology(spark, bigTiles)
        .agg(count(lit(1)), sum("ero_sum")).head
    }
    // wide-domain segment/point layers (the gate's 4096 m grid is
    // deliberately dense; probes use the full 2^20 m domain so blocking
    // density matches a real city-scale layer)
    def wideSegs(n: Long, salt: Long) = {
      val h = (k: Long) => xxhash64(col("id"), lit(salt + k))
      spark.range(n).select(col("id").as("seg_id"),
          pmod(h(0), lit(1048576L)).as("x1"),
          pmod(h(1), lit(1048576L)).as("y1"),
          (pmod(h(2), lit(385L)) - 192L).as("dx"),
          (pmod(h(3), lit(385L)) - 192L).as("dy"))
        .select(col("seg_id"), col("x1"), col("y1"),
          greatest(lit(0L), least(lit(1048575L), col("x1") + col("dx")))
            .as("x2"),
          greatest(lit(0L), least(lit(1048575L), col("y1") + col("dy")))
            .as("y2"))
    }
    val segsA = wideSegs(1000000L, 11L).localCheckpoint(true)
    val segsB = wideSegs(1000000L, 77L).localCheckpoint(true)
    segsA.count(); segsB.count()
    time("seg_crossings_1m_x_1m", 2000000L) {
      ops.SpatialOps.segmentCrossings(segsA, segsB)
        .agg(count(lit(1))).head
    }
    val wpts = spark.range(1000000L).select(col("id").as("point_id"),
        pmod(xxhash64(col("id"), lit(401L)), lit(1048576L)).as("x"),
        pmod(xxhash64(col("id"), lit(402L)), lit(1048576L)).as("y"))
      .localCheckpoint(true)
    wpts.count()
    time("snap_1m_x_1m", 1000000L) {
      ops.SpatialOps.snapToSegments(wpts, segsA, radius = 64L)
        .agg(count(lit(1))).head
    }
    val wdocs = spark.range(0L, 50000L, 1L, 64).select(
      col("id").as("doc_id"),
      concat_ws(" ", transform(sequence(lit(0), lit(49)),
        j => concat(lit("w"), (col("id") * 61L + j) % 4000L))).as("text"))
      .localCheckpoint(true)
    wdocs.count()
    time("winnow_matches_50k", 50000L) {
      ops.TextOps.winnowMatches(wdocs, 12, 8)
        .agg(count(lit(1))).head
    }
    time("dup_spans_50k", 50000L) {
      ops.TextOps.dupSpans(wdocs, 30)
        .agg(count(lit(1)), sum("span_chars")).head
    }
    spark.stop()

  }
}
