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
    spark.stop()
  }
}
