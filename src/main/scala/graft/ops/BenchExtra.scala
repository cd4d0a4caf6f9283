package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extra phase-isolation benchmarks (guide §1.4: noop-sink timing of the
  * computation, not the sink). NOT a driver surface — `graft.Bench` stays
  * the frozen contract; this main exists so OPTIMIZATION_r07.md can cite
  * where the seconds inside a composite bench entry actually go.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *        sbt "runMain graft.ops.BenchExtra"
  */
object BenchExtra {

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val localDir =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/graft-spark-tmp"
      else System.getProperty("java.io.tmpdir")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.local.dir", localDir)
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = graft.SparkEntry.sfOf(sfDir)
    val base = s"/tmp/graft_bench_${sf}_m1_v1"
    val surfaces = spark.read.parquet(s"$base/surfaces.parquet")
    val images = spark.read.parquet(s"$base/images.parquet")

    def noop(df: DataFrame): Long = {
      df.write.format("noop").mode("overwrite").save(); 0L
    }
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val defs = scala.collection.mutable.LinkedHashMap[String, () => Long]()
    def bench(name: String)(f: => Long): Unit = defs(name) = () => f
    val times = scala.collection.mutable.LinkedHashMap[String, Array[Double]]()

    // ---- tiling phase isolation ----
    bench("tiling_scan_only") {
      noop(images.select(col("image_id"), col("bytes"), col("w"), col("h"),
        col("fmt")))
    }
    bench("tiling_codec_only") {
      // codec expression with NO exchange and NO histogram pre-pass
      import graft.expr.ImageFunctions.tile_encode
      spark.sparkContext.setJobDescription("tiling: codec only")
      noop(SpatialOps.imageCells(images)
        .select(col("image_id"),
          tile_encode(col("bytes"), col("w"), col("h"), col("fmt"),
            col("cell_id")).as("t"))
        .select(col("image_id"), col("t.psnr").as("psnr")))
    }
    bench("tiling_boundaries_only") {
      val (b, d) = ImageOps.cellRangeBoundaries(
        SpatialOps.imageCells(images), math.max(cpus.toInt, 2))
      b.length.toLong + d
    }
    bench("tiling_full_count") {
      ImageOps.materializeTiles(spark, SpatialOps.imageCells(images))
        .toDF().where(col("psnr") >= 40.0 || col("psnr").isNull).count()
    }

    // ---- obj_encode phase isolation ----
    bench("obj_corners_only") {
      val (ok, _) = ObjPipeline.validated(surfaces)
      noop(ObjPipeline.corners(
        SpatialOps.triangles(ObjPipeline.withoutOpenings(ok)),
        semantics = true))
    }
    bench("obj_run_v_only") {
      val (v, _, _) = ObjPipeline.run(spark, surfaces, semantics = true)
      v.count()
    }
    bench("obj_run_full") {
      val (v, f, _) = ObjPipeline.run(spark, surfaces, semantics = true)
      v.count() + f.count()
    }

    // ---- dedup phase isolation ----
    bench("dedup_sim_sigs_only") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(docs.select(col("doc_id"), TextOps.simhash(col("text")).as("sim")))
    }
    bench("dedup_sim_edges_only") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      TextOps.simhashNearDups(docs).count()
    }
    bench("dedup_cluster_full") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      Clustering.keepList(docs.select("doc_id"),
        TextOps.simhashNearDups(docs).select("doc_a", "doc_b"))
        .where(col("is_keep")).count()
    }
    bench("dedup_minhash_bands_only") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      noop(TextOps.minhashBandTable(docs, 3, 16, 2))
    }
    bench("dedup_minhash_full") {
      TextOps.minhashNearDups(spark.read.parquet(s"$sfDir/documents.parquet"),
        k = 3, bands = 16, rows = 2, threshold = 0.5).count()
    }

    for (r <- -1 until reps; (name, f) <- defs) {
      val t0 = System.nanoTime()
      try f() catch { case e: Throwable =>
        System.err.println(s"[benchextra] $name failed: $e") }
      val t = (System.nanoTime() - t0) / 1e9
      if (r >= 0)
        times.getOrElseUpdate(name, Array.fill(reps)(-1.0))(r) = t
      spark.catalog.clearCache()
    }
    val qs = times.map { case (k, v) =>
      s""""$k":${v.filter(_ >= 0).min}""" }.mkString("{", ",", "}")
    println(s"""{"metric":"bench_extra_phase_sec","queries":$qs,"cpus":$cpus}""")
    spark.stop()
  }
}
