package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.SparkEntry

/** Plan-capture tool (guide §1: capture `.explain("formatted")` for every
  * bench query path). NOT part of the driver contract — Bench.scala stays
  * the frozen measurement surface; this main only writes plan text files to
  * `plans/r07/<query>_<tag>.txt` for the optimization record.
  *
  * Usage: sbt "runMain graft.PlanDump <tag>"  (tag = before | after)
  */
object PlanDump {

  def main(args: Array[String]): Unit = {
    val tag = if (args.nonEmpty) args(0) else "before"
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", s"${8 * 1024 * 1024}")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf = graft.SparkEntry.sfOf(sfDir)
    val mult = 1
    val nB = math.max(64L, (20000 * sf).toLong)
    val base = s"/tmp/graft_bench_${sf}_m${mult}_v1"
    val surfaces = spark.read.parquet(s"$base/surfaces.parquet")
    val images = spark.read.parquet(s"$base/images.parquet")

    val outDir = new java.io.File("plans/r07")
    outDir.mkdirs()
    def dump(name: String)(df: => DataFrame): Unit = {
      try {
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val f = new java.io.PrintWriter(new java.io.File(outDir, s"${name}_$tag.txt"))
        try f.write(plan) finally f.close()
        System.err.println(s"[plandump] wrote $name")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $name FAILED: $e")
      }
    }

    val (ok, _) = ObjPipeline.validated(surfaces)
    val triCells = SpatialOps.triangleCells(
      SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))).localCheckpoint()

    dump("spatial_join") {
      SpatialOps.cellCounts(
        SpatialOps.spatialJoin(SpatialOps.imageCells(images),
          broadcast(triCells), salt = 1))
    }
    dump("spatial_join_shuffle_salted") {
      SpatialOps.cellCounts(
        SpatialOps.spatialJoin(SpatialOps.imageCells(images),
          triCells.hint("shuffle_hash"), salt = 8))
    }
    dump("tiling") {
      ImageOps.materializeTiles(spark, SpatialOps.imageCells(images))
        .toDF().where(col("psnr") >= 40.0 || col("psnr").isNull)
    }
    // the bench action is a COUNT over the filtered tiles — capture that
    // exact consumer shape too (column pruning through the exchange only
    // shows up here)
    dump("tiling_count") {
      ImageOps.materializeTiles(spark, SpatialOps.imageCells(images))
        .toDF().where(col("psnr") >= 40.0 || col("psnr").isNull)
        .groupBy().count()
    }
    // knn is an iterative ladder; capture the round-0 candidate+topk plan
    dump("knn_round0") {
      val probes = images.where(pmod(col("phash"), lit(4L)) === 0)
        .select(col("image_id"), col("anchor_x"), col("anchor_y"))
      val cents = surfaces.select(
        col("surface_id"), col("building_id"), col("surface_class"),
        (aggregate(col("ext"), lit(0.0), (acc, p) => acc + p.getField("x")) /
          size(col("ext"))).as("cx"),
        (aggregate(col("ext"), lit(0.0), (acc, p) => acc + p.getField("y")) /
          size(col("ext"))).as("cy"))
        .withColumn("knn_cell", graft.expr.GeomFunctions.cell_encode(
          col("cx"), col("cy"), lit(SpatialOps.KnnLevel)))
      import org.apache.spark.sql.expressions.Window
      val reach = graft.geom.Cells.sizeAt(SpatialOps.KnnLevel) / 2
      // mirror knnAssignExact's round 0: one level finer than the base
      // grid (tight cover), slim projection before the window
      val round0Level =
        math.min(SpatialOps.KnnLevel + 1, graft.geom.Cells.MaxLevel)
      val cands = SpatialOps.knnRoundCandidates(probes, cents, reach,
        round0Level, SpatialOps.KnnLevel)
        .select(col("image_id"), col("surface_id"), col("dist"), col("safe"))
      val w = Window.partitionBy(col("image_id"))
        .orderBy(col("dist").asc, col("surface_id").asc)
      cands.withColumn("rk", row_number().over(w)).where(col("rk") <= 3)
    }
    val (ov, of, _) = ObjPipeline.run(spark, surfaces, semantics = true)
    dump("obj_encode_vertices") { ov }
    dump("obj_encode_faces") { of }
    dump("dedup_minhash") {
      TextOps.minhashNearDups(spark.read.parquet(s"$sfDir/documents.parquet"),
        k = 3, bands = 16, rows = 2, threshold = 0.5)
    }
    dump("dedup_cluster_edges") {
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      TextOps.simhashNearDups(docs).select("doc_a", "doc_b")
    }
    val bpeMerges = BpeTokenizer.trainFromDocs(
      spark.read.parquet(s"$sfDir/documents.parquet")
        .where(pmod(col("doc_id"), lit(10L)) === 0), nMerges = 24)
    dump("bpe_pack") {
      TextOps.packOffsetsOf(
        BpeTokenizer.tokenCounts(
          spark.read.parquet(s"$sfDir/documents.parquet"), bpeMerges),
        capacity = 2048)
    }
    dump("ann_bruteforce") {
      AnnOps.bruteForceTopK(spark.read.parquet(s"$sfDir/embeddings.parquet"),
        (0L until 32L), k = 10)
    }
    dump("q01_pricing_agg") {
      graft.SparkEntry.queries("q01_pricing_agg")(spark, sfDir)
    }
    dump("q03_revenue_by_nation") {
      graft.SparkEntry.queries("q03_revenue_by_nation")(spark, sfDir)
    }
    spark.stop()
  }
}
