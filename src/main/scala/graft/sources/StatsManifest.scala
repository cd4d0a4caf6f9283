package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iceberg-style per-file stats manifest + data-skipping reads over plain
  * parquet (no Iceberg jar in this container — SURVEY §7.6): after a write,
  * one read-back pass aggregates per-file min/max/count for the declared
  * stats columns into a `<dir>_manifest` sidecar table; range queries then
  * consult the manifest FIRST and open only the files whose [min, max]
  * interval overlaps the predicate.
  *
  * 100 TB design: the manifest is the pruning currency — file-count-sized
  * (one row per data file), so the planning collect is metadata-scale, NOT
  * data-scale, exactly like an Iceberg manifest scan. Skipping is real I/O
  * avoidance: unopened files are never listed in the scan. Pair the write
  * with `repartitionByRange` on the stats column and file intervals become
  * disjoint — a point/range query opens O(1) of the fleet's files. The
  * read-back stats pass is one full scan at write time; with real Iceberg
  * or parquet footer reads it becomes metadata-only — a function swap, not
  * a plan change (the manifest schema stays identical).
  */
object StatsManifest {

  /** Write `df` as parquet at `dir` plus the per-file stats manifest at
    * `<dir>_manifest`; returns the manifest frame.
    */
  def write(df: DataFrame, dir: String, statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "at least one stats column")
    df.write.mode("overwrite").parquet(dir)
    val spark = df.sparkSession
    val back = spark.read.parquet(dir)
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val man = back
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
    man.coalesce(1).write.mode("overwrite").parquet(dir + "_manifest")
    spark.read.parquet(dir + "_manifest")
  }

  /** Inclusive range read `lo <= c <= hi` that opens ONLY overlapping
    * files. Returns (result, filesOpened, filesTotal) — the counts are the
    * skipping evidence (ManifestSpec pins filesOpened < filesTotal on a
    * range-partitioned layout).
    */
  def prunedRead(spark: SparkSession, dir: String, c: String,
                 lo: Long, hi: Long): (DataFrame, Long, Long) = {
    val man = spark.read.parquet(dir + "_manifest")
    val files = man
      .where(col(s"max_$c") >= lo && col(s"min_$c") <= hi)
      .select("file").collect().map(_.getString(0))
    val total = man.count()
    val out =
      if (files.isEmpty) spark.read.parquet(dir).where(lit(false))
      else spark.read.parquet(files.toIndexedSeq: _*)
        .where(col(c) >= lo && col(c) <= hi)
    (out, files.length.toLong, total)
  }
}
