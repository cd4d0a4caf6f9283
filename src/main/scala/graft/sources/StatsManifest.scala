package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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
    // a fresh overwrite is a new table birth: reset the snapshot log so
    // version numbers are deterministic across reruns
    val spark = df.sparkSession
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val parent = dirPath.getParent
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(parent).map(_.getPath)
      .filter(_.getName.startsWith(s"${dirPath.getName}_manifest"))
      .foreach(fs.delete(_, true))
    refreshManifest(spark, dir, statsCols)
  }

  /** Append `df` to an existing layout and refresh the manifest (the
    * incremental-ingest path that produces the small-file problem
    * `compact` exists to fix).
    */
  def append(df: DataFrame, dir: String, statsCols: Seq[String]): DataFrame = {
    df.write.mode("append").parquet(dir)
    refreshManifest(df.sparkSession, dir, statsCols)
  }

  /** Per-file stats of `scanned` (a read-back frame): min/max of every
    * stats column, row count, file size (`_metadata.file_size` — the
    * bin-packing currency for `compact`).
    */
  private def manifestOf(scanned: DataFrame,
                         statsCols: Seq[String]): DataFrame = {
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) ++
      Seq(count(lit(1)).as("n_rows"),
        max(col("_metadata.file_size")).as("file_bytes"))
    scanned.groupBy(col("_metadata.file_path").as("file"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** Commit `man` as the current manifest AND as the next numbered
    * snapshot (`<dir>_manifest_v<N>`) — the Delta/Iceberg log entry that
    * makes `timeTravelRead` possible. Returns the committed version.
    */
  private def commitManifest(spark: SparkSession, dir: String,
                             man: DataFrame): Long = {
    val v = latestVersion(spark, dir) + 1
    man.coalesce(1).write.mode("overwrite").parquet(dir + "_manifest")
    spark.read.parquet(dir + "_manifest").coalesce(1)
      .write.mode("overwrite").parquet(s"${dir}_manifest_v$v")
    v
  }

  /** Highest committed snapshot version (0 = none). */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val parent = new org.apache.hadoop.fs.Path(dir).getParent
    val name = new org.apache.hadoop.fs.Path(dir).getName
    val fs = parent.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(parent)) return 0L
    fs.listStatus(parent).map(_.getPath.getName)
      .collect { case n if n.startsWith(s"${name}_manifest_v") =>
        n.stripPrefix(s"${name}_manifest_v").toLong
      }
      .foldLeft(0L)(math.max)
  }

  /** Rebuild `<dir>_manifest` from a full-directory read-back and commit a
    * snapshot. Correct only while every file under `dir` is live (write/
    * append); `compact` maintains its manifest incrementally instead, so
    * superseded files stay on disk for time travel without re-entering the
    * manifest.
    */
  def refreshManifest(spark: SparkSession, dir: String,
                      statsCols: Seq[String]): DataFrame = {
    require(statsCols.nonEmpty, "at least one stats column")
    commitManifest(spark, dir, manifestOf(spark.read.parquet(dir), statsCols))
    spark.read.parquet(dir + "_manifest")
  }

  /** Read the table as of snapshot `version`: the full file list of that
    * manifest (superseded files resolve as long as `vacuum` has not run).
    */
  def timeTravelRead(spark: SparkSession, dir: String,
                     version: Long): DataFrame = {
    val files = spark.read.parquet(s"${dir}_manifest_v$version")
      .select("file").collect().map(_.getString(0))
    spark.read.parquet(files.toIndexedSeq: _*)
  }

  /** Delete every data file not referenced by the CURRENT manifest, plus
    * all non-current snapshot manifests — reclaims the space compaction
    * left behind and (by design, like Delta VACUUM) forfeits time travel.
    * Returns the number of data files deleted.
    */
  def vacuum(spark: SparkSession, dir: String): Long = {
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val live = spark.read.parquet(dir + "_manifest")
      .select("file").collect()
      .map(r => new org.apache.hadoop.fs.Path(r.getString(0)).getName).toSet
    val stale = fs.listStatus(dirPath).map(_.getPath)
      .filter(p => p.getName.endsWith(".parquet") && !live(p.getName))
    stale.foreach(fs.delete(_, false))
    val current = latestVersion(spark, dir)
    val parent = dirPath.getParent
    val name = dirPath.getName
    fs.listStatus(parent).map(_.getPath)
      .filter { p =>
        p.getName.startsWith(s"${name}_manifest_v") &&
          p.getName != s"${name}_manifest_v$current"
      }
      .foreach(fs.delete(_, true))
    stale.length.toLong
  }

  /** Small-file compaction (OPTIMIZE bin-packing — the maintenance op
    * every incremental sink needs): files below `smallBytes` are first-fit
    * bin-packed (deterministic file order) into rewrite groups of up to
    * `targetBytes`, each group rewritten as ONE file (coalesce(1) — a
    * single task reading only that group, no shuffle); full-size files are
    * untouched and cost zero I/O. Originals are deleted and the manifest
    * refreshed. Returns (filesBefore, filesAfter).
    *
    * 100 TB design: planning reads only the manifest (file-count-sized);
    * the driver-side loop is over BINS (metadata-scale, like Delta
    * OPTIMIZE job planning — at cluster scale the bin jobs submit in
    * parallel, a scheduling change, not a plan change). Fewer than two
    * small files is a no-op, so compaction is idempotent. Superseded
    * originals stay on disk (invisible — the new manifest is maintained
    * INCREMENTALLY, old rows minus small files plus new-file stats, never
    * a directory re-scan) so earlier snapshots still time-travel; `vacuum`
    * reclaims them.
    */
  def compact(spark: SparkSession, dir: String, statsCols: Seq[String],
              smallBytes: Long, targetBytes: Long): (Long, Long) = {
    val man = spark.read.parquet(dir + "_manifest")
    val before = man.count()
    val small = man.where(col("file_bytes") < smallBytes)
      .select("file", "file_bytes").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    if (small.length < 2) return (before, before)
    val bins = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[String])
    var acc = 0L
    small.foreach { case (f, b) =>
      if (acc + b > targetBytes && bins.last.nonEmpty) {
        bins += scala.collection.mutable.ArrayBuffer.empty[String]
        acc = 0L
      }
      bins.last += f
      acc += b
    }
    val conf = spark.sessionState.newHadoopConf()
    val dirPath = new org.apache.hadoop.fs.Path(dir)
    val fs = dirPath.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dir, ".compact-tmp")
    val vNext = latestVersion(spark, dir) + 1
    val newFiles = bins.toIndexedSeq.zipWithIndex.map { case (bin, i) =>
      spark.read.parquet(bin.toIndexedSeq: _*).coalesce(1)
        .write.mode("overwrite").parquet(tmp.toString)
      val part = fs.listStatus(tmp).map(_.getPath)
        .find(_.getName.endsWith(".parquet"))
        .getOrElse(sys.error("compaction bin produced no parquet part"))
      val tag = java.lang.Long.toHexString {
        val crc = new java.util.zip.CRC32
        bin.foreach(f => crc.update(f.getBytes("UTF-8")))
        crc.getValue
      }
      val target = new org.apache.hadoop.fs.Path(dirPath,
        s"compact-v$vNext-$i-$tag.parquet")
      fs.rename(part, target)
      target.toString
    }
    fs.delete(tmp, true)
    val smallSet = small.map(_._1).toSet
    // localCheckpoint: the new manifest's plan reads the current manifest
    // file — materialize it BEFORE commitManifest overwrites that file
    val newMan = man.where(!col("file").isin(smallSet.toSeq: _*))
      .unionByName(manifestOf(
        spark.read.parquet(newFiles: _*), statsCols))
      .localCheckpoint(true)
    val after = before - smallSet.size + newFiles.size
    commitManifest(spark, dir, newMan)
    (before, after)
  }

  /** 16-bit Morton spread as Column bit math (same 4-step shift-or-mask as
    * `geom/Cells.spread`, narrowed to 16 input bits) — codegen'd end to
    * end, no UDF.
    */
  private def spread16(cIn: Column): Column = {
    var v = cIn.bitwiseAND(lit(0xFFFFL))
    v = v.bitwiseOR(shiftleft(v, 8)).bitwiseAND(lit(0x00FF00FFL))
    v = v.bitwiseOR(shiftleft(v, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    v = v.bitwiseOR(shiftleft(v, 2)).bitwiseAND(lit(0x33333333L))
    v.bitwiseOR(shiftleft(v, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Z-order (Morton) clustered write over TWO numeric columns + manifest
    * over both: each column is min/max-normalized to 16 bits (one tiny agg
    * collect), the interleaved 32-bit key drives `repartitionByRange`, and
    * because a contiguous Z range bounds BOTH coordinates, every file gets
    * a tight [min, max] interval in each dimension — so `prunedRead` skips
    * files for range predicates on EITHER column from one layout. This is
    * the Delta/Iceberg OPTIMIZE ZORDER strategy: at 100 TB the sort key is
    * the only thing that changes vs a plain clustered write — same single
    * range exchange, same metadata-scale manifest.
    */
  def zorderWrite(df: DataFrame, dir: String, cA: String, cB: String,
                  numFiles: Int): DataFrame = {
    val r = df.agg(min(col(cA)).cast("long"), max(col(cA)).cast("long"),
      min(col(cB)).cast("long"), max(col(cB)).cast("long")).head()
    def norm(c: String, mn: Long, mx: Long): Column =
      // Spark `/` is double division; operands < 2^53 so the cast back to
      // long is an exact floor for these nonnegative values
      ((col(c).cast("long") - mn) * 65535L / lit(math.max(1L, mx - mn)))
        .cast("long")
    val zkey = spread16(norm(cA, r.getLong(0), r.getLong(1)))
      .bitwiseOR(shiftleft(spread16(norm(cB, r.getLong(2), r.getLong(3))), 1))
    val keyed = df.withColumn("__zkey", zkey)
      .repartitionByRange(numFiles, col("__zkey")).drop("__zkey")
    write(keyed, dir, Seq(cA, cB))
  }


  /** Hilbert-clustered write over TWO numeric columns + manifest over
    * both — [[zorderWrite]] with the curve upgraded: consecutive Hilbert
    * indices are always grid neighbors (no Z-order "seams" where the key
    * jumps across the domain), so per-file min/max intervals are tighter
    * and `prunedRead` skips at least as well on both dimensions from the
    * same single range exchange.
    */
  def hilbertWrite(df: DataFrame, dir: String, cA: String, cB: String,
                   numFiles: Int): DataFrame = {
    val r = df.agg(min(col(cA)).cast("long"), max(col(cA)).cast("long"),
      min(col(cB)).cast("long"), max(col(cB)).cast("long")).head()
    def norm(c: String, mn: Long, mx: Long): Column =
      ((col(c).cast("long") - mn) * 65535L / lit(math.max(1L, mx - mn)))
        .cast("long")
    val hkey = graft.expr.GeomFunctions.hilbert_index(
      norm(cA, r.getLong(0), r.getLong(1)),
      norm(cB, r.getLong(2), r.getLong(3)), lit(16))
    val keyed = df.withColumn("__hkey", hkey)
      .repartitionByRange(numFiles, col("__hkey")).drop("__hkey")
    write(keyed, dir, Seq(cA, cB))
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
