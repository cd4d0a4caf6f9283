package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, OutputMode, Trigger}

import graft.expr.GeomFunctions._
import graft.ops.SpatialOps

/** Structured-Streaming ingest for the image table (optional per SURVEY.md
  * §2.10 — the reference is strictly batch; this is the engine's
  * incremental-ingest path, not a parity item).
  *
  * readStream (new image files landing in a directory / any source the
  * caller binds) → anchor + cell encode (same expressions as batch) →
  * watermarked per-cell windowed counts → sink. The batch and streaming
  * paths share every operator, so per-cell counts agree with the batch
  * engine on the same rows (asserted in StreamingSpec).
  */
object StreamingIngest {

  /** Cell-encode a (possibly streaming) image frame: identical logic to the
    * batch path — anchors from phash, Morton cell at the join level.
    */
  def encodeCells(images: DataFrame, nBuildings: Long): DataFrame =
    SpatialOps.imageCells(graft.model.Synth.withAnchors(images, nBuildings))

  /** Watermarked sliding-window per-cell arrival counts: the streaming
    * metrics feed (1-minute windows, 2-minute watermark for late rows).
    */
  def cellCounts(imagesWithTs: DataFrame, nBuildings: Long): DataFrame =
    encodeCells(imagesWithTs, nBuildings)
      .withWatermark("event_time", "2 minutes")
      .groupBy(window(col("event_time"), "1 minute"), col("cell_id"))
      .agg(count(lit(1)).as("n_images"))

  /** File-source ingest: parquet files dropped into `inDir` stream into a
    * partitioned parquet table of cell-assigned images.
    */
  def fileIngest(spark: SparkSession, inDir: String, outDir: String,
                 checkpoint: String, nBuildings: Long): DataStreamWriter[org.apache.spark.sql.Row] = {
    val schema = graft.model.Synth.images(spark, 1, 1).toDF.schema
    val stream = spark.readStream.schema(schema).parquet(inDir)
    encodeCells(stream, nBuildings)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpoint)
      .outputMode(OutputMode.Append())
      .trigger(Trigger.AvailableNow())
  }
}
