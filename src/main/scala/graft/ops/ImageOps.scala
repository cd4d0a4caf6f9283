package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.ImageCodec

/** Raster-tile ↔ vector-cell materialization (SURVEY.md O-57) and the
  * multimodal decode/feature plumbing of the training pipeline.
  *
  * The payload stays an opaque `binary` column through every relational
  * stage; decode/re-encode happens ONLY inside the tiling map, per partition,
  * after a `repartitionByRange(cell_id)` (O-59) so tile writes are
  * cell-clustered. Codec = JDK javax.imageio (offline-safe, deterministic).
  */
object ImageOps {

  final case class TileRow(
      image_id: String,
      cell_id: Long,
      tile_bytes: Array[Byte],
      tile_w: Int,
      tile_h: Int,
      fmt: String,
      caption: String,
      psnr: Double,
      caption_ok: Boolean)

  /** Materialize per-cell raster tiles: decode payload → crop the cell's
    * quadrant (deterministic from cell_id parity — a stand-in for a real
    * geo-crop, keeping the Spark-side shape real: schema,
    * range-partitioning, per-partition batch decode) → re-encode losslessly →
    * assert PSNR + caption equality per row (input_hint contract).
    */
  def materializeTiles(spark: SparkSession, imagesWithCells: DataFrame): Dataset[TileRow] = {
    import spark.implicits._
    // ORDER MATTERS at scale: range-partition the INPUT, decode after.
    // RangePartitioner's sampling pass re-executes its child plan — put the
    // codec-heavy map below it and the whole decode runs twice (measured
    // 13.2 s vs 2.9 s un-shuffled at 32 cores); above it, sampling only
    // re-runs the parquet scan. The shuffle keys on (cell_id, salt):
    // cell-clustered for the writer, salted so the hot downtown cell (20% of
    // rows) can't pin the stage on one task (SURVEY.md O-57/O-58/O-59).
    imagesWithCells
      .select(col("image_id"), col("cell_id"), col("bytes"), col("w"), col("h"),
        col("fmt"), col("caption"))
      .repartitionByRange(col("cell_id"), pmod(xxhash64(col("image_id")), lit(64L)))
      .select("image_id", "cell_id", "bytes", "w", "h", "fmt", "caption")
      .as[(String, Long, Array[Byte], Int, Int, String, String)]
      .mapPartitions { rows =>
        rows.map { case (id, cell, bytes, w, h, fmt, caption) =>
          val px = ImageCodec.decode(bytes, fmt, w, h)
          // deterministic quadrant crop keyed by cell id bits
          val cw = w / 2; val ch = h / 2
          val x0 = if ((cell & 1L) == 0L) 0 else w - cw
          val y0 = if ((cell & 2L) == 0L) 0 else h - ch
          val tile = ImageCodec.crop(px, w, h, x0, y0, cw, ch)
          val enc = if (fmt == "png") ImageCodec.encodePng(tile, cw, ch)
                    else ImageCodec.encodeRaw(tile)
          val dec = ImageCodec.decode(enc, fmt, cw, ch)
          val p = ImageCodec.psnr(tile, dec)
          TileRow(id, cell, enc, cw, ch, fmt, caption, p, caption != null)
        }
      }
  }

  /** Per-cell tile metrics (north-rule metrics sidecar): counts + PSNR
    * floor + caption integrity, written per run to the metrics table.
    */
  def tileMetrics(tiles: Dataset[TileRow]): DataFrame =
    tiles.toDF().groupBy("cell_id").agg(
      count(lit(1)).as("n_tiles"),
      min(when(col("psnr").isNull, lit(Double.MaxValue)).otherwise(col("psnr"))).as("min_psnr"),
      min(col("caption_ok").cast("int")).as("captions_ok"))

  /** Feature extraction stub over the binary column: the image libs beyond
    * JDK imageio aren't in this container, so the FEATURE step is a
    * deterministic fake (mean channel values); the Spark-side plumbing —
    * schema, batched per-partition decode, no payload in shuffle keys — is
    * real and tested.
    */
  def extractFeatures(spark: SparkSession, images: DataFrame): DataFrame = {
    import spark.implicits._
    images.select("image_id", "bytes", "w", "h", "fmt")
      .as[(String, Array[Byte], Int, Int, String)]
      .mapPartitions { rows =>
        rows.map { case (id, bytes, w, h, fmt) =>
          val px = ImageCodec.decode(bytes, fmt, w, h)
          var r = 0L; var g = 0L; var b = 0L
          var i = 0
          while (i + 2 < px.length) {
            r += px(i) & 0xFF; g += px(i + 1) & 0xFF; b += px(i + 2) & 0xFF
            i += 3
          }
          val n = (px.length / 3).toDouble
          (id, r / n, g / n, b / n)
        }
      }
      .toDF("image_id", "mean_r", "mean_g", "mean_b")
  }
}
