package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Trajectory operators over (walker_id, seq, ts_us, x, y) track tables —
  * the GPS/telemetry side of the geo stack.
  */
object TrajectoryOps {

  /** Stop (dwell) detection: maximal runs of consecutive track points in
    * the same `cellSize` grid cell, kept when they span at least
    * `minPoints` points — the grid-dwell variant of Li et al. 2008
    * stay-points (public), chosen over the radius-scan variant because it
    * is ONE window pass (no sequential per-trajectory cursor): cell
    * assignment is pure column math, run boundaries are a LAG compare,
    * run ids a ROWS-framed running sum — the q88 sessionize skeleton with
    * a spatial predicate. Partitions are per-walker (trajectory-sized,
    * never corpus-sized); everything replays verbatim in SQL.
    *
    * Caller contract: coordinates non-negative (integer `div` floors
    * only match SQL `//` there) and one row per (walker_id, seq).
    */
  def stopDetection(tracks: DataFrame, cellSize: Long,
                    minPoints: Int): DataFrame = {
    val byW = Window.partitionBy("walker_id").orderBy("seq")
    tracks
      .withColumn("cx", expr(s"x div $cellSize"))
      .withColumn("cy", expr(s"y div $cellSize"))
      .withColumn("brk",
        when(lag("cx", 1).over(byW) === col("cx") &&
          lag("cy", 1).over(byW) === col("cy"), 0L).otherwise(1L))
      .withColumn("grp", sum(col("brk")).over(
        byW.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy("walker_id", "grp", "cx", "cy")
      .agg(min(col("ts_us")).as("enter_us"), max(col("ts_us")).as("exit_us"),
        count(lit(1)).as("n_points"))
      .where(col("n_points") >= minPoints)
      .select("walker_id", "cx", "cy", "enter_us", "exit_us", "n_points")
  }
}
