package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic model-based quality filtering — the "train a cheap
  * classifier, score the whole corpus" stage every large-scale corpus
  * pipeline runs after its heuristic gates (the fastText-classifier
  * pattern: distill seed/heuristic labels into a smooth scorer, then
  * keep by score).
  *
  * The model is logistic regression with a HARD sigmoid, trained by
  * full-batch gradient descent in pure integer micro-unit arithmetic:
  *
  *   - features and probabilities live in `Scale` = 1e6 micro-units
  *   - sigma(z) ~= clamp(z/4 + 1/2, 0, 1)  (the piecewise-linear "hard
  *     sigmoid"), in micro-units: `least(greatest(z div 4 + 5e5, 0), 1e6)`
  *   - per-row error e = p - y*Scale; per-feature gradient contribution
  *     `(e * x_j) div Scale` is an exact integer, so the gradient SUM is
  *     order-independent — the trained weights are bit-identical across
  *     engines, partitionings, and reruns (no float summation order, no
  *     RNG). The q104 oracle replays every iteration as a linear SQL CTE
  *     chain (each CTE references only its predecessor — the previous
  *     weights ride through the gradient aggregate as MIN()s — so the
  *     chain costs iters scans, not 2^iters).
  *
  * Plan shape: the slim integer feature frame is localCheckpoint'ed once
  * (eager — lineage truncated, blocks free on GC, the What's-wrong-#1
  * discipline); each GD iteration is ONE map-side-combined aggregate over
  * it producing D+1 longs on the driver (the IVF-centroid metadata
  * pattern — O(features) scalars, never data); scoring is one literal
  * projection. Zero data-sized shuffles anywhere.
  *
  * 100 TB notes: the feature frame is ~5 longs/row; each iteration is a
  * scan of that checkpointed frame + a partial aggregate whose exchange
  * carries one row per partition. Overflow headroom: |e| <= 1e6,
  * |x| <= 1e6, so per-row terms are <= 1e12 and the Long gradient sum
  * holds past 9e6 billion rows.
  */
object MlOps {

  /** Micro-units per 1.0 — probabilities, features, and weights all live
    * in this fixed-point scale.
    */
  val Scale = 1000000L

  /** A trained hard-sigmoid LR model: integer micro-unit weights. */
  final case class LrModel(bias: Long, weights: Seq[Long], n: Long)

  private def zExprSql(bias: Long, weights: Seq[Long],
                       xCols: Seq[String]): String = {
    val dot = weights.zip(xCols).map { case (w, c) => s"$w * $c" }
      .mkString(" + ")
    s"(($dot) div $Scale + $bias)"
  }

  /** Hard-sigmoid score in micro-units for literal model weights — the
    * identical expression the oracle runs: clamp(z div 4 + Scale/2).
    */
  def scoreU(model: LrModel, xCols: Seq[String]): Column =
    expr(s"least(greatest(${zExprSql(model.bias, model.weights, xCols)}" +
      s" div 4 + ${Scale / 2}, 0), $Scale)")

  /** Integer mean (sum div n) of each column — the centering statistics.
    * One aggregate pass; collects `cols.size` longs.
    */
  def integerMeans(df: DataFrame, cols: Seq[String]): Seq[Long] = {
    val n = df.count()
    require(n > 0, "integerMeans needs rows")
    val row = df.agg(sum(col(cols.head)).as("s0"),
      cols.tail.zipWithIndex.map { case (c, i) =>
        sum(col(c)).as(s"s${i + 1}")
      }: _*).head()
    cols.indices.map(i => row.getLong(i) / n)
  }

  /** Train hard-sigmoid logistic regression by `iters` full-batch GD
    * steps at integer learning rate `lr` (w -= (lr * g) div n). `feats`
    * must carry LongType label `yCol` in {0,1} and LongType features
    * `xCols` in roughly [-Scale, Scale] (center them — see
    * [[integerMeans]] — or GD saturates the clamp). Deterministic:
    * returns bit-identical weights for any partitioning.
    */
  def trainHardSigmoidLr(feats: DataFrame, yCol: String,
                         xCols: Seq[String], iters: Int = 8,
                         lr: Long = 2L): LrModel = {
    require(iters >= 0 && lr > 0, "iters >= 0, lr > 0")
    // slim + eager checkpoint: the GD loop re-scans this frame once per
    // iteration; nothing upstream (e.g. text) is ever re-read
    val f = feats.select((col(yCol) +: xCols.map(col)).toSeq: _*)
      .localCheckpoint()
    val n = f.count()
    require(n > 0, "trainHardSigmoidLr needs rows")
    var bias = 0L
    val w = Array.fill(xCols.size)(0L)
    for (_ <- 1 to iters) {
      val e = expr(s"least(greatest(${zExprSql(bias, w.toSeq, xCols)}" +
        s" div 4 + ${Scale / 2}, 0), $Scale) - $yCol * $Scale")
      val row = f.withColumn("e", e).agg(sum(col("e")).as("gb"),
        xCols.zipWithIndex.map { case (c, i) =>
          sum(expr(s"(e * $c) div $Scale")).as(s"g$i")
        }: _*).head()
      // driver Long division truncates toward zero — identical to SQL
      // `div` / DuckDB `//` for every sign combination
      bias -= lr * row.getLong(0) / n
      for (i <- w.indices) w(i) -= lr * row.getLong(i + 1) / n
    }
    LrModel(bias, w.toSeq, n)
  }

  /** One-vs-rest LINEAR PROBES, all classes trained together (round-5
    * verdict item #7 — learned features): hard-sigmoid LR per class over a
    * crossed (example × class) frame. Each GD iteration is ONE broadcast
    * join of the current C×(D+1) integer weight table plus ONE
    * map-side-combined groupBy(class) aggregate — training C probes costs
    * the same JOB COUNT as training one, so a 32k-class one-job-per-class
    * pathology never exists. Same integer micro-unit math as
    * [[trainHardSigmoidLr]]: for every class the returned model is
    * bit-identical to training that class alone on the same rows
    * (LinearProbeSpec pins the equivalence), and the q153 oracle replays
    * every iteration relationally with the weights as a per-class CTE
    * relation.
    */
  def trainLinearProbes(crossed: DataFrame, classCol: String, yCol: String,
                        xCols: Seq[String], iters: Int = 6,
                        lr: Long = 2L): Map[Long, LrModel] = {
    require(iters >= 0 && lr > 0, "iters >= 0, lr > 0")
    val spark = crossed.sparkSession
    import spark.implicits._
    val f = crossed.select((col(classCol).cast("long").as("__cls") +:
      col(yCol) +: xCols.map(col)).toSeq: _*).localCheckpoint()
    val ns = f.groupBy("__cls").agg(count(lit(1)).as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    require(ns.nonEmpty, "trainLinearProbes needs rows")
    val classes = ns.keys.toSeq.sorted
    val bias = scala.collection.mutable.Map(classes.map(_ -> 0L): _*)
    val w = scala.collection.mutable.Map(
      classes.map(_ -> Array.fill(xCols.size)(0L)): _*)
    val dotSql = xCols.zipWithIndex
      .map { case (c, j) => s"element_at(__w, ${j + 1}) * $c" }
      .mkString(" + ")
    for (_ <- 1 to iters) {
      val wDf = classes.map(c => (c, bias(c), w(c).toSeq))
        .toDF("__cls", "__b", "__w")
      val e = expr(s"least(greatest((($dotSql) div $Scale + __b) div 4 + " +
        s"${Scale / 2}, 0), $Scale) - $yCol * $Scale")
      val grads = f.join(broadcast(wDf), Seq("__cls"))
        .withColumn("e", e)
        .groupBy("__cls")
        .agg(sum(col("e")).as("gb"),
          xCols.zipWithIndex.map { case (c, i) =>
            sum(expr(s"(e * $c) div $Scale")).as(s"g$i")
          }: _*)
        .collect()
      grads.foreach { r =>
        val c = r.getLong(0)
        val n = ns(c)
        bias(c) -= lr * r.getLong(1) / n
        val wc = w(c)
        for (i <- wc.indices) wc(i) -= lr * r.getLong(i + 2) / n
      }
    }
    classes.map(c => c -> LrModel(bias(c), w(c).toSeq, ns(c))).toMap
  }
}
