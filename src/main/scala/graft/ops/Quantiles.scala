package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** EXACT distributed quantiles without a global sort (and without
  * `percentile_approx`'s merge-order nondeterminism — unusable under a
  * bit-exact gate): classic count + cumulative-rank select.
  *
  * Plan: ONE real shuffle whose cardinality is the number of DISTINCT
  * (stratum, value) pairs — not rows — because the per-value `count`
  * pre-aggregates map-side; then a per-stratum window over those distinct
  * values and a nearest-rank pick (smallest v with cum ≥ ceil(q·n)). For
  * integer-ish value domains (lengths, token counts, sizes — the corpus
  * stats that matter) this is exact at any scale; for unbounded
  * continuous domains, bucket first or accept a sketch — documented
  * trade-off, not a silent one.
  */
object Quantiles {

  /** Per-stratum exact nearest-rank quantiles of `valueCol` (one output
    * column `p<100q>` per requested q, plus the stratum count `n`).
    */
  def exactQuantiles(df: DataFrame, strataCol: String, valueCol: String,
                     qs: Seq[Double]): DataFrame = {
    val counts = df.groupBy(col(strataCol), col(valueCol).as("__v"))
      .agg(count(lit(1)).as("__c"))
    val cum = counts
      .withColumn("__cum", sum("__c").over(
        Window.partitionBy(strataCol).orderBy(col("__v"))))
      .withColumn("__n", sum("__c").over(Window.partitionBy(strataCol)))
    val picks: Seq[Column] = max(col("__n")).as("n") +: qs.map { q =>
      val name = "p" + math.round(q * 100).toInt
      min(when(col("__cum") >= ceil(lit(q) * col("__n")), col("__v"))).as(name)
    }
    cum.groupBy(strataCol).agg(picks.head, picks.tail: _*)
  }
}
