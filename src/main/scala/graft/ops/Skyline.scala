package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed 2-D skyline (Pareto frontier, maximize both dimensions) —
  * the "best trade-off set" query (here: the quality frontier of a corpus,
  * e.g. length vs lexical diversity; classically price vs rating).
  *
  * Two-phase: (1) each partition computes its LOCAL skyline with a single
  * sorted linear scan (sortWithinPartitions(x desc, y desc) — no
  * exchange), which is exact because any global skyline point survives its
  * own partition's skyline; (2) the union of local skylines — bounded by
  * partitions × per-partition frontier, orders of magnitude smaller than
  * the input — goes through ONE single-task pass of the same scan. The
  * worst case (perfectly anti-correlated dimensions) makes any skyline
  * output O(n) by definition; for real corpora the frontier is tiny.
  *
  * Dominance is the standard one: b dominates a iff b ≥ a in both dims and
  * b > a in at least one. Duplicate points do NOT dominate each other —
  * every copy of a frontier point is returned (the oracle's NOT EXISTS
  * mirrors this exactly).
  */
object Skyline {

  /** Exact skyline scan over rows sorted by (x desc, y desc): a point
    * survives iff its y exceeds the best y seen at any STRICTLY greater x,
    * and it is the max-y of its equal-x group (ties on both dims all
    * survive).
    */
  private def scan(rows: Iterator[(Long, Long, Long)])
      : Iterator[(Long, Long, Long)] = {
    var bestY = Long.MinValue // max y among strictly-greater x
    var curX = Long.MinValue
    var groupMaxY = Long.MinValue
    var first = true
    val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
    rows.foreach { case t @ (_, x, y) =>
      if (first || x != curX) {
        if (!first) bestY = math.max(bestY, groupMaxY)
        curX = x; groupMaxY = y; first = false
      }
      // sorted y desc within the group → groupMaxY is the group head's y
      if (y == groupMaxY && y > bestY) out += t
    }
    out.iterator
  }

  /** Skyline of `df` maximizing LongType columns (`xCol`, `yCol`);
    * `idCol` rides along. Returns (idCol, xCol, yCol).
    */
  def skyline2(spark: SparkSession, df: DataFrame, idCol: String,
               xCol: String, yCol: String): DataFrame = {
    import spark.implicits._
    def pass(d: DataFrame) = d
      .sortWithinPartitions(col(xCol).desc, col(yCol).desc)
      .as[(Long, Long, Long)]
      .mapPartitions(scan)
      .toDF(idCol, xCol, yCol)
    val local = pass(df.select(col(idCol).cast("long"),
      col(xCol).cast("long"), col(yCol).cast("long")))
    // global pass: one task over the bounded candidate union
    pass(local.repartition(1))
  }
}
