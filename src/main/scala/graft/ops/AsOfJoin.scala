package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — the classic time-series operator Spark's built-in joins
  * lack: for every left row, attach the latest right row with the same key
  * and `right.ts <= left.ts` ("most recent quote at or before the trade",
  * "last click before the purchase").
  *
  * Plan (the optimal distributed as-of, no custom physical operator
  * needed): tag each side, union by name, ONE hash exchange on the key,
  * ONE ordered window pass that carries the last-seen right payload
  * forward (`last(_, ignoreNulls)` over rows-unbounded-preceding), then
  * keep the left rows. Cost = one shuffle + one sort of |L|+|R| rows —
  * strictly better than the range-join alternative (O(|L|·|R|) per key
  * worst case) and than per-row binary search (which needs the right side
  * collected or broadcast). At 100 TB both sides stream through the same
  * exchange; skewed keys behave exactly like any window over a hot key
  * (bounded by the per-key row count, no cross-product blow-up).
  *
  * Tie semantics: right rows at the exact left timestamp sort BEFORE left
  * rows (side 0 < 1), so "at or before" is inclusive; `tiebreak` (a
  * numeric column present on both sides, e.g. the event id) makes the
  * within-timestamp order total, so output is deterministic at any
  * parallelism. When several right rows share (key, ts), the LARGEST
  * tiebreak wins (it sorts last and `last()` carries it).
  */
object AsOfJoin {

  /** @param payload right-side columns to attach, each surfaced as
    *                 `asof_<name>` (null when no right row precedes).
    */
  def asOf(left: DataFrame, right: DataFrame, key: String, ts: String,
           payload: Seq[String], tiebreak: String): DataFrame = {
    val l2 = left
      .withColumn("__side", lit(1))
      .withColumn("__tb", col(tiebreak).cast("long"))
    val r2 = right.select(
      Seq(col(key), col(ts), col(tiebreak).cast("long").as("__tb")) ++
        payload.map(c => col(c).as(s"asof_$c")): _*)
      .withColumn("__side", lit(0))
    // left is missing asof_*, right is missing left's other columns —
    // unionByName fills both with nulls; `last(_, ignoreNulls)` then skips
    // left rows' null payloads by construction.
    val u = l2.unionByName(r2, allowMissingColumns = true)
    val w = Window.partitionBy(key)
      .orderBy(col(ts).asc, col("__side").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = payload.foldLeft(u) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(s"asof_$c"), ignoreNulls = true).over(w))
    }
    carried.where(col("__side") === 1).drop("__side", "__tb")
  }
}
