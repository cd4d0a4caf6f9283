package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

import graft.TestSpark

/** Manifest PLANNING at fleet scale (round-5 verdict item #5): a synthetic
  * 1M-file manifest — never 1M real files — drives the pruning planner and
  * the compaction bin planner. Pins: (a) correctness of both plans against
  * a test-side reference, (b) the production path performs NO `collect`
  * action (a QueryExecutionListener watches action names — bin planning
  * streams through `toLocalIterator`), (c) wall-clock sanity at 1M rows.
  */
class ManifestScaleSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private val nFiles = 1000000L

  /** 1M manifest rows: disjoint [min_v, max_v] per file (10 wide), mixed
    * file sizes — 20% below the small threshold, in a deterministic
    * hash-spread pattern so small files are scattered through name order.
    */
  private lazy val man = spark.range(nFiles).select(
      concat(lit("file:/fleet/part-"),
        lpad(col("id").cast("string"), 8, "0"), lit(".parquet")).as("file"),
      (col("id") * 10L).as("min_v"),
      (col("id") * 10L + 9L).as("max_v"),
      lit(1000L).as("n_rows"),
      when(pmod(xxhash64(col("id")), lit(5L)) === 0L,
        pmod(xxhash64(col("id"), lit(1L)), lit(40000L)) + 1000L)
        .otherwise(lit(256L * 1024L * 1024L)).as("file_bytes"))
    .localCheckpoint(true)

  /** Collect action names seen while `body` runs (listener bus is async —
    * poll briefly for quiescence after).
    */
  private def actionsDuring(body: => Unit): Seq[String] = {
    val seen = scala.collection.mutable.ArrayBuffer.empty[String]
    val l = new QueryExecutionListener {
      def onSuccess(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    durationNs: Long): Unit =
        seen.synchronized { seen += funcName }
      def onFailure(funcName: String,
                    qe: org.apache.spark.sql.execution.QueryExecution,
                    exception: Exception): Unit = ()
    }
    spark.listenerManager.register(l)
    try {
      body
      // flush: a sentinel collect, then wait until it lands — every earlier
      // event is guaranteed delivered before the assert (the bus is async)
      import spark.implicits._
      Seq(1).toDF("sentinel").collect()
      val deadline = System.currentTimeMillis() + 30000
      while (!seen.synchronized(seen.exists(_.contains("collect"))) &&
        System.currentTimeMillis() < deadline) Thread.sleep(50)
    } finally spark.listenerManager.unregister(l)
    val all = seen.synchronized(seen.toSeq)
    val i = all.lastIndexWhere(_.contains("collect"))
    all.patch(i, Nil, 1)
  }

  test("planPrune at 1M files: exact overlap set, count-only planning") {
    // predicate covering files 137..=1000 (by the disjoint 10-wide ranges)
    val lo = 1375L; val hi = 10009L
    var n = -1L
    val acts = actionsDuring {
      n = StatsManifest.planPrune(man, "v", lo, hi).count()
    }
    assert(n === (1000L - 137L + 1L))
    assert(!acts.contains("collect"),
      s"pruning PLANNING must not collect; actions: $acts")
  }

  test("compactBins at 1M files: reference bins, streaming driver state") {
    val smallBytes = 50000L
    val targetBytes = 200000L
    // test-side reference (the spec MAY collect; production must not)
    val ref = man.where(col("file_bytes") < smallBytes)
      .select("file", "file_bytes").collect()
      .map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
    assert(ref.length > 150000, s"fixture small fleet too small: ${ref.length}")
    val refBins = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.ArrayBuffer.empty[(String, Long)])
    var acc = 0L
    ref.foreach { case (f, b) =>
      if (acc + b > targetBytes && refBins.last.nonEmpty) {
        refBins += scala.collection.mutable.ArrayBuffer.empty[(String, Long)]
        acc = 0L
      }
      refBins.last += ((f, b)); acc += b
    }
    var got: Vector[Seq[(String, Long)]] = Vector.empty
    val t0 = System.nanoTime()
    val acts = actionsDuring {
      got = StatsManifest.compactBins(man, smallBytes, targetBytes).toVector
    }
    val sec = (System.nanoTime() - t0) / 1e9
    assert(!acts.contains("collect"),
      s"bin PLANNING must stream, not collect; actions: $acts")
    assert(acts.contains("toLocalIterator"),
      s"expected a toLocalIterator action; actions: $acts")
    assert(got.map(_.toSeq) === refBins.map(_.toSeq).toVector,
      "bin contents/order diverged from the reference first-fit scan")
    // generous bound: planning a 1M-file fleet is seconds, not minutes
    assert(sec < 120.0, f"bin planning too slow at 1M files: $sec%.1f s")
    info(f"1M-file bin planning: ${got.length} bins in $sec%.1f s")
  }

  test("bins respect the target except oversized singletons") {
    val smallBytes = 50000L
    val targetBytes = 200000L
    val bins = StatsManifest.compactBins(man, smallBytes, targetBytes)
    var checked = 0
    bins.foreach { bin =>
      val bytes = bin.map(_._2).sum
      assert(bin.nonEmpty)
      if (bin.length > 1)
        assert(bytes <= targetBytes, s"multi-file bin over target: $bytes")
      checked += 1
    }
    assert(checked > 0)
  }
}
