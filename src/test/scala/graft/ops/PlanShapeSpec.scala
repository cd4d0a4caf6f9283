package graft.ops

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.ImageCodec

/** Physical-plan shape asserts for the round-5 text/image ops — the scale
  * claims ("the corpus never shuffles", "broadcast anti-join", "top-k is
  * TakeOrderedAndProject") checked against the actual executed plan, not
  * just prose.
  */
class PlanShapeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = (0L until 40L)
    .map(i => (i, s"alpha beta w$i gamma delta epsilon zeta eta theta iota kappa w$i"))
    .toDF("doc_id", "text")

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("bm25TopK: corpus scoring never shuffles — top-k is TakeOrderedAndProject") {
    val p = plan(TextOps.bm25TopK(docs, Seq("alpha", "beta"), k = 5))
    assert(p.contains("TakeOrderedAndProject"), s"no partial top-k:\n$p")
    assert(!p.contains("ShuffleExchange"), s"unexpected corpus shuffle:\n$p")
  }

  test("unigramLogProb scoring: zero shuffle, zero join") {
    val p = plan(TextOps.unigramLogProb(docs))
    assert(!p.contains("Exchange") && !p.contains("Join"),
      s"scoring must be a per-row fold:\n$p")
  }

  test("scrubPii: pure per-row projection") {
    val p = plan(TextOps.scrubPii(docs))
    assert(!p.contains("Exchange") && !p.contains("Join"), s"\n$p")
  }

  test("paragraphDedup: hot set broadcasts into the anti-join") {
    val p = plan(TextOps.paragraphDedup(docs, TextOps.tokenChunks(3), maxDocs = 2L))
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"),
      s"expected broadcast anti-join:\n$p")
  }

  test("augment: narrow pipeline — no exchange anywhere") {
    val imgs = (0 until 4).map { i =>
      val px = Array.fill(8 * 6 * 3)(((i * 37) % 256).toByte)
      (f"im$i%02d", ImageCodec.encodeRaw(px), 8, 6, "raw")
    }.toDF("image_id", "bytes", "w", "h", "fmt")
    val p = plan(ImageOps.augment(spark, imgs, 4, 3, seed = 1L))
    assert(!p.contains("Exchange"), s"\n$p")
  }

  test("mosaic: partial aggregation combines buffers BEFORE the exchange") {
    val imgs = (0 until 6).map { i =>
      val px = Array.fill(48)(((i * 37) % 256).toByte)
      ((i % 2).toLong, ImageCodec.encodeRaw(px), 4, 4, "raw")
    }.toDF("cell_id", "bytes", "w", "h", "fmt")
    val p = plan(ImageOps.mosaic(spark, imgs, size = 48))
    // exactly one exchange, fed by a partial (ObjectHash/Sort)Aggregate —
    // the decoded pixel rows must never reach the shuffle
    assert("Exchange".r.findAllIn(p).size >= 1, s"\n$p")
    val agg = "Aggregate".r.findAllIn(p).size
    assert(agg >= 2, s"expected partial+final aggregate pair:\n$p")
    // plans print root-first, so the map-side (partial) aggregate must
    // appear BELOW the exchange in the text
    assert(p.lastIndexOf("Aggregate") > p.indexOf("Exchange"),
      s"no map-side combine before exchange:\n$p")
  }

  test("clipTransfer: no exchange before the final cell rollup") {
    val tri = Seq((0.0, 0.0, 32.0, 0.0, 0.0, 32.0))
      .toDF("ax", "ay", "bx", "by", "cx", "cy")
    val p = plan(SpatialOps.clipTransfer(tri, cs = 16.0))
    // exactly ONE shuffle — the rollup's; clips/explodes are narrow, and
    // the map-side partial aggregate sits below it
    assert("ShuffleExchange|Exchange hashpartitioning".r.findAllIn(p).size
      <= 2, s"clip chain must not shuffle:\n$p") // partial+final AQE reuse
    assert(p.lastIndexOf("Aggregate") > p.indexOf("Exchange"),
      s"no map-side combine before the cell exchange:\n$p")
    assert(!p.contains("CartesianProduct") && !p.toLowerCase.contains("udf"),
      s"pure codegen'd column math expected:\n$p")
  }

  test("skyline: the local pass is zero-exchange (sortWithinPartitions)") {
    val pts = (0L until 50L).map(i => (i, i % 7, i % 11)).toDF("id", "x", "y")
    // phase-1 frame only: local sort + scan must not exchange
    val local = pts.sortWithinPartitions(org.apache.spark.sql.functions
      .col("x").desc, org.apache.spark.sql.functions.col("y").desc)
    val p = plan(local)
    assert(!p.contains("Exchange"), s"local skyline pass must not shuffle:\n$p")
  }

  test("MlOps GD step: one map-side-combined aggregate, no join") {
    val f = (0L until 64L).map(i => (i % 2, i * 1000L, -i * 500L))
      .toDF("y", "x1", "x2")
    // the per-iteration aggregate frame (what trainHardSigmoidLr runs)
    val e = org.apache.spark.sql.functions.expr(
      "least(greatest((0 * x1 + 0 * x2) div 1000000 div 4 + 500000, 0), " +
        "1000000) - y * 1000000")
    val agg = f.withColumn("e", e).agg(
      org.apache.spark.sql.functions.sum("e").as("gb"))
    val p = plan(agg)
    assert(!p.contains("Join"), s"\n$p")
    assert(p.lastIndexOf("Aggregate") > p.indexOf("Exchange"),
      s"gradient must partial-aggregate map-side:\n$p")
  }

  test("zonalStats: the luma payload crosses exactly one hash join") {
    val imgs = (0 until 4).map { i =>
      val px = Array.fill(16 * 16 * 3)(((i * 37) % 256).toByte)
      (f"im$i%02d", ImageCodec.encodeRaw(px), 16, 16, "raw",
        i * 10.0, i * 4.0)
    }.toDF("image_id", "bytes", "w", "h", "fmt", "anchor_x", "anchor_y")
    val zones = Seq((0L, 2.0, 30.0, 1.0, 14.0))
      .toDF("building_ord", "xmin", "xmax", "ymin", "ymax")
    val p = plan(ImageOps.zonalStats(spark, imgs, zones))
    // the pair-finding join ran inside the checkpointed pair frame; the
    // FINAL plan must be: filter-once on the slim pairs → ONE shuffled
    // hash join carrying the luma payload → partial-agg rollup. A
    // BroadcastHashJoin here would mean the payload is being collected
    // to the driver (the stats-underestimate bug the hint guards).
    assert("ShuffledHashJoin".r.findAllIn(p).size === 1,
      s"expected exactly the payload shuffle-hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"),
      s"payload side must never broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), s"\n$p")
  }

  test("triangleCounts: every join is an equi-join (no theta fallback)") {
    // the naive formulation (join on a<b range predicates) degrades to a
    // nested-loop; the degree-oriented plan must stay hash/merge-joinable
    val edges = (0L until 60L).flatMap(i => Seq((i, (i + 1) % 60),
      (i, (i + 7) % 60))).toDF("a", "b")
    val p = plan(Clustering.triangleCounts(edges))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("jaccardJoin: candidate generation stays equi-joined") {
    val p = plan(TextOps.jaccardJoin(docs, 1L, 2L))
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"\n$p")
  }

  test("integralBoxSums: SAT payloads never shuffle — corner lookups " +
      "broadcast into the tile side") {
    val tiles = graft.model.Synth.mosaicTiles(spark, 3)
    val boxes = Seq((0L, 1L, 1L, 30L, 30L), (1L, 5L, 9L, 20L, 44L))
      .toDF("box_id", "x0", "y0", "x1", "y1")
    val p = plan(ImageOps.integralBoxSums(spark, tiles, boxes))
    // the 256-long local SATs are the payload: the corner probes (4 rows
    // per box) must broadcast, so no exchange ever carries `sat`
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"), s"\n$p")
    assert(p.contains("BroadcastHashJoin"),
      s"corner probes should broadcast into the SAT side:\n$p")
  }
}
