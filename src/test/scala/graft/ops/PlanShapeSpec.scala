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
}
