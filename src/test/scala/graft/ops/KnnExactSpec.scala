package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth

/** Adversarial exactness gate for the ring-expansion kNN (VERDICT round-1
  * "What's wrong #2"): a fixed 3×3 ring at 64 m cells guarantees only ~64 m
  * reach from an edge anchor, so probes whose true k-th neighbor lies past
  * the ring must trigger expansion (or the brute-force tail) — never a
  * silent wrong answer or a silent < k result.
  */
class KnnExactSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val surfaces = Synth.surfaces(spark, 4L).toDF.cache()

  /** Reference answer: exhaustive crossJoin + window, same centroid fold and
    * distance expression as the operator.
    */
  private def brute(probes: DataFrame, surf: DataFrame, k: Int): DataFrame = {
    val cents = surf.select(
      col("surface_id"), col("building_id"), col("surface_class"),
      (aggregate(col("ext"), lit(0.0), (acc, p) => acc + p.getField("x")) /
        size(col("ext"))).as("cx"),
      (aggregate(col("ext"), lit(0.0), (acc, p) => acc + p.getField("y")) /
        size(col("ext"))).as("cy"))
    val w = Window.partitionBy(col("image_id"))
      .orderBy(col("dist").asc, col("surface_id").asc)
    probes.crossJoin(cents)
      .withColumn("dist", sqrt(
        (col("anchor_x") - col("cx")) * (col("anchor_x") - col("cx")) +
          (col("anchor_y") - col("cy")) * (col("anchor_y") - col("cy"))))
      .withColumn("rk", row_number().over(w))
      .where(col("rk") <= k)
      .select(col("image_id"), col("rk"), col("surface_id"),
        col("building_id"), col("surface_class"), round(col("dist"), 6).as("dist"))
  }

  // anchors chosen to break the fixed ring: exactly ON cell borders (64 m
  // multiples), in the far empty corner (forces the brute-force tail), and
  // barely outside a building block so the k-th neighbor crosses a cell edge
  private lazy val probes = Seq(
    ("p_cell_edge", 192.0, 128.0),
    ("p_cell_corner", 128.0, 128.0),
    ("p_far_empty", 5000.0, 5000.0),
    ("p_domain_origin", 1.0, 1.0),
    ("p_inside", 110.0, 105.0),
    ("p_gap", 175.0, 125.0)
  ).toDF("image_id", "anchor_x", "anchor_y").cache()

  test("ring-expansion kNN equals exhaustive kNN on edge/far/empty anchors") {
    val exact = SpatialOps.knnAssign(probes, surfaces, k = 5)
    val expect = brute(probes, surfaces, k = 5)
    assert(exact.exceptAll(expect).count() === 0 &&
      expect.exceptAll(exact).count() === 0)
  }

  test("aggregator variant is identical on the adversarial anchors") {
    val exact = SpatialOps.knnAssignAgg(probes, surfaces, k = 5)
    val expect = brute(probes, surfaces, k = 5)
    assert(exact.exceptAll(expect).count() === 0 &&
      expect.exceptAll(exact).count() === 0)
  }

  test("k exceeding the candidate pool returns every surface, ranked") {
    val one = Seq(("p", 130.0, 110.0)).toDF("image_id", "anchor_x", "anchor_y")
    val few = surfaces.where(col("building_id") === "bldg00000000")
    val res = SpatialOps.knnAssign(one, few, k = 100)
    assert(res.count() === few.count(), "must surface every candidate, not < k silently")
  }

  // VERDICT round-2 "What's wrong #1": a probe cluster ~1,000 km from any
  // surface (empty regions at 100× domain scale) must stay exact WITHOUT the
  // old |stragglers| × |centroids| crossJoin — every expansion round,
  // including the provably-final whole-domain one, must plan as a hash
  // equi-join on the (coarsened) cell key.
  test("far-empty probe cluster: exact, with no cartesian/nested-loop in any round") {
    val far = Seq(
      ("f_corner", 900000.0, 900000.0),
      ("f_cluster1", 899000.0, 901000.0),
      ("f_cluster2", 899500.0, 900500.0),
      ("f_edge", 1.0, 999999.0)
    ).toDF("image_id", "anchor_x", "anchor_y")
    val exact = SpatialOps.knnAssign(far, surfaces, k = 3)
    val expect = brute(far, surfaces, k = 3)
    assert(exact.exceptAll(expect).count() === 0 &&
      expect.exceptAll(exact).count() === 0)

    val cents = SpatialOps.surfaceCentroids(surfaces.toDF, 14)
    for (roundNo <- 0 to 7) {
      val lvl = math.max(0, 14 - 2 * roundNo)
      val reach = graft.geom.Cells.sizeAt(14) * math.pow(4.0, roundNo)
      val plan = SpatialOps.knnRoundCandidates(far, cents, reach, lvl, 14)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct") &&
        !plan.contains("BroadcastNestedLoop"),
        s"round $roundNo (level $lvl) must be an equi-join:\n$plan")
    }
  }

  test("whole-domain round (level 0) still returns the exact global top-k") {
    val far = Seq(("p", 524288.0, 524288.0)).toDF("image_id", "anchor_x", "anchor_y")
    val cands = SpatialOps.knnRoundCandidates(far,
      SpatialOps.surfaceCentroids(surfaces.toDF, 14),
      reach = graft.geom.Cells.World.toDouble, roundLevel = 0, baseLevel = 14)
    // the level-0 cover is ONE cell; every centroid coarsens into it
    assert(cands.count() === surfaces.count())
    assert(cands.agg(min(col("safe"))).head().getDouble(0) === Double.MaxValue)
  }
}
