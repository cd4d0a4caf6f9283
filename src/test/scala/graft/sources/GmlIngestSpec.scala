package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth

class GmlIngestSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("posList parse: triples, %3 contract, doubles") {
    val df = Seq("0 0 0 1 0 0 1 1 0 0 0 0").toDF("s")
      .select(GmlIngest.parsePosList(col("s")).as("ring"))
    val ring = df.head().getSeq[org.apache.spark.sql.Row](0)
    assert(ring.length === 4)
    assert(ring(1).getDouble(0) === 1.0 && ring(1).getDouble(1) === 0.0)
    val bad = Seq("1 2 3 4").toDF("s").select(GmlIngest.posListValid(col("s"))).head().getBoolean(0)
    assert(!bad)
  }

  test("ingest routes malformed posLists to rejects; valid lines parse") {
    val lines = Seq(
      "b0|p0|GroundSurface|0 0 0 4 0 0 4 4 0 0 4 0 0 0 0",
      "b0|p1|WallSurface|0 0 0 4 0 0 4 0 3 0 0 3 0 0 0|1 0 1 2 0 1 2 0 2 1 0 2 1 0 1",
      "b1|p0|RoofSurface|0 0 0 1 2"  // bad: %3 != 0
    ).toDF("value")
    val (ok, rejects) = GmlIngest.ingest(lines)
    assert(ok.count() === 2)
    assert(rejects.count() === 1)
    assert(rejects.head().getString(3) === "bad_poslist")
    val wall = ok.where(col("surface_id") === "p1").head()
    assert(wall.getSeq[Any](4).length === 1) // one hole
  }

  test("round-trip: synth surfaces → render → ingest → identical geometry") {
    val surf = Synth.surfaces(spark, 2L).toDF
      .where(col("poly_ord") < 9) // exclude none; 2 buildings, no invalid rows
    val lines = GmlIngest.render(surf)
    val (ok, rejects) = GmlIngest.ingest(lines)
    assert(rejects.count() === 0)
    assert(ok.count() === surf.count())
    // geometry survives the text round-trip exactly (doubles repr round-trip)
    val a = surf.select("surface_id", "ext").orderBy("surface_id")
      .collect().map(_.toString)
    val b = ok.select("surface_id", "ext").orderBy("surface_id")
      .collect().map(_.toString)
    assert(a.toSeq === b.toSeq)
  }

  test("highestPoint / weightedCentroid kernels") {
    import graft.geom.{Geom, Vec3}
    val pts = Seq(Vec3(1, 1, 1), Vec3(2, 0, 5), Vec3(2, 3, 0))
    assert(Geom.highestPoint(pts.iterator) === Vec3(2, 3, 0))
    assert(Geom.highestPoint(pts.iterator, skipZ = Some(0.0)) === Vec3(2, 0, 5))
    val sq = IndexedSeq(Vec3(0, 0, 0), Vec3(2, 0, 0), Vec3(2, 2, 0), Vec3(0, 2, 0), Vec3(0, 0, 0))
    val wc = Geom.weightedCentroid(sq)
    assert(math.abs(wc.x - 1.0) < 1e-12 && math.abs(wc.y - 1.0) < 1e-12)
  }
}
