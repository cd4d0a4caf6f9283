package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.{Pt, Surface, Synth}

/** EP-1 flag surface (`-g` object records, `-a` usemtl materials, `-p`
  * SKIPTRI passthrough — CityGML2OBJs.py:642-659, 160/192, 137-148): exact
  * golden for one hand-checkable polygon, plus structural invariants on the
  * synth city (o-line placement, usemtl-per-face, n-ary arity, hole points
  * excluded from the SKIPTRI dictionary).
  */
class ObjFlagsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val surfaces = Synth.surfaces(spark, 4L).toDF.cache()

  test("golden: skipTri + objects + building material for one square polygon") {
    val sq = Seq(Surface("b1", "b1-p0", "GroundSurface",
      Seq(Pt(0, 0, 0), Pt(0, 1, 0), Pt(1, 1, 0), Pt(1, 0, 0), Pt(0, 0, 0)),
      Nil, Map("irradiation" -> 50.0), 0L, 0L)).toDF
    val battr = Seq(("b1", 50.0)).toDF("building_id", "batt")
    val (v, f, _) = ObjPipeline.runFlags(spark, sq, semantics = false,
      skipTri = true, attribute = Some(("irradiation", 0.0, 100.0)),
      buildingAttrs = Some(battr))
    val lines = ObjPipeline.objLines(v, f, objects = true, mtllib = true)
      .orderBy("line_no").select("line").as[String].collect().toSeq
    assert(lines === Seq(
      "mtllib colormap.mtl",
      "v 0.0 0.0 0.0",
      "v 0.0 1.0 0.0",
      "v 1.0 1.0 0.0",
      "v 1.0 0.0 0.0",
      "o b1",
      "usemtl mat0.5",
      "f 1 2 3 4"))
  }

  test("skipTri: one n-ary face per polygon, pentagon keeps 5 indices, hole points excluded") {
    val (v, f, _) = ObjPipeline.runFlags(spark, surfaces,
      semantics = true, skipTri = true)
    val (okCnt, _) = ObjPipeline.validated(surfaces)
    val nThematic = ObjPipeline.withoutOpenings(okCnt).count()
    assert(f.where(col("cls") === "All").count() === nThematic)
    // west wall is the 5-point pentagon: its face must carry 5 ordinals
    val penta = f.where(col("cls") === "All" &&
      col("surface_id") === "bldg00000000-p03").select(size(col("idx"))).head().getInt(0)
    assert(penta === 5)
    // the window-hole corner (104, 100, 2) belongs only to the opening ring —
    // skipTri ignores holes, so it must NOT enter the vertex dictionary
    assert(v.where(col("cls") === "All" && col("x") === 104.0 &&
      col("y") === 100.0 && col("z") === 2.0).count() === 0)
    // whereas the triangulating pipeline DOES emit it (hole bridging)
    val (vt, _, _) = ObjPipeline.run(spark, surfaces, semantics = false)
    assert(vt.where(col("cls") === "All" && col("x") === 104.0 &&
      col("y") === 100.0 && col("z") === 2.0).count() === 1)
  }

  test("objects: one o-record per (class, building), before that building's faces") {
    val (v, f, _) = ObjPipeline.runFlags(spark, surfaces, semantics = true)
    val lines = ObjPipeline.objLines(v, f, objects = true).cache()
    val o = lines.where(col("line").startsWith("o ")).cache()
    // All bin: one per building, named by the building id alone
    assert(o.where(col("cls") === "All").count() === 4)
    assert(o.where(col("cls") === "All" &&
      col("line") === "o bldg00000000").count() === 1)
    // class bin: building id + first feature id of that class
    assert(o.where(col("cls") === "GroundSurface" &&
      col("line") === "o bldg00000000_bldg00000000-p00").count() === 1)
    assert(o.where(col("cls") === "RoofSurface" &&
      col("line") === "o bldg00000000_bldg00000000-p06").count() === 1)
    // placement: the o-record precedes every face of its building and
    // follows every vertex line (section order v < o < f)
    val seq = lines.where(col("cls") === "All").orderBy("line_no")
      .select("line").as[String].collect()
    val firstO = seq.indexWhere(_.startsWith("o "))
    val firstF = seq.indexWhere(_.startsWith("f "))
    val lastV = seq.lastIndexWhere(_.startsWith("v "))
    assert(lastV < firstO && firstO < firstF)
    // buildings appear in building_ord order: o-records strictly ordered
    val oSeq = seq.filter(_.startsWith("o "))
    assert(oSeq.toSeq === oSeq.sorted.toSeq)
  }

  test("attribute: usemtl before every colored face, roof-only in class bins") {
    val battr = surfaces.where(col("poly_ord") === 0)
      .select(col("building_id"), element_at(col("attrs"), "irradiation").as("batt"))
    val (v, f, _) = ObjPipeline.runFlags(spark, surfaces, semantics = true,
      attribute = Some(("irradiation", 0.0, 1600.0)), buildingAttrs = Some(battr))
    val lines = ObjPipeline.objLines(v, f, mtllib = true).cache()
    def n(cls: String, pred: org.apache.spark.sql.Column) =
      lines.where(col("cls") === cls && pred).count()
    // All bin: building-level material → usemtl per face, 1:1 with f lines
    assert(n("All", col("line").startsWith("usemtl ")) ===
      n("All", col("line").startsWith("f ")))
    // RoofSurface bin: every roof polygon carries the attr → 1:1 too
    assert(n("RoofSurface", col("line").startsWith("usemtl ")) ===
      n("RoofSurface", col("line").startsWith("f ")))
    // other class bins: uncolored (reference colors RoofSurface only)
    assert(n("WallSurface", col("line").startsWith("usemtl ")) === 0)
    assert(n("GroundSurface", col("line").startsWith("usemtl ")) === 0)
    // mtllib header is line 1 of every class
    assert(lines.where(col("line_no") === 1 &&
      col("line") =!= "mtllib colormap.mtl").count() === 0)
    // usemtl immediately precedes its face line
    val seq = lines.where(col("cls") === "RoofSurface").orderBy("line_no")
      .select("line").as[String].collect()
    seq.zipWithIndex.foreach { case (l, i) =>
      if (l.startsWith("usemtl ")) assert(seq(i + 1).startsWith("f "))
    }
  }

  test("default render is byte-identical with flags off (back-compat)") {
    val (v, f, _) = ObjPipeline.run(spark, surfaces, semantics = false)
    val plain = ObjPipeline.objLines(v, f)
      .orderBy("cls", "line_no").select("line").as[String].collect()
    val flagged = ObjPipeline.objLines(v, f, objects = false, mtllib = false)
      .orderBy("cls", "line_no").select("line").as[String].collect()
    assert(plain.toSeq === flagged.toSeq)
    assert(plain.forall(l => l.startsWith("v ") || l.startsWith("f ")))
  }
}
