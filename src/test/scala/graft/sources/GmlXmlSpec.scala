package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth

/** Real CityGML XML ingest (O-2/O-3): namespace-set dispatch per version,
  * posList AND pos rings, interior rings, opening classification, `% 3`
  * reject routing, and the exact render→parse round trip.
  */
class GmlXmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val gml10 =
    """<?xml version="1.0" encoding="UTF-8"?>
      |<CityModel xmlns="http://www.opengis.net/citygml/1.0"
      |           xmlns:gml="http://www.opengis.net/gml"
      |           xmlns:bldg="http://www.opengis.net/citygml/building/1.0">
      | <cityObjectMember>
      |  <bldg:Building gml:id="B1">
      |   <bldg:boundedBy><bldg:WallSurface>
      |    <bldg:lod2MultiSurface><gml:MultiSurface><gml:surfaceMember>
      |     <gml:Polygon gml:id="P1">
      |      <gml:exterior><gml:LinearRing>
      |       <gml:posList>0 0 0 4 0 0 4 0 3 0 0 3 0 0 0</gml:posList>
      |      </gml:LinearRing></gml:exterior>
      |      <gml:interior><gml:LinearRing>
      |       <gml:posList>1 0 1 2 0 1 2 0 2 1 0 2 1 0 1</gml:posList>
      |      </gml:LinearRing></gml:interior>
      |     </gml:Polygon>
      |    </gml:surfaceMember></gml:MultiSurface></bldg:lod2MultiSurface>
      |    <bldg:opening><bldg:Window>
      |     <gml:Polygon gml:id="W1"><gml:exterior><gml:LinearRing>
      |      <gml:pos>1 0 1</gml:pos><gml:pos>2 0 1</gml:pos>
      |      <gml:pos>2 0 2</gml:pos><gml:pos>1 0 2</gml:pos><gml:pos>1 0 1</gml:pos>
      |     </gml:LinearRing></gml:exterior></gml:Polygon>
      |    </bldg:Window></bldg:opening>
      |   </bldg:WallSurface></bldg:boundedBy>
      |   <bldg:boundedBy><bldg:GroundSurface>
      |    <gml:Polygon><gml:exterior><gml:LinearRing>
      |     <gml:posList>0 0 0 0 4 0 4 4</gml:posList>
      |    </gml:LinearRing></gml:exterior></gml:Polygon>
      |   </bldg:GroundSurface></bldg:boundedBy>
      |  </bldg:Building>
      | </cityObjectMember>
      |</CityModel>""".stripMargin

  test("parse: versions, classes, rings, openings, %3 rejects") {
    val docs = Seq(("doc1", gml10)).toDF("doc_id", "xml")
    val (ok, rejects) = GmlXml.ingest(docs)
    val rows = ok.collect()
    // wall polygon: exterior 5 pts, 1 hole; window via opening path; the
    // ground polygon has 8 tokens (% 3 != 0) → reject
    val wall = rows.find(_.getAs[String]("surface_id") == "P1").get
    assert(wall.getAs[String]("surface_class") === "WallSurface")
    assert(wall.getAs[Seq[Any]]("ext").length === 5)
    assert(wall.getAs[Seq[Any]]("holes").length === 1)
    assert(wall.getAs[Int]("citygml_version") === 1)
    val win = rows.find(_.getAs[String]("surface_id") == "W1").get
    assert(win.getAs[String]("surface_class") === "Window")
    assert(win.getAs[Seq[Any]]("ext").length === 5)
    assert(rows.length === 2)
    val rej = rejects.collect()
    assert(rej.length === 1 && rej.head.getAs[String]("reason") === "bad_poslist")
  }

  test("render → parse round-trips the synth city exactly") {
    val surf = Synth.surfaces(spark, 8L).toDF.cache()
    val (ok, rejects) = GmlXml.ingest(GmlXml.render(surf))
    assert(rejects.count() === 0)
    val a = surf.select(col("surface_id"), col("surface_class"), col("ext"), col("holes"))
    val b = ok.select(col("surface_id"), col("surface_class"), col("ext"), col("holes"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
    // version sniff: rendered docs are CityGML 2.0
    assert(ok.select("citygml_version").distinct().collect().map(_.getInt(0)).toSeq === Seq(2))
  }

  test("attribute extraction: polygon irradiation + building yearlyIrradiation") {
    val doc =
      """<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0"
        |  xmlns:gml="http://www.opengis.net/gml"
        |  xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        | <core:cityObjectMember>
        | <bldg:Building gml:id="B9">
        |  <core:yearlyIrradiation>12345.5</core:yearlyIrradiation>
        |  <bldg:boundedBy><bldg:RoofSurface>
        |   <gml:Polygon gml:id="R1"><gml:exterior><gml:LinearRing>
        |    <gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList>
        |   </gml:LinearRing></gml:exterior>
        |   <core:irradiation>987.25</core:irradiation>
        |   <core:note>not-a-number</core:note>
        |   </gml:Polygon>
        |  </bldg:RoofSurface></bldg:boundedBy>
        |  <bldg:boundedBy><bldg:WallSurface>
        |   <gml:Polygon gml:id="W2"><gml:exterior><gml:LinearRing>
        |    <gml:posList>0 0 0 1 0 0 1 0 3 0 0 0</gml:posList>
        |   </gml:LinearRing></gml:exterior></gml:Polygon>
        |  </bldg:WallSurface></bldg:boundedBy>
        | </bldg:Building>
        | </core:cityObjectMember>
        |</core:CityModel>""".stripMargin
    val (ok, _) = GmlXml.ingest(Seq(("t", doc)).toDF("doc_id", "xml"))
    val rows = ok.collect()
    val roof = rows.find(_.getAs[String]("surface_id") == "R1").get
    // polygon-level attr typed to double; the non-numeric one drops out
    assert(roof.getAs[Map[String, Double]]("attrs") === Map("irradiation" -> 987.25))
    // building-level attr visible from every polygon of the building
    assert(roof.getAs[Map[String, Double]]("battrs") ===
      Map("yearlyIrradiation" -> 12345.5))
    val wall = rows.find(_.getAs[String]("surface_id") == "W2").get
    assert(wall.getAs[Map[String, Double]]("attrs") === Map.empty)
    assert(wall.getAs[Map[String, Double]]("battrs") ===
      Map("yearlyIrradiation" -> 12345.5))
  }

  test("building attribute AFTER the geometry still reaches every polygon") {
    // the reference reads attributes via xpath findall — document-order
    // independent — so an attribute element placed after the last boundedBy
    // (legal placement) must reach polygons emitted BEFORE it was seen
    val doc =
      """<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0"
        |  xmlns:gml="http://www.opengis.net/gml"
        |  xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        | <bldg:Building gml:id="BA">
        |  <bldg:boundedBy><bldg:RoofSurface>
        |   <gml:Polygon gml:id="P1"><gml:exterior><gml:LinearRing>
        |    <gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList>
        |   </gml:LinearRing></gml:exterior></gml:Polygon>
        |  </bldg:RoofSurface></bldg:boundedBy>
        |  <core:yearlyIrradiation>77.5</core:yearlyIrradiation>
        |  <bldg:boundedBy><bldg:WallSurface>
        |   <gml:Polygon gml:id="P2"><gml:exterior><gml:LinearRing>
        |    <gml:posList>0 0 0 1 0 0 1 0 3 0 0 0</gml:posList>
        |   </gml:LinearRing></gml:exterior></gml:Polygon>
        |  </bldg:WallSurface></bldg:boundedBy>
        |  <core:lateAttr>5.25</core:lateAttr>
        | </bldg:Building>
        |</core:CityModel>""".stripMargin
    val (ok, _) = GmlXml.ingest(Seq(("t2", doc)).toDF("doc_id", "xml"))
    val rows = ok.collect()
    val expect = Map("yearlyIrradiation" -> 77.5, "lateAttr" -> 5.25)
    Seq("P1", "P2").foreach { sid =>
      val r = rows.find(_.getAs[String]("surface_id") == sid).get
      assert(r.getAs[Map[String, Double]]("battrs") === expect,
        s"$sid missing late building attrs")
    }
  }

  test("attrs round-trip: render writes them, parse recovers them bit-exact") {
    val surf = Synth.surfaces(spark, 4L).toDF
    val (ok, _) = GmlXml.ingest(GmlXml.render(surf))
    // EXCEPT can't take MAP columns — compare as sorted entry arrays
    val a = surf.select(col("surface_id"),
      sort_array(map_entries(col("attrs"))).as("e"))
    val b = ok.select(col("surface_id"),
      sort_array(map_entries(col("attrs"))).as("e"))
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)
  }

  test("building without gml:id gets a deterministic synthetic id") {
    val doc =
      """<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        |  xmlns:gml="http://www.opengis.net/gml"
        |  xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        | <bldg:Building><bldg:boundedBy><bldg:RoofSurface>
        |  <gml:Polygon><gml:exterior><gml:LinearRing>
        |   <gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList>
        |  </gml:LinearRing></gml:exterior></gml:Polygon>
        | </bldg:RoofSurface></bldg:boundedBy></bldg:Building>
        |</CityModel>""".stripMargin
    val (ok, _) = GmlXml.ingest(Seq(("tile7", doc)).toDF("doc_id", "xml"))
    val r = ok.head()
    assert(r.getAs[String]("building_id") === "tile7_b0000")
    assert(r.getAs[String]("surface_class") === "RoofSurface")
  }
}
