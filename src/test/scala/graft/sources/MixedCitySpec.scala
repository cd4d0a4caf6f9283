package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.ops.ObjPipeline

/** Non-building city objects (round-4 item #1): the reference routes Road /
  * PlantCover / GenericCityObject / CityFurniture / Relief / Tunnel /
  * WaterBody / Bridge polygons to the 'Other' OBJ bin
  * (CityGML2OBJs.py:597-603, 772-784). Covers: whole-document parse,
  * chunked-scanner extraction, 'Other'-bin-only routing, installation
  * feature classes, ImplicitGeometry marking, and the mixed-city
  * render→parse round trip.
  */
class MixedCitySpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  // square ring at height h offset (ox, oy)
  private def ring(ox: Double, oy: Double, h: Double = 0.0): String =
    s"$ox $oy $h ${ox + 2} $oy $h ${ox + 2} ${oy + 2} $h $ox ${oy + 2} $h $ox $oy $h"

  private val mixedCity =
    s"""<?xml version="1.0" encoding="UTF-8"?>
       |<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0"
       |    xmlns:gml="http://www.opengis.net/gml"
       |    xmlns:bldg="http://www.opengis.net/citygml/building/2.0"
       |    xmlns:tran="http://www.opengis.net/citygml/transportation/2.0"
       |    xmlns:veg="http://www.opengis.net/citygml/vegetation/2.0"
       |    xmlns:frn="http://www.opengis.net/citygml/cityfurniture/2.0"
       |    xmlns:brid="http://www.opengis.net/citygml/bridge/2.0">
       | <core:cityObjectMember>
       |  <bldg:Building gml:id="B1">
       |   <bldg:boundedBy><bldg:WallSurface>
       |    <gml:Polygon gml:id="B1W"><gml:exterior><gml:LinearRing>
       |     <gml:posList>0 0 0 2 0 0 2 0 2 0 0 2 0 0 0</gml:posList>
       |    </gml:LinearRing></gml:exterior></gml:Polygon>
       |   </bldg:WallSurface></bldg:boundedBy>
       |   <bldg:outerBuildingInstallation>
       |    <bldg:BuildingInstallation gml:id="INST7">
       |     <bldg:lod2Geometry><gml:MultiSurface><gml:surfaceMember>
       |      <gml:Polygon gml:id="B1I"><gml:exterior><gml:LinearRing>
       |       <gml:posList>${ring(5, 5, 1)}</gml:posList>
       |      </gml:LinearRing></gml:exterior></gml:Polygon>
       |     </gml:surfaceMember></gml:MultiSurface></bldg:lod2Geometry>
       |    </bldg:BuildingInstallation>
       |   </bldg:outerBuildingInstallation>
       |   <bldg:lod1MultiSurface><gml:MultiSurface><gml:surfaceMember>
       |    <gml:Polygon gml:id="B1L"><gml:exterior><gml:LinearRing>
       |     <gml:posList>${ring(8, 8)}</gml:posList>
       |    </gml:LinearRing></gml:exterior></gml:Polygon>
       |   </gml:surfaceMember></gml:MultiSurface></bldg:lod1MultiSurface>
       |  </bldg:Building>
       | </core:cityObjectMember>
       | <core:cityObjectMember>
       |  <tran:Road gml:id="R1">
       |   <gml:MultiSurface><gml:surfaceMember>
       |    <gml:Polygon gml:id="R1P"><gml:exterior><gml:LinearRing>
       |     <gml:posList>${ring(10, 0)}</gml:posList>
       |    </gml:LinearRing></gml:exterior></gml:Polygon>
       |   </gml:surfaceMember></gml:MultiSurface>
       |  </tran:Road>
       | </core:cityObjectMember>
       | <core:cityObjectMember>
       |  <veg:PlantCover gml:id="V1">
       |   <gml:Polygon gml:id="V1P"><gml:exterior><gml:LinearRing>
       |    <gml:posList>${ring(20, 0)}</gml:posList>
       |   </gml:LinearRing></gml:exterior></gml:Polygon>
       |  </veg:PlantCover>
       | </core:cityObjectMember>
       | <core:cityObjectMember>
       |  <frn:CityFurniture gml:id="F1">
       |   <core:ImplicitGeometry><core:relativeGMLGeometry>
       |    <gml:Polygon gml:id="F1P"><gml:exterior><gml:LinearRing>
       |     <gml:posList>${ring(0, 0)}</gml:posList>
       |    </gml:LinearRing></gml:exterior></gml:Polygon>
       |   </core:relativeGMLGeometry></core:ImplicitGeometry>
       |  </frn:CityFurniture>
       | </core:cityObjectMember>
       | <core:cityObjectMember>
       |  <brid:Bridge gml:id="BR1">
       |   <gml:Polygon gml:id="BR1P"><gml:exterior><gml:LinearRing>
       |    <gml:posList>${ring(30, 0)}</gml:posList>
       |   </gml:LinearRing></gml:exterior></gml:Polygon>
       |  </brid:Bridge>
       | </core:cityObjectMember>
       |</core:CityModel>""".stripMargin

  test("parse: other roots → class Other with object identity; installations; implicit") {
    val rows = GmlXml.parseDocument(mixedCity, "mc")
    val byId = rows.map(r => r.surface_id -> r).toMap
    assert(rows.length === 7)
    // building rows
    assert(byId("B1W").surface_class === "WallSurface")
    assert(byId("B1W").object_kind === "Building")
    assert(byId("B1I").surface_class === "BuildingInstallation")
    assert(byId("B1I").feature_id === "INST7")
    assert(byId("B1I").building_id === "B1")
    assert(byId("B1L").surface_class === "None") // unwrapped LOD1 poly
    // other-object rows: class 'Other', identity from the object's gml:id
    for ((sid, oid, kind) <- Seq(("R1P", "R1", "Road"), ("V1P", "V1", "PlantCover"),
      ("F1P", "F1", "CityFurniture"), ("BR1P", "BR1", "Bridge"))) {
      assert(byId(sid).surface_class === "Other", sid)
      assert(byId(sid).building_id === oid, sid)
      assert(byId(sid).object_kind === kind, sid)
    }
    // implicit geometry marked (translation skip contract)
    assert(byId("F1P").implicit_geom === true)
    assert(rows.filterNot(_.surface_id == "F1P").forall(!_.implicit_geom))
  }

  test("chunked scanner extracts non-building roots; matches whole-doc ingest") {
    val dir = java.nio.file.Files.createTempDirectory("mixedcity")
    val f = dir.resolve("city.gml")
    java.nio.file.Files.writeString(f, mixedCity)
    val whole = GmlXml.ingest(Seq(("city", mixedCity)).toDF("doc_id", "xml"))._1
      .select("surface_id", "surface_class", "object_kind", "building_id")
      .orderBy("surface_id").collect().toSeq
    val chunked = ChunkedGml.ingestFiles(spark, f.toString)._1
      .select("surface_id", "surface_class", "object_kind", "building_id")
      .orderBy("surface_id").collect().toSeq
    assert(chunked === whole)
    assert(chunked.length === 7)
    // tiny chunks: object spans still complete across split boundaries
    val tiny = ChunkedGml.ingestFiles(spark, f.toString, chunkBytes = 1L << 16)._1
      .select("surface_id").orderBy("surface_id").collect().toSeq
    assert(tiny.map(_.getString(0)) ===
      Seq("B1I", "B1L", "B1W", "BR1P", "F1P", "R1P", "V1P"))
  }

  test("corners routing: Other-only bin; installations and None to All only") {
    val (ok, _) = GmlIngestHelpers.ingested(spark, mixedCity)
    val (okv, _) = ObjPipeline.validated(ok)
    val tris = graft.ops.SpatialOps.triangles(ObjPipeline.withoutOpenings(okv))
    val cs = ObjPipeline.corners(tris, semantics = true)
    val byCls = cs.groupBy("cls").agg(countDistinct("surface_id").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 'Other' bin: exactly the 4 other-object polys, never in 'All'
    assert(byCls("Other") === 4L)
    // 'All': wall + installation + LOD1 building polys only
    assert(byCls("All") === 3L)
    assert(byCls("WallSurface") === 1L)
    // no bins named after installation classes / 'None' in EP-1
    assert(!byCls.contains("BuildingInstallation"))
    assert(!byCls.contains("None"))
    val otherInAll = cs.where(col("cls") === "All" &&
      col("surface_id").isin("R1P", "V1P", "F1P", "BR1P")).count()
    assert(otherInAll === 0L)
  }

  test("mixed-city render→parse round trip preserves identity, class, kind, implicit") {
    val (ok, _) = GmlIngestHelpers.ingested(spark, mixedCity)
    val (ok2, _) = GmlXml.ingest(GmlXml.render(ok))
    val a = ok.select("building_id", "surface_id", "surface_class",
        "object_kind", "feature_id", "implicit_geom", "ext")
      .orderBy("surface_id").collect().toSeq
    val b = ok2.select("building_id", "surface_id", "surface_class",
        "object_kind", "feature_id", "implicit_geom", "ext")
      .orderBy("surface_id").collect().toSeq
    assert(b === a)
  }
}

private object GmlIngestHelpers {
  def ingested(spark: org.apache.spark.sql.SparkSession, xml: String) = {
    import spark.implicits._
    GmlXml.ingest(Seq(("mc", xml)).toDF("doc_id", "xml"))
  }
}
