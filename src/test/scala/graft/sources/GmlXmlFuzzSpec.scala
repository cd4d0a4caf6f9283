package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The parser's never-fail contract on hostile/garbage input: truncated
  * documents, wrong nesting, entity bombs (DTD disabled), binary noise —
  * parseDocument must never throw, and partial extractions stay sane.
  */
class GmlXmlFuzzSpec extends AnyFunSuite {

  test("garbage and truncated inputs never throw") {
    val cases = Seq(
      "",
      "not xml at all",
      "<unclosed",
      "<?xml version=\"1.0\"?><CityModel xmlns=\"http://www.opengis.net/citygml/2.0\">",
      "<a><b></a></b>",
      "<!DOCTYPE foo [<!ENTITY x \"y\">]><foo>&x;</foo>",
      new String(Array.tabulate(256)(i => (graft.model.Synth.mix64(i.toLong) & 0x7F).toChar)),
      // truncated mid-posList
      """<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        | xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        |<bldg:Building><bldg:boundedBy><bldg:RoofSurface>
        |<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>1 2 3 4""".stripMargin)
    cases.zipWithIndex.foreach { case (xml, i) =>
      val out = GmlXml.parseDocument(xml, s"fuzz$i") // must not throw
      out.foreach { p =>
        assert(p.building_id.nonEmpty && p.surface_id.nonEmpty)
      }
    }
  }

  test("hostile mixed-city inputs never throw; identity stays sane") {
    // round-4 parser surface: other-object roots, installations,
    // ImplicitGeometry — truncated, mis-nested, and decoy variants
    val cases = Seq(
      // other root truncated mid-polygon
      """<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        | xmlns:gml="http://www.opengis.net/gml"
        | xmlns:tran="http://www.opengis.net/citygml/transportation/2.0">
        |<tran:Road gml:id="R1"><gml:Polygon><gml:exterior><gml:LinearRing>
        |<gml:posList>1 2 3 4 5""".stripMargin,
      // Road inside a Building (never a root — must NOT steal identity)
      """<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        | xmlns:gml="http://www.opengis.net/gml"
        | xmlns:bldg="http://www.opengis.net/citygml/building/2.0"
        | xmlns:tran="http://www.opengis.net/citygml/transportation/2.0">
        |<bldg:Building gml:id="B"><tran:Road gml:id="R">
        |<gml:Polygon><gml:exterior><gml:LinearRing>
        |<gml:posList>0 0 0 1 0 0 1 1 0 0 0 0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon>
        |</tran:Road></bldg:Building></CityModel>""".stripMargin,
      // unbalanced ImplicitGeometry close + orphan installation close
      """<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        | xmlns:gml="http://www.opengis.net/gml"
        | xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        |<bldg:Building><bldg:lod1MultiSurface>
        |<gml:Polygon><gml:exterior><gml:LinearRing>
        |<gml:posList>0 0 0 1 0 0 1 1 0 0 0 0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon>
        |</bldg:lod1MultiSurface></bldg:Building>
        |</CityModel>""".stripMargin,
      // decoy wrong-namespace "Bridge" (plain ns) — must not become a root
      """<CityModel xmlns:gml="http://www.opengis.net/gml">
        |<Bridge gml:id="fake"><gml:Polygon><gml:exterior><gml:LinearRing>
        |<gml:posList>0 0 0 1 0 0 1 1 0 0 0 0</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon></Bridge>
        |</CityModel>""".stripMargin)
    cases.zipWithIndex.foreach { case (xml, i) =>
      val out = GmlXml.parseDocument(xml, s"mx$i") // must not throw
      out.foreach(p => assert(p.building_id.nonEmpty && p.object_kind.nonEmpty))
    }
    // the building-interior Road must keep the BUILDING's identity
    val inner = GmlXml.parseDocument(cases(1), "mx1")
    assert(inner.nonEmpty && inner.forall(p =>
      p.building_id == "B" && p.object_kind == "Building"))
    // the wrong-namespace Bridge is a stray: docId_nobldg, kind None
    val decoy = GmlXml.parseDocument(cases(3), "mx3")
    assert(decoy.nonEmpty && decoy.forall(p =>
      p.building_id == "mx3_nobldg" && p.object_kind == "None"))
  }

  test("entity declarations are rejected, not expanded (DTD disabled)") {
    val bomb =
      """<!DOCTYPE x [<!ENTITY a "aaaaaaaaaa"><!ENTITY b "&a;&a;&a;&a;">]>
        |<CityModel xmlns="http://www.opengis.net/citygml/2.0"
        | xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
        |<bldg:Building><bldg:boundedBy><bldg:RoofSurface>
        |<gml:Polygon><gml:exterior><gml:LinearRing><gml:posList>&b; 1 2 3</gml:posList>
        |</gml:LinearRing></gml:exterior></gml:Polygon>
        |</bldg:RoofSurface></bldg:boundedBy></bldg:Building></CityModel>""".stripMargin
    val out = GmlXml.parseDocument(bomb, "bomb")
    // the StAX factory has DTD support off: parsing stops at the DOCTYPE,
    // so nothing is extracted — and, critically, nothing is expanded
    assert(out.forall(p => !p.ext_text.contains("aaaa")))
  }
}
