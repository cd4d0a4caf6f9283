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
