package graft.sources

import java.io.BufferedWriter
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth

/** Chunked huge-document ingest (VERDICT round-2 "What's missing #4"):
  * byte-range splits over ONE CityGML document must agree exactly with
  * whole-document ingest — boundaries that land mid-building must neither
  * drop nor duplicate — and a ≥256 MB single document must stream through
  * in bounded memory (no 2 GB string, no single-task parse).
  */
class ChunkedGmlSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  /** One multi-building CityModel document from the synth city. */
  private def bigDocument(nBuildings: Long): String = {
    val surf = Synth.surfaces(spark, nBuildings).toDF
    val docs = GmlXml.render(surf).collect()
      .map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
    val inner = docs.map { case (_, xml) =>
      val a = xml.indexOf("<core:cityObjectMember>")
      val b = xml.indexOf("</core:cityObjectMember>") + "</core:cityObjectMember>".length
      xml.substring(a, b)
    }.mkString("\n ")
    s"""<?xml version="1.0" encoding="UTF-8"?>
<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
 $inner
</core:CityModel>"""
  }

  test("chunked ingest == whole-document ingest, split boundaries mid-building") {
    val doc = bigDocument(48L)
    val dir = Files.createTempDirectory("chunked_gml")
    val f = dir.resolve("city.gml")
    Files.writeString(f, doc)
    assert(Files.size(f) > 3 * 65536, "need several 64 KiB splits")

    val whole = GmlXml.ingest(Seq(("city", doc)).toDF("doc_id", "xml"))._1
    val (chunked, rejects) = ChunkedGml.ingestFiles(spark, f.toString,
      chunkBytes = 1L << 16)
    assert(rejects.count() === 0)

    def canon(df: org.apache.spark.sql.DataFrame) =
      df.select(col("surface_id"), col("surface_class"), col("ext"),
        col("holes"), sort_array(map_entries(col("attrs"))).as("ae"))
    val a = canon(whole); val b = canon(chunked)
    assert(a.exceptAll(b).count() === 0 && b.exceptAll(a).count() === 0)

    // ordinals: one distinct byte offset per building, monotone in document
    // order (the ids are written sorted, so offset order == id order)
    val ords = chunked.select("building_id", "building_ord").distinct()
      .orderBy("building_ord").collect().map(_.getString(0)).toSeq
    assert(ords.length === 48)
    assert(ords === ords.sorted)
  }

  test("every chunk size yields the same result (boundary-protocol fuzz)") {
    val doc = bigDocument(16L)
    val dir = Files.createTempDirectory("chunked_gml_fuzz")
    val f = dir.resolve("city.gml")
    Files.writeString(f, doc)
    val baseline = ChunkedGml.ingestFiles(spark, f.toString,
      chunkBytes = 1L << 26)._1 // one split
      .select("surface_id").orderBy("surface_id").collect().map(_.getString(0)).toSeq
    for (shift <- Seq(16, 17)) {
      val got = ChunkedGml.ingestFiles(spark, f.toString, chunkBytes = 1L << shift)._1
        .select("surface_id").orderBy("surface_id").collect().map(_.getString(0)).toSeq
      assert(got === baseline, s"chunkBytes=2^$shift diverged")
    }
  }

  test("decoy tags inside comments and CDATA don't corrupt the scan") {
    // a commented-out building open tag used to increment the depth count
    // and swallow every subsequent building into one fragment; CDATA decoys
    // likewise. The scanner must treat both as opaque data — at EVERY chunk
    // size (terminators straddling split/window boundaries included).
    def bldg(i: Int, extra: String = "") =
      s"""<core:cityObjectMember><bldg:Building gml:id="d$i">$extra<bldg:boundedBy><bldg:RoofSurface><gml:Polygon gml:id="d$i-p0"><gml:exterior><gml:LinearRing><gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></bldg:RoofSurface></bldg:boundedBy></bldg:Building></core:cityObjectMember>"""
    val doc =
      s"""<?xml version="1.0"?>
<!-- preamble decoy: <bldg:Building gml:id="ghost0"> -->
<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
${bldg(0, "<!-- inner decoy: <bldg:Building gml:id=\"ghost1\"> not real -->")}
<!-- between-buildings decoy: </bldg:Building> ${"pad" * 40} <bldg:Building -->
${bldg(1, "<gml:description><![CDATA[ <bldg:Building gml:id=\"ghost2\"> </bldg:Building> ]]></gml:description>")}
${bldg(2)}
</core:CityModel>"""
    val dir = Files.createTempDirectory("chunked_gml_decoy")
    val f = dir.resolve("decoy.gml")
    Files.writeString(f, doc)
    val whole = GmlXml.ingest(Seq(("decoy", doc)).toDF("doc_id", "xml"))._1
      .select("surface_id").orderBy("surface_id").collect().map(_.getString(0)).toSeq
    assert(whole === Seq("d0-p0", "d1-p0", "d2-p0"))
    val got = ChunkedGml.ingestFiles(spark, f.toString)._1
      .select("surface_id").orderBy("surface_id").collect().map(_.getString(0)).toSeq
    assert(got === whole)
    // window-boundary straddling: scan directly with tiny read buffers so
    // comment terminators and tag tokens split across EVERY byte position
    for (buf <- Seq(7, 64)) {
      val in = new java.io.ByteArrayInputStream(doc.getBytes("UTF-8"))
      val frags = ChunkedGml.scanSplit(in, 0L, doc.length.toLong,
        Seq("bldg:Building"), ("<r>", "r"), bufSize = buf).toSeq
      assert(frags.length === 3, s"bufSize=$buf found ${frags.length} buildings")
      assert(!frags.exists(_._2.contains("ghost1\"> not real</")),
        "decoy comment parsed as structure")
    }

    // MULTI-SPLIT decoys: pad buildings so the file spans several 64 KiB
    // splits, with decoy comments inside every building body (the
    // documented limit is only a comment STRADDLING a split start — these
    // stay within their buildings, so every split must stay clean)
    val padTxt = "pad " * 512
    val big = (s"""<?xml version="1.0"?>
<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">"""
      + (0 until 120).map(i => bldg(i,
          s"<gml:description>$padTxt</gml:description><!-- decoy in b$i: <bldg:Building gml:id=\"g$i\"> -->"))
        .mkString("\n", "\n", "\n")
      + "</core:CityModel>")
    val f2 = dir.resolve("decoy_big.gml")
    Files.writeString(f2, big)
    assert(Files.size(f2) > 3 * 65536, "need several 64 KiB splits")
    val gotBig = ChunkedGml.ingestFiles(spark, f2.toString, chunkBytes = 1L << 16)._1
      .select("surface_id").distinct().count()
    assert(gotBig === 120, s"multi-split decoy scan lost buildings: $gotBig")
  }

  test("multi-file ingest: building ordinals globally unique, path-ordered") {
    // bare per-file byte offsets would COLLIDE across files (every file's
    // first building starts at the same offset) and interleave the OBJ
    // emission order; ordinals must pack the sorted-path file index
    val dir = Files.createTempDirectory("chunked_gml_multi")
    val surf = Synth.surfaces(spark, 6L).toDF
    GmlXml.render(surf).collect().foreach { r =>
      Files.writeString(dir.resolve(s"${r.getString(0)}.gml"), r.getString(1))
    }
    val ok = ChunkedGml.ingestFiles(spark, s"$dir/*.gml")._1
    val ords = ok.select("building_id", "building_ord").distinct()
      .orderBy("building_ord").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(ords.map(_._2).distinct.size === 6, s"colliding ordinals: $ords")
    // files written as bldgNNNNNNNN.gml → path order == id order
    assert(ords.map(_._1) === ords.map(_._1).sorted)
  }

  test("prefix-divergent and default-namespace documents ingest chunked") {
    // the building namespace bound to a DIFFERENT prefix, and as the
    // default namespace: byte-literal '<bldg:Building' matching would find
    // nothing and silently return zero rows
    val pfx =
      """<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:b="http://www.opengis.net/citygml/building/2.0">
<core:cityObjectMember><b:Building gml:id="px0"><b:boundedBy><b:RoofSurface><gml:Polygon gml:id="px0-p0"><gml:exterior><gml:LinearRing><gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></b:RoofSurface></b:boundedBy></b:Building></core:cityObjectMember>
</core:CityModel>"""
    val dflt =
      """<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns="http://www.opengis.net/citygml/building/2.0">
<core:cityObjectMember><Building gml:id="df0"><boundedBy><RoofSurface><gml:Polygon gml:id="df0-p0"><gml:exterior><gml:LinearRing><gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></RoofSurface></boundedBy></Building></core:cityObjectMember>
</core:CityModel>"""
    val dir = Files.createTempDirectory("chunked_gml_ns")
    for ((name, doc, sid) <- Seq(("pfx.gml", pfx, "px0-p0"), ("dflt.gml", dflt, "df0-p0"))) {
      val f = dir.resolve(name)
      Files.writeString(f, doc)
      val got = ChunkedGml.ingestFiles(spark, f.toString)._1
        .select("surface_id").collect().map(_.getString(0)).toSeq
      assert(got === Seq(sid), s"$name: got $got")
    }
    // ...and BuildingPart still never matches
    val part = pfx.replace("b:Building ", "b:BuildingPart ")
      .replace("b:Building>", "b:BuildingPart>")
    val f2 = dir.resolve("part.gml")
    Files.writeString(f2, part)
    assert(ChunkedGml.ingestFiles(spark, f2.toString)._1.count() === 0)
  }

  test("self-closing Building elements keep the depth count balanced") {
    // '<bldg:Building ... />' previously left depth at 1 forever, swallowing
    // every later building into the first fragment
    val doc =
      """<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">
<core:cityObjectMember><bldg:Building gml:id="empty0" core:note="a/b"/></core:cityObjectMember>
<core:cityObjectMember><bldg:Building gml:id="real0"><bldg:boundedBy><bldg:RoofSurface><gml:Polygon gml:id="real0-p0"><gml:exterior><gml:LinearRing><gml:posList>0 0 5 1 0 5 1 1 5 0 0 5</gml:posList></gml:LinearRing></gml:exterior></gml:Polygon></bldg:RoofSurface></bldg:boundedBy></bldg:Building></core:cityObjectMember>
</core:CityModel>"""
    val dir = Files.createTempDirectory("chunked_gml_selfclose")
    val f = dir.resolve("sc.gml")
    Files.writeString(f, doc)
    val got = ChunkedGml.ingestFiles(spark, f.toString)._1
      .select("surface_id").collect().map(_.getString(0)).toSeq
    assert(got === Seq("real0-p0"))
  }

  test("256 MB single document streams through in bounded memory") {
    val dir = Files.createTempDirectory("chunked_gml_big")
    val f = dir.resolve("huge.gml")
    val w = new BufferedWriter(Files.newBufferedWriter(f), 1 << 20)
    w.write("""<?xml version="1.0" encoding="UTF-8"?>""")
    w.newLine()
    w.write("""<core:CityModel xmlns:core="http://www.opengis.net/citygml/2.0" xmlns:gml="http://www.opengis.net/gml" xmlns:bldg="http://www.opengis.net/citygml/building/2.0">""")
    w.newLine()
    val target = 256L << 20
    var n = 0L
    var written = 0L
    // ~2 KB per building → ~130k buildings for 256 MB; padding comment keeps
    // each building's XML realistic-sized without bloating parse output
    val pad = "x" * 1024
    while (written < target) {
      val x = (n % 1000) * 10.0
      val b =
        s"""<core:cityObjectMember><bldg:Building gml:id="hb$n"><core:yearlyIrradiation>$n.5</core:yearlyIrradiation><bldg:boundedBy><bldg:RoofSurface><bldg:lod2MultiSurface><gml:MultiSurface><gml:surfaceMember><gml:Polygon gml:id="hb${n}-p0"><gml:exterior><gml:LinearRing><gml:posList>$x 0 5 ${x + 1} 0 5 ${x + 1} 1 5 $x 0 5</gml:posList></gml:LinearRing></gml:exterior><core:irradiation>${n % 977}.25</core:irradiation></gml:Polygon><!--$pad--></gml:surfaceMember></gml:MultiSurface></bldg:lod2MultiSurface></bldg:RoofSurface></bldg:boundedBy></bldg:Building></core:cityObjectMember>"""
      w.write(b)
      w.newLine()
      written += b.length + 1
      n += 1
    }
    w.write("</core:CityModel>")
    w.close()
    assert(Files.size(f) >= target)

    val (ok, rejects) = ChunkedGml.ingestFiles(spark, f.toString,
      chunkBytes = 32L << 20)
    val agg = ok.agg(
      count(lit(1)).as("n"),
      countDistinct(col("building_id")).as("nb"),
      sum(element_at(col("ext"), 1).getField("x")).as("xsum"),
      sum(element_at(col("battrs"), "yearlyIrradiation")).as("bsum")).head()
    assert(rejects.count() === 0)
    assert(agg.getLong(0) === n, "one surface per building")
    assert(agg.getLong(1) === n, "every building exactly once")
    // Σ x over full cycles of (0..999)*10 + the remainder cycle
    val cycles = n / 1000; val rem = n % 1000
    val expectedX = cycles * (999.0 * 1000 / 2) * 10.0 + (rem - 1) * rem / 2 * 10.0
    assert(math.abs(agg.getDouble(2) - expectedX) < 1e-6)
    val expectedB = (n.toDouble - 1) * n / 2 + 0.5 * n
    assert(math.abs(agg.getDouble(3) - expectedB) < 1e-3)
    Files.delete(f)
  }
}
