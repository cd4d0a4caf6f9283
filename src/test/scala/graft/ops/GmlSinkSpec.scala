package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.model.Synth
import graft.sink.GmlSink

/** O-8 translated-GML sink + O-6 JSON sidecars. */
class GmlSinkSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("writeTranslated: one *_local_.gml per building + params txt; round-trips") {
    import spark.implicits._
    val surf = Synth.surfaces(spark, 2L).toDF.cache()
    val params = Translate.translationParams(Synth.envelopes(spark, 16L)).head()
    val dy = params.getDecimal(0); val dx = params.getDecimal(1)
    val t = Translate.applySurfaces(surf, dx.doubleValue(), dy.doubleValue(), 0.0)
    val dir = java.nio.file.Files.createTempDirectory("gmlsink").toString
    val paths = GmlSink.writeTranslated(t, dy, dx, dir, "city")
    assert(paths.count(_.endsWith("_local_.gml")) === 2)
    val pTxt = paths.find(_.endsWith("_parameters.txt")).get
    val lines = java.nio.file.Files.readAllLines(java.nio.file.Paths.get(pTxt))
    assert(lines.get(0) === dy.toString && lines.get(1) === dx.toString)
    // parse one written file back: same surface count as that building
    val xml = java.nio.file.Files.readString(
      java.nio.file.Paths.get(paths.find(_.contains("bldg00000000")).get))
    val (ok, rej) = graft.sources.GmlXml.ingest(Seq(("f", xml)).toDF("doc_id", "xml"))
    assert(rej.count() === 0)
    assert(ok.count() === surf.where(col("building_id") === "bldg00000000").count())
  }

  test("JSON sidecars: bbox.json, crs.json, index.json written and well-formed") {
    val surf = Synth.surfaces(spark, 2L).toDF
    val dir = java.nio.file.Files.createTempDirectory("sidecars").toString
    val bb = GmlSink.bboxSidecar(SpatialOps.buildingBBoxes(surf), -100.0, -100.0, 0.0)
    val p1 = GmlSink.writeBboxJson(bb, dir)
    val p2 = GmlSink.writeCrsJson(Synth.envelopes(spark, 3L), dir)
    import spark.implicits._
    val comps = Seq(("b0_0.obj", "Building", "root", "bldg00000000"),
      ("b1_0.obj", "Building", "root", "bldg00000001"))
      .toDF("filename", "tag", "parent_id", "gml_id")
    val p3 = GmlSink.writeIndexJson(comps, dir)
    // well-formed: the driver-side duckdb/json loaders must parse these —
    // here assert minimal JSON shape with Spark's own reader
    Seq(p1, p2, p3).foreach { p =>
      val parsed = spark.read.option("multiLine", true).json(p)
      assert(parsed.columns.nonEmpty, s"$p parsed empty")
    }
    val idx = spark.read.option("multiLine", true).json(p3)
    assert(idx.select("`b0_0.obj`.gmlID").head().getString(0) === "bldg00000000")
  }

  test("bbox.json round-trips through the importBB path") {
    val surf = Synth.surfaces(spark, 3L).toDF
    val dir = java.nio.file.Files.createTempDirectory("bboximport").toString
    val sidecar = GmlSink.bboxSidecar(
      SpatialOps.buildingBBoxes(surf), -100.0, -100.0, 0.0).cache()
    val path = GmlSink.writeBboxJson(sidecar, dir)
    val back = GmlSink.readBboxJson(spark, path)
    assert(back.count() === 3)
    assert(sidecar.exceptAll(back).count() === 0 &&
      back.exceptAll(sidecar).count() === 0)
  }
}
