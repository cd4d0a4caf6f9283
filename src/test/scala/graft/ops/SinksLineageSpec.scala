package graft.ops

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.geom.{Geom, Hull3D, Vec3}
import graft.model.Synth
import graft.sink.{MtlSink, ObjWriter}

class SinksLineageSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("Hull3D: cube hull has 12 faces, surface area 6, deterministic") {
    val cube = for {
      x <- Seq(0.0, 1.0); y <- Seq(0.0, 1.0); z <- Seq(0.0, 1.0)
    } yield Vec3(x, y, z)
    val tris = Hull3D.hull(cube.toIndexedSeq)
    assert(tris.length === 12)
    val area = tris.map(t => (t.b - t.a).cross(t.c - t.a).norm / 2.0).sum
    assert(math.abs(area - 6.0) < 1e-3) // perturbation is ±1e-6
    // interior point stays inside every face plane (outward normals)
    val c = Vec3(0.5, 0.5, 0.5)
    tris.foreach { t =>
      val n = (t.b - t.a).cross(t.c - t.a)
      assert(n.dot(c - t.a) < 0, s"centroid outside face $t")
    }
    assert(Hull3D.hull(cube.toIndexedSeq).toSeq === tris.toSeq)
  }

  test("Hull3D: degenerate inputs → empty") {
    assert(Hull3D.hull(IndexedSeq(Vec3(0, 0, 0), Vec3(1, 1, 1))).isEmpty)
    assert(Hull3D.hull(IndexedSeq.empty).isEmpty)
  }

  test("windowHulls (per-opening, reference parity): tetra per planar quad") {
    val surfaces = Synth.surfaces(spark, 4L).toDF
    val hulls = SpatialOps.windowHulls(surfaces)
    // one Window per building; a perturbed planar quad hulls to a
    // tetrahedron: exactly 4 faces per opening
    val per = hulls.groupBy("building_id", "surface_id").count().collect()
    assert(per.length === 4)
    per.foreach(r => assert(r.getLong(2) === 4))
  }

  test("windowHulls (pooled per building, option)") {
    val surfaces = Synth.surfaces(spark, 4L).toDF
    val hulls = SpatialOps.windowHulls(surfaces, perOpening = false)
    val per = hulls.groupBy("building_id").count().collect()
    assert(per.length === 4)
    per.foreach(r => assert(r.getLong(1) >= 2))
  }

  test("cornerTriangles: 8 per building at buffered corners") {
    val boxes = SpatialOps.buildingBBoxes(Synth.surfaces(spark, 2L).toDF)
    val tris = SpatialOps.cornerTriangles(boxes)
    assert(tris.count() === 16)
    val r = tris.where(col("building_id") === "bldg00000000" && col("tri_idx") === 0)
      .select("tri.a.x", "tri.a.y", "tri.a.z").head()
    assert(r.getDouble(0) === Synth.Ox0 - 3.0)
    assert(r.getDouble(2) === -3.0)
  }

  test("MTL sink: 101 afmhot materials, snap-to-bin contract (O-35)") {
    val mtl = MtlSink.colormapMtl()
    assert(MtlSink.bins.length === 101)
    assert(mtl.linesIterator.count(_.startsWith("newmtl")) === 101)
    assert(MtlSink.afmhot(0.0) === ((0.0, 0.0, 0.0)))
    assert(MtlSink.afmhot(1.0) === ((1.0, 1.0, 1.0)))
    assert(MtlSink.afmhot(0.5) === ((1.0, 0.5, 0.0)))
    // snapping: 0.123 → nearest bin 0.12
    import spark.implicits._
    val df = Seq(12.3).toDF("att")
      .select(MtlSink.materialFor(col("att"), 0.0, 100.0).as("m"))
    assert(df.head().getString(0) === "mat0.12")
  }

  test("colorbar legend PNG: afmhot ramp, decodes losslessly, deterministic") {
    val dir = java.nio.file.Files.createTempDirectory("colorbar").toString
    val p = MtlSink.colorbarPng(dir)
    val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p))
    val (px, w, h) = graft.model.PngCodec.decode(bytes)
    assert(w === 404 && h === 16 + MtlSink.colorbarLabelRows)
    // bin 0 = black, bin 100 = white, bin 50 (x=200) = (255, 128, 0)
    def at(x: Int) = (px(x * 3) & 0xFF, px(x * 3 + 1) & 0xFF, px(x * 3 + 2) & 0xFF)
    assert(at(0) === ((0, 0, 0)))
    assert(at(403) === ((255, 255, 255)))
    assert(at(200) === ((255, 128, 0)))
    // annotation strip: tick marks + 3×5 glyph labels render black pixels on
    // the white canvas under the ramp (reference ticks/labels parity)
    val strip = px.drop(404 * 16 * 3)
    val black = strip.grouped(3).count(g =>
      (g(0) & 0xFF) == 0 && (g(1) & 0xFF) == 0 && (g(2) & 0xFF) == 0)
    val white = strip.grouped(3).count(g =>
      (g(0) & 0xFF) == 255 && (g(1) & 0xFF) == 255 && (g(2) & 0xFF) == 255)
    assert(black > 50, s"no tick/label pixels rendered (black=$black)")
    assert(black + white === 404 * MtlSink.colorbarLabelRows)
    // the axis caption (plotcolorbar.py set_label parity) renders glyphs
    // in its own 5-row band under the tick labels
    val captionBand = px.slice(404 * (16 + 9) * 3, 404 * (16 + 14) * 3)
    val captionBlack = captionBand.grouped(3).count(g =>
      (g(0) & 0xFF) == 0 && (g(1) & 0xFF) == 0 && (g(2) & 0xFF) == 0)
    assert(captionBlack > 100, s"caption not rendered (black=$captionBlack)")
    // byte-deterministic across calls
    val p2 = MtlSink.colorbarPng(java.nio.file.Files.createTempDirectory("cb2").toString)
    assert(java.util.Arrays.equals(bytes,
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p2))))
  }

  test("ObjWriter indexed mode writes ordered per-class files") {
    val one = Synth.surfaces(spark, 1L).toDF
    val (v, f, _) = ObjPipeline.run(spark, one, semantics = true)
    val lines = ObjPipeline.objLines(v, f)
    val dir = java.nio.file.Files.createTempDirectory("obj").toString
    val files = ObjWriter.writeIndexed(lines, dir, "city")
    assert(files.exists(_.endsWith("city.obj")))        // class 'All'
    assert(files.exists(_.endsWith("city-RoofSurface.obj")))
    val all = scala.io.Source.fromFile(s"$dir/city.obj").getLines().toSeq
    assert(all.head.startsWith("v "))
    assert(all.last.startsWith("f "))
    val nV = all.count(_.startsWith("v "))
    // face indices must all resolve within the vertex count
    all.filter(_.startsWith("f ")).foreach { l =>
      l.split(" ").drop(1).map(_.toInt).foreach(i => assert(i >= 1 && i <= nV))
    }
  }

  test("ObjWriter tri-soup mode: 3 fresh vertices per face, no dedup (O-5)") {
    val one = Synth.surfaces(spark, 1L).toDF
    val (ok, _) = ObjPipeline.validated(one)
    val tris = SpatialOps.triangles(ObjPipeline.withoutOpenings(ok))
    val soup = ObjWriter.triSoup(tris).head()
    val text = soup.getString(1)
    val vLines = text.linesIterator.count(_.startsWith("v "))
    val fLines = text.linesIterator.count(_.startsWith("f "))
    assert(vLines === fLines * 3)
    // last face references the last three vertex indices
    val lastF = text.linesIterator.filter(_.startsWith("f ")).toSeq.last
    assert(lastF === s"f ${vLines - 2} ${vLines - 1} $vLines")
  }

  test("Lineage: staged pipeline is resumable and idempotent") {
    val root = java.nio.file.Files.createTempDirectory("lineage").toString
    val surfaces = Synth.surfaces(spark, 8L).toDF
    val images = Synth.withAnchors(Synth.images(spark, 200L, 8L).toDF, 8L)
    val r1 = Lineage.runPipeline(spark, root, surfaces, images)
      .orderBy("cell_id").collect()
    assert(r1.nonEmpty)
    // resume: all stages committed → rerun must read checkpoints (fast) and
    // return identical rows
    val r2 = Lineage.runPipeline(spark, root, surfaces, images)
      .orderBy("cell_id").collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
    // kill-after-stage-k: invalidate the join stage; downstream recomputes
    // from the triangles/image checkpoints and matches
    Lineage.invalidate(root, "spatial_join")
    Lineage.invalidate(root, "cell_counts")
    val r3 = Lineage.runPipeline(spark, root, surfaces, images)
      .orderBy("cell_id").collect()
    assert(r1.map(_.toString).toSeq === r3.map(_.toString).toSeq)
    // metrics + lineage sidecars exist with one row per stage / partition
    val stages = spark.read.parquet(s"$root/metrics")
      .select("stage").distinct().count()
    assert(stages >= 4)
    assert(spark.read.parquet(s"$root/lineage").count() >= 4)
    // the payload-heavy tiling leg checkpoints under the same contract
    assert(Lineage.committed(s"$root/stages/tile_metrics"))
    assert(spark.read.parquet(s"$root/stages/tile_metrics").count() > 0)
  }

  test("Lineage: committed/invalidate resolve through the Hadoop FS " +
    "(scheme-qualified roots — round-5 item #3)") {
    // an explicit file: URI root: the old java.io.File implementation saw
    // "file:/…/_SUCCESS" as a relative path, always returned false, and
    // resume silently degraded to recompute-everything on any real FS
    val root = "file:" + java.nio.file.Files.createTempDirectory("lineage_fs")
    val surfaces = Synth.surfaces(spark, 8L).toDF
    val images = Synth.withAnchors(Synth.images(spark, 200L, 8L).toDF, 8L)
    val r1 = Lineage.runPipeline(spark, root, surfaces, images)
      .orderBy("cell_id").collect()
    assert(r1.nonEmpty)
    assert(Lineage.committed(s"$root/stages/triangles"))
    assert(Lineage.committed(s"$root/stages/cell_counts"))
    Lineage.invalidate(root, "cell_counts")
    assert(!Lineage.committed(s"$root/stages/cell_counts"))
    val r2 = Lineage.runPipeline(spark, root, surfaces, images)
      .orderBy("cell_id").collect()
    assert(r1.map(_.toString).toSeq === r2.map(_.toString).toSeq)
  }
}
