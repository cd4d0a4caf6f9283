package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.expr.GeomFunctions._

/** Reference-parity OBJ pipeline (SURVEY.md EP-1): clean → validate →
  * anti-join openings → triangulate → dictionary-encode vertices →
  * 1-based face indices, per semantic class, in document emission order.
  *
  * The reference's O(n²) driver-side `get_index` list scan
  * (CityGML2OBJs.py:68-77) is replaced by a distributed first-occurrence
  * window (O-41) that reproduces the same ordinal assignment: every distinct
  * vertex gets the ordinal of its first appearance in
  * (building_ord, poly_ord, tri_idx, corner) document order.
  */
object ObjPipeline {

  /** Route rows: cleaned valid polygons vs a rejects table with reasons
    * (reference prints-and-skips, CityGML2OBJs.py:163-170; we keep the
    * never-fail contract but make rejects queryable).
    */
  def validated(surfaces: DataFrame): (DataFrame, DataFrame) = {
    val cleaned = surfaces
      .withColumn("ext_clean", clean_ring(col("ext")))
      .withColumn("holes_clean",
        transform(col("holes"), h => clean_ring(h)))
      .withColumn("valid", is_poly_valid(col("ext_clean")))
    val ok = cleaned.where(col("valid"))
      .drop("ext", "holes", "valid")
      .withColumnRenamed("ext_clean", "ext")
      .withColumnRenamed("holes_clean", "holes")
    val rejects = cleaned.where(!col("valid"))
      .select(col("building_id"), col("surface_id"), col("surface_class"),
        when(size(col("ext_clean")) < 4, "lt4points")
          .when(element_at(col("ext_clean"), 1) =!= element_at(col("ext_clean"), -1), "open_ring")
          .otherwise("non_planar_or_dup").as("reason"))
    (ok, rejects)
  }

  /** Thematic polygons minus opening polygons (O-13b / O-37): left-anti join
    * on the ring geometry identity, mirroring the reference's identity
    * membership scan (CityGML2OBJs.py:755-762). Openings are a small side —
    * broadcast.
    */
  def withoutOpenings(surfaces: DataFrame): DataFrame = {
    val openings = surfaces
      .where(col("surface_class").isin("Window", "Door"))
      .select(col("ext").as("open_ext")).distinct()
    surfaces
      .where(!col("surface_class").isin("Window", "Door"))
      .join(broadcast(openings), col("ext") === col("open_ext"), "left_anti")
  }

  /** Triangle corners in document order, with the 'All' + per-class routing
    * of the reference (O-52): every polygon contributes to class 'All'; with
    * semantics enabled it also contributes to its own class.
    */
  def corners(tris: DataFrame, semantics: Boolean): DataFrame = {
    val classes =
      if (semantics) array(lit("All"), col("surface_class"))
      else array(lit("All"))
    tris
      .withColumn("cls", explode(classes))
      .select(col("cls"), col("building_id"), col("building_ord"),
        col("poly_ord"), col("tri_idx"),
        posexplode(array(col("tri.a"), col("tri.b"), col("tri.c")))
          .as(Seq("corner", "v")))
  }

  /** O-41 vertex dictionary encoding: per class, distinct vertices get
    * 1-based ordinals in first-occurrence document order.
    * Returns (vertices, faces):
    *   vertices(cls, ordinal, x, y, z)
    *   faces(cls, building_id, building_ord, poly_ord, tri_idx, ia, ib, ic)
    */
  def dictionaryEncode(corners: DataFrame): (DataFrame, DataFrame) = {
    val seq = struct(col("building_ord"), col("poly_ord"), col("tri_idx"), col("corner"))
    val firstSeen = corners
      .groupBy(col("cls"), col("v.x").as("x"), col("v.y").as("y"), col("v.z").as("z"))
      .agg(min(seq).as("first_seen"))
    val ordinals = assignOrdinals(firstSeen)
    val vertices = ordinals.select(col("cls"), col("ordinal"),
      col("x"), col("y"), col("z"))
    val c = corners.as("c")
    val o = ordinals.drop("first_seen").as("o")
    val indexed = c.join(o,
      col("c.cls") === col("o.cls") &&
        col("c.v.x") === col("o.x") &&
        col("c.v.y") === col("o.y") &&
        col("c.v.z") === col("o.z"))
      .select(col("c.cls").as("cls"), col("c.building_id").as("building_id"),
        col("c.building_ord").as("building_ord"), col("c.poly_ord").as("poly_ord"),
        col("c.tri_idx").as("tri_idx"), col("c.corner").as("corner"), col("o.ordinal").as("ordinal"))
    val faces = indexed
      .groupBy(col("cls"), col("building_id"), col("building_ord"),
        col("poly_ord"), col("tri_idx"))
      .agg(
        max(when(col("corner") === 0, col("ordinal"))).as("ia"),
        max(when(col("corner") === 1, col("ordinal"))).as("ib"),
        max(when(col("corner") === 2, col("ordinal"))).as("ic"))
    (vertices, faces)
  }

  /** Scalable per-class dense ordinal assignment. A plain
    * `row_number over (partition by cls order by first_seen)` serializes each
    * class into ONE reducer — with a handful of classes that caps parallelism
    * at #classes regardless of cluster size. Instead: range-partition by
    * (cls, first_seen) so the global order maps to partition order, rank
    * locally per (partition, cls), and add per-(partition, cls) offsets —
    * the offset table is tiny (≤ partitions × classes) and is the only
    * driver-side data. Same semantics, full parallelism.
    */
  def assignOrdinals(firstSeen: DataFrame): DataFrame = {
    // persist: the range partitioner samples with an RDD-id-derived seed, so
    // the counts job and the final job would otherwise see different bounds
    val sorted = firstSeen
      .repartitionByRange(col("cls"), col("first_seen"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val counts = sorted.groupBy("pid", "cls").count()
      .collect().map(r => (r.getInt(0), r.getString(1)) -> r.getLong(2)).toMap
    val offsets = counts.keys.toSeq.sorted
      .map { case (pid, cls) =>
        val off = counts.collect {
          case ((p2, c2), n) if c2 == cls && p2 < pid => n
        }.sum
        (pid, cls, off)
      }
    val offDf = broadcast(
      firstSeen.sparkSession.createDataFrame(offsets).toDF("pid", "cls", "off"))
    sorted
      .withColumn("local_rn",
        row_number().over(Window.partitionBy(col("pid"), col("cls"))
          .orderBy(col("first_seen"))).cast("long"))
      .join(offDf, Seq("pid", "cls"))
      .withColumn("ordinal", (col("local_rn") + col("off")).cast("int"))
      .drop("pid", "local_rn", "off")
  }

  /** Global-min translation (O-42, `-t` flag): lexicographic min vertex over
    * all classes, subtracted from every vertex — two passes, like the
    * reference (CityGML2OBJs.py:789-805). The min is a single scalar: the
    * only driver-side collect in the pipeline.
    */
  def translateToMin(vertices: DataFrame): DataFrame = {
    val m = vertices.agg(min(struct(col("x"), col("y"), col("z"))).as("m"))
      .select(col("m.x"), col("m.y"), col("m.z")).head()
    vertices.select(col("cls"), col("ordinal"),
      (col("x") - m.getDouble(0)).as("x"),
      (col("y") - m.getDouble(1)).as("y"),
      (col("z") - m.getDouble(2)).as("z"))
  }

  /** Render OBJ text lines per class (O-4 global path: `v x y z` in ordinal
    * order, then `f ia ib ic` in document order). Returns a DataFrame of
    * (cls, line_no, line) — writable with partitionBy("cls") at scale, or
    * collected for byte-exact goldens at test scale.
    */
  def objLines(vertices: DataFrame, faces: DataFrame): DataFrame = {
    val vLines = vertices.select(col("cls"),
      struct(lit(0).as("section"), col("ordinal").cast("long").as("ord"),
        lit(0L).as("o2"), lit(0L).as("o3"), lit(0).as("o4")).as("k"),
      format_string("v %s %s %s",
        fmtNum(col("x")), fmtNum(col("y")), fmtNum(col("z"))).as("line"))
    val fLines = faces.select(col("cls"),
      struct(lit(1).as("section"), col("building_ord").as("ord"),
        col("poly_ord").as("o2"), col("tri_idx").cast("long").as("o3"),
        lit(0).as("o4")).as("k"),
      format_string("f %d %d %d", col("ia"), col("ib"), col("ic")).as("line"))
    vLines.unionByName(fLines)
      .withColumn("line_no",
        row_number().over(Window.partitionBy(col("cls")).orderBy(col("k"))))
      .select(col("cls"), col("line_no"), col("line"))
  }

  /** Python-repr-style float formatting: integers as "1.0", else shortest
    * round-trip decimal (matches the reference's str(float) OBJ emission).
    */
  private def fmtNum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c === c.cast("long").cast("double"),
      format_string("%.1f", c)).otherwise(c.cast("string"))

  /** Full parity run: surfaces → (vertices, faces, rejects) per flags. */
  def run(spark: SparkSession, surfaces: DataFrame, semantics: Boolean = true,
          translate: Boolean = false): (DataFrame, DataFrame, DataFrame) = {
    val (ok, rejects) = validated(surfaces)
    val thematic = withoutOpenings(ok)
    val tris = SpatialOps.triangles(thematic)
    val (v0, f) = dictionaryEncode(corners(tris, semantics))
    val v = if (translate) translateToMin(v0) else v0
    (v, f, rejects)
  }
}
