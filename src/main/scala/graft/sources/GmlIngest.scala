package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed GML-ish ingest (SURVEY.md O-1/O-2/O-11): the reference parses
  * whole XML documents eagerly on one thread (CityGML2OBJs.py:433); the
  * engine ingests the extracted per-polygon records as text lines and parses
  * the `posList` coordinate strings columnar-side:
  *
  *   line := building_id|surface_id|surface_class|<posList>[|<posList hole>]*
  *   posList := "x y z x y z …"   (markup3dmodule.py:122-148 contract:
  *              token count % 3 == 0; violations are routed to rejects,
  *              not crashed on — engine-side improvement over the assert)
  *
  * Everything is `functions._` column math (codegen'd): split + transform +
  * cast; no UDF, no driver-side parsing.
  */
object GmlIngest {

  /** "x y z …" → array<struct<x,y,z:double>> (O-11 GMLstring2points). */
  def parsePosList(s: Column): Column = {
    val toks = split(trim(s), " +")
    val n = size(toks)
    transform(sequence(lit(0), (n / 3).cast("int") - 1), i => struct(
      element_at(toks, i * 3 + 1).cast("double").as("x"),
      element_at(toks, i * 3 + 2).cast("double").as("y"),
      element_at(toks, i * 3 + 3).cast("double").as("z")))
  }

  /** Token-count validity: non-empty and %3 == 0 (markup3dmodule.py:132,141). */
  def posListValid(s: Column): Column = {
    val n = size(split(trim(s), " +"))
    n >= 3 && n % 3 === 0
  }

  /** Route rows carrying `ext_text` + `hole_texts` columns into typed
    * (surfaces, rejects): valid posLists parse columnar-side into
    * array<struct<x,y,z>>; `% 3` violations become reject rows with a
    * reason. Every other column passes through untouched — shared by the
    * line format below and the XML ingest (GmlXml).
    */
  def route(parsed: DataFrame): (DataFrame, DataFrame) = {
    val bad = !posListValid(col("ext_text")) ||
      size(filter(col("hole_texts"), h => !posListValid(h))) > 0
    val ok = parsed
      .where(!bad)
      .withColumn("ext", parsePosList(col("ext_text")))
      .withColumn("holes", transform(col("hole_texts"), h => parsePosList(h)))
      .drop("ext_text", "hole_texts")
    val rejects = parsed
      .where(bad)
      .select(col("building_id"), col("surface_id"), col("surface_class"),
        lit("bad_poslist").as("reason"))
    (ok, rejects)
  }

  /** Parse a Dataset/DataFrame of lines into (surfaces, rejects). */
  def ingest(lines: DataFrame): (DataFrame, DataFrame) = {
    val parts = split(col("value"), "\\|")
    route(lines.select(
      element_at(parts, 1).as("building_id"),
      element_at(parts, 2).as("surface_id"),
      element_at(parts, 3).as("surface_class"),
      element_at(parts, 4).as("ext_text"),
      slice(parts, lit(5), greatest(size(parts) - 4, lit(0))).as("hole_texts")))
  }

  /** Render surfaces back to the line format (round-trip fixture helper). */
  def render(surfaces: DataFrame): DataFrame = {
    def pl(ring: Column): Column =
      concat_ws(" ", transform(ring, p =>
        concat_ws(" ", p.getField("x").cast("string"),
          p.getField("y").cast("string"), p.getField("z").cast("string"))))
    surfaces.select(concat_ws("|",
      concat(
        array(col("building_id"), col("surface_id"), col("surface_class"),
          pl(col("ext"))),
        transform(col("holes"), h => pl(h)))).as("value"))
  }
}
