package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Exact-decimal CRS translation (SURVEY.md §2.11, CityGMLTranslation.py).
  *
  * The reference implements exact decimal addition by string surgery
  * (`performStableAddition`, :38-157); Spark's DecimalType arithmetic is
  * exact, so the whole module collapses to decimal column math — only the
  * CONTRACTS are ported:
  *
  *  - params = negated, int-truncated mean of envelope lower corners
  *    (:171-197), with the GML axis order: lower_corner.a = northing (y),
  *    lower_corner.b = easting (x)               (:190-191)
  *  - application order per coordinate triple is y-then-x-then-z —
  *    transParam(1) is added to the FIRST token, transParam(0) to the
  *    SECOND (:220-224); pinned by fixture (SURVEY.md §7.5.7)
  */
object Translate {

  val Dec: DecimalType = DecimalType(38, 10)

  /** O-44: (dy, dx) translation params from the envelopes table. Truncation
    * toward zero (the reference's int() cast), then negation. Returns a
    * 1-row DataFrame — kept as a table per the north rule's params sidecar.
    */
  def translationParams(envelopes: DataFrame): DataFrame = {
    // int() in the reference truncates toward zero — floor for positive,
    // ceil for negative (decimal cast would round half-up instead)
    def truncTowardZero(c: org.apache.spark.sql.Column) =
      when(c >= 0, floor(c)).otherwise(ceil(c)).cast(Dec)
    envelopes.agg(
      (-truncTowardZero(avg(col("lower_corner.a")))).as("dy"),
      (-truncTowardZero(avg(col("lower_corner.b")))).as("dx"))
  }

  /** O-61/O-62: apply (dx, dy, dz) to every surface coordinate. Rows marked
    * `implicit_geom` (template geometry) keep their coordinates untouched —
    * the reference's translation skips ImplicitGeometry children
    * (CityGMLTranslation.py:288-298); surfaces without the column translate
    * unconditionally. Double-typed surfaces get the params as
    * exact-decimal-derived doubles; decimal-typed coordinate tables add
    * losslessly.
    */
  def applySurfaces(surfaces: DataFrame, dx: Double, dy: Double, dz: Double): DataFrame = {
    def shift(p: org.apache.spark.sql.Column) = struct(
      (p.getField("x") + dx).as("x"),
      (p.getField("y") + dy).as("y"),
      (p.getField("z") + dz).as("z"))
    val keep =
      if (surfaces.columns.contains("implicit_geom")) col("implicit_geom")
      else lit(false)
    surfaces
      .withColumn("ext",
        when(keep, col("ext")).otherwise(transform(col("ext"), p => shift(p))))
      .withColumn("holes",
        when(keep, col("holes"))
          .otherwise(transform(col("holes"), h => transform(h, p => shift(p)))))
  }
}
