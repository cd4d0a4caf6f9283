package graft

import org.scalatest.funsuite.AnyFunSuite

/** The SQL function surface, injected via `spark.sql.extensions =
  * graft.GraftExtensions` (TestSpark) — the cluster deployment path. Each
  * call here resolves through the session FunctionRegistry, not the Column
  * API.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val squareRing =
    """array(named_struct('x',0.0d,'y',0.0d,'z',0.0d),
      |      named_struct('x',1.0d,'y',0.0d,'z',0.0d),
      |      named_struct('x',1.0d,'y',1.0d,'z',0.0d),
      |      named_struct('x',0.0d,'y',1.0d,'z',0.0d),
      |      named_struct('x',0.0d,'y',0.0d,'z',0.0d))""".stripMargin

  test("geometry functions resolve and evaluate in SQL") {
    val r = spark.sql(
      s"""SELECT size(ear_clip($squareRing, array())) AS ntri,
         |       is_poly_valid($squareRing) AS ok,
         |       round(area_gml($squareRing, array()), 9) AS area,
         |       cell_encode(100.0d, 100.0d, 14) AS cell
         |""".stripMargin).head()
    assert(r.getInt(0) === 2)
    assert(r.getBoolean(1))
    assert(r.getDouble(2) === 1.0)
    assert(r.getLong(3) === graft.geom.Cells.encode(100.0, 100.0, 14))
  }

  test("text + cell functions resolve in SQL") {
    val r = spark.sql(
      """SELECT simhash64('the quick brown fox') AS sh,
        |       size(cell_neighbors(cell_encode(100.0d, 100.0d, 14))) AS nn,
        |       size(cell_cover(0.0d, 0.0d, 100.0d, 100.0d, 14)) AS nc
        |""".stripMargin).head()
    assert(r.getLong(0) === graft.expr.TextHash.simhash("the quick brown fox"))
    assert(r.getInt(1) === 9)
    assert(r.getInt(2) === 4)
  }
}
