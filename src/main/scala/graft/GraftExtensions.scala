package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Library-level SparkSessionExtensions entry point: injects every graft
  * SQL function at session build time, so a cluster deployment enables the
  * whole expression library with
  *
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  *
  * and no per-session registration code. `GeomFunctions.register` stays for
  * programmatic/local use — both paths share `GeomFunctions.injections`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    graft.expr.GeomFunctions.injections.foreach { case (name, builder) =>
      ext.injectFunction(
        (FunctionIdentifier(name), new ExpressionInfo("graft", name), builder))
    }
}
