package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** Session-extensions entry point: makes every engine function available in
  * any SparkSession via
  * `spark.sql.extensions=graft.GraftExtensions` — the standard deployment
  * path for a Spark-native library (no per-session registration calls).
  *
  * Injects: the DataFusion-name JSON functions (json_get, json_get_int, …),
  * the DataFusion scalar name aliases, and EVERY native expression from
  * [[graft.functions.NativeHashes.builders]] — one shared name→builder list
  * per module, so this path and the per-session `register` calls can never
  * drift (r16 review: the hand-maintained list here had fallen five
  * functions behind). Note the DataFusion `dialectOverrides` (log/trunc/
  * encode/…) are deliberately NOT injected: host sessions keep Spark
  * semantics; only ODF request sessions get the dialect overrides.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  override def apply(ext: SparkSessionExtensions): Unit = {
    (graft.functions.JsonFunctions.builders ++
      graft.functions.DataFusionCompat.builders ++
      graft.functions.NativeHashes.builders).foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info(name), builder))
    }
  }
}
