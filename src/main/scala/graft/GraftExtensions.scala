package graft

import org.apache.spark.sql.SparkSessionExtensions

/**
 * Session-extension entry point: register every graft SQL function at
 * session build time —
 *
 *   SparkSession.builder()
 *     .config("spark.sql.extensions", "graft.GraftExtensions")
 *
 * or `builder.withExtensions(new GraftExtensions)`. For an already-running
 * session use `org.apache.spark.sql.graft.FunctionShim.registerAll`.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit =
    org.apache.spark.sql.graft.FunctionShim.injections.foreach {
      case (ident, info, builder) =>
        extensions.injectFunction((ident, info, builder))
    }
}
