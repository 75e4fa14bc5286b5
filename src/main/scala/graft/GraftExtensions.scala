package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** `SparkSessionExtensions` installer — the zero-code integration route:
  *
  * {{{ spark-submit --conf spark.sql.extensions=graft.GraftExtensions ... }}}
  *
  * injects every native graft function (fnv64, simhash64, minhash,
  * cosine_similarity, bounded_count_distinct, …) into the session's
  * FunctionRegistry at build time, so plain SQL users get the engine's
  * codegen'd kernels without touching the Scala API. GraftSession sets
  * the conf by default. No custom Rule/Strategy is injected — SURVEY.md
  * §4.1 records that decision: Catalyst's built-ins cover every rewrite
  * the reference needs.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    functions.GraftFunctions.builders.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name), builder))
    }
}
