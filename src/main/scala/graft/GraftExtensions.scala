package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

/** The library's `SparkSessionExtensions` entry point — the standard way a
  * Spark library ships session-wide additions:
  *
  * {{{
  *   spark-submit --conf spark.sql.extensions=graft.GraftExtensions ...
  * }}}
  *
  * Injects the three native graft expressions (`graft_dot`,
  * `graft_simhash`, `graft_winnow`) into every session built from the
  * configured context — no per-session `register` calls needed, and the
  * functions resolve from pure SQL. The per-session
  * `DotProduct.register(spark)`-style calls remain for programmatic use on
  * unconfigured sessions (both paths share one builder per function, so
  * behavior is identical).
  *
  * Scala UDFs (`normalize_tag`) are NOT injectable here — they need a live
  * session's UDF registry — so [[graft.ops.TagNormalize.register]] stays
  * the registration path for E1's SQL face.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  override def apply(ext: SparkSessionExtensions): Unit =
    GraftExtensions.injected.foreach { case (name, usage, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
}

object GraftExtensions {
  /** (name, usage, builder) for every injected function. */
  val injected = Seq(
    (functions.DotProduct.name,
      "dot product of two double arrays (tight codegen loop)",
      functions.DotProduct.builder),
    (functions.L2Sq.name,
      "squared L2 distance of two double arrays (tight codegen loop)",
      functions.L2Sq.builder),
    (functions.SimHash.name,
      "60-bit SimHash of a token array",
      functions.SimHash.builder),
    (functions.Winnow.name,
      "winnowing document fingerprint of (words, shingleN, window)",
      functions.Winnow.builder))
}
