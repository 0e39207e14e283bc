package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Cluster deployment entry point for the native expressions:
  *
  * {{{ spark.sql.extensions=graft.functions.GraftSparkExtensions }}}
  *
  * `SparkSessionExtensions` is the supported way for a library to ship
  * Catalyst extensions — every session built with the config gets
  * `simhash64`, `rolling_hash64`, `mix64`, and `dot_product` as SQL
  * functions
  * with no per-session registration code. The runtime
  * [[GraftFunctions.register]] path remains for ad-hoc sessions.
  */
class GraftSparkExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftSparkExtensions.functions.foreach(ext.injectFunction)
}

object GraftSparkExtensions {
  private def fn(
      name: String, arity: Int,
      builder: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftSparkExtensions].getName, name),
      exprs => {
        // explicit arity check: a silent drop of extra args would
        // return a plausible-looking wrong answer from SQL
        if (exprs.length != arity)
          throw new IllegalArgumentException(
            s"$name requires exactly $arity argument(s), got ${exprs.length}")
        builder(exprs)
      })

  val functions
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      fn("simhash64", 1, exprs => SimHash64Expr(exprs.head)),
      fn("rolling_hash64", 1, exprs => RollingHash64Expr(exprs.head)),
      fn("mix64", 1, exprs => Mix64Expr(exprs.head)),
      fn("dot_product", 2, exprs => DotProductExpr(exprs(0), exprs(1))))
}
