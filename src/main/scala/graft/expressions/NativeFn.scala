package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** One registration record per native expression — the single
  * implementation of the identifier/info/arity-checked-builder
  * boilerplate every expression object was copy-pasting, usable both
  * by the SparkSessionExtensions hook (GraftExtensions) and by
  * per-session `ensureRegistered` calls.
  */
private[graft] final case class NativeFn(
    name: String,
    clazz: Class[_],
    arity: Int,
    ctor: Seq[Expression] => Expression) {

  val identifier: FunctionIdentifier = FunctionIdentifier(name)
  val info: ExpressionInfo = new ExpressionInfo(clazz.getCanonicalName, null, name)
  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == arity, s"$name takes exactly $arity argument(s)")
    ctor(children)
  }

  /** Tuple shape SparkSessionExtensions.injectFunction expects. */
  def injectable: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (identifier, info, builder)

  /** Idempotent per-session registration (for sessions not built via
    * the extensions hook).
    */
  def ensure(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(identifier))
      registry.registerFunction(identifier, info, builder)
  }
}
