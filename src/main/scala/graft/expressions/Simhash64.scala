package graft.expressions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

import scala.util.hashing.MurmurHash3

/** `simhash64(array<string>) -> bigint` — native form of the
  * token-frequency-weighted 64-bit SimHash
  * (graft.functions.TextFunctions.simhash64). Same promotion rationale
  * as [[MinhashSig]]: the UDF boxes every token array to Seq[String]
  * and breaks whole-stage codegen; the expression reads tokens out of
  * ArrayData and returns a primitive long. Hash math is unchanged
  * (MurmurHash3 over the token, frequency-weighted bit votes), so
  * bit-identity with the UDF holds by construction (pinned in
  * SimhashSpec).
  */
case class Simhash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 expects array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "simhash64"

  override protected def withNewChildInternal(newChild: Expression): Simhash64 =
    copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any =
    Simhash64.sigOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.expressions.Simhash64.sigOf($c);")
}

object Simhash64 {

  /** Signature of one token array — shared by interpreted eval and
    * generated code. NULL elements are skipped (the UDF's Seq decode
    * surfaced them as nulls that murmur would NPE on — skipping
    * matches the practical contract: tokens() never produces NULL
    * elements).
    */
  def sigOf(arr: ArrayData): Long = {
    val acc = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i).toString
        val h1 = MurmurHash3.stringHash(t, 0x51ed270b)
        val h2 = MurmurHash3.stringHash(t, 0x2545f491)
        val h = (h1.toLong << 32) | (h2.toLong & 0xffffffffL)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) acc(bit) += 1 else acc(bit) -= 1
          bit += 1
        }
      }
      i += 1
    }
    var out = 0L
    var bit = 0
    while (bit < 64) { if (acc(bit) > 0) out |= (1L << bit); bit += 1 }
    out
  }

  val identifier: FunctionIdentifier = FunctionIdentifier("simhash64")

  val info: ExpressionInfo = new ExpressionInfo(
    classOf[Simhash64].getCanonicalName, null, "simhash64")

  val builder: Seq[Expression] => Expression = { children =>
    require(children.size == 1, "simhash64 takes exactly 1 argument")
    Simhash64(children.head)
  }

  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(identifier))
      registry.registerFunction(identifier, info, builder)
  }
}
