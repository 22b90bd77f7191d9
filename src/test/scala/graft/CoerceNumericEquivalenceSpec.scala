package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.transform.Ops

/** The r14 digit-guard in [[Ops.coerceNumeric]] short-circuits
  * String→Integral TRY casts past the ANSI throwing path (an exception
  * is constructed per unparseable row — `Cast.canUseLegacyCastForTryCast`
  * only covers Fractional/Datetime targets). The guard must be
  * SEMANTICALLY INVISIBLE: for every input, guarded coercion must equal
  * a bare `try_cast`. This spec proves it over an adversarial string
  * set (signs, whitespace variants, unicode digits, overflow, booleans,
  * decimals, exponents, empty/NULL) plus every 1–2-char ASCII-printable
  * combination, and over non-string input columns.
  */
class CoerceNumericEquivalenceSpec extends SparkSpecBase {
  import spark.implicits._

  private val handPicked: Seq[String] = Seq(
    "0", "1", "-1", "+1", "007", " 42", "42 ", "\t42\n", " +9 ", "- 1",
    "", " ", "+", "-", ".", "1.5", "-0.5", ".5", "1.", "1e3", "1E-2",
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "9223372036854775807", "9223372036854775808", "127", "128", "-129",
    "32767", "32768", "true", "false", "TRUE", "False", "t", "f",
    "NaN", "nan", "Infinity", "-Infinity", "inf", "-inf",
    "F", "O", "P", "1-URGENT", "abc", "a1b", "0x1F", "١٢٣", "٣",
    " 1", "1 ", " 1", "１２３", "null", "NULL",
    "interval 1 year", "2020-01-01", "12:34:56")

  private val generated: Seq[String] = {
    val cs = (' ' to '~').map(_.toString)
    cs ++ (for (a <- Seq("+", "-", " ", "1", "a", "."); b <- cs) yield a + b)
  }

  private def compare(df: org.apache.spark.sql.DataFrame, c: Column,
                      to: DataType): Unit = {
    val got = df.select(
        c.try_cast(to).cast(StringType).as("bare"),
        Ops.coerceNumeric(c, to).cast(StringType).as("guarded"),
        c.cast(StringType).as("in"))
      .collect()
    val bad = got.filter(r => r.getAs[String]("bare") != r.getAs[String]("guarded"))
    assert(bad.isEmpty, s"$to mismatches: " + bad.take(10).map(r =>
      s"[in=${r.getAs[String]("in")} bare=${r.getAs[String]("bare")} " +
        s"guarded=${r.getAs[String]("guarded")}]").mkString(", "))
  }

  test("guarded integral coercion == bare try_cast on adversarial and exhaustive short strings") {
    val df = (handPicked ++ generated).map(Option(_)).toDF("s")
      .union(Seq(Option.empty[String]).toDF("s"))
    for (t <- Seq(ByteType, ShortType, IntegerType, LongType))
      compare(df, col("s"), t)
  }

  test("guarded coercion == bare try_cast for non-string inputs (double, decimal, boolean, long)") {
    val doubles = Seq(0.0, 1.5, -2.7, 1e18, -1e18, Double.NaN,
      Double.PositiveInfinity, Double.NegativeInfinity, 127.9).toDF("v")
    compare(doubles, col("v"), IntegerType)
    val decimals = Seq("0.00", "10.75", "-3.50", "99999999.99")
      .toDF("s").select(col("s").cast(DecimalType(10, 2)).as("v"))
    compare(decimals, col("v"), IntegerType)
    val booleans = Seq(true, false).toDF("v")
    compare(booleans, col("v"), IntegerType)
    val longs = Seq(0L, Int.MaxValue.toLong + 1, Int.MinValue.toLong - 1).toDF("v")
    compare(longs, col("v"), IntegerType)
  }

  test("fractional targets keep the bare path (legacy non-throwing cast already applies)") {
    val df = handPicked.toDF("s")
    for (t <- Seq(DoubleType, FloatType, DecimalType(12, 2)))
      compare(df, col("s"), t)
  }
}
