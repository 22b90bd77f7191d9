package graft

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Plan fingerprinting for the mechanized 10×-probe gate
  * ([[Sf10GateSpec]], round-11 verdict #4).
  *
  * fingerprint = sha256 of the ANALYZED logical plan text (hints still
  * visible — the analyzed tree is the closest stable artifact to the
  * query's source text) with exprIds, JVM lambda identities, and the
  * corpus dir normalized out, so the same query fingerprints
  * identically against any SF, session, and build order. Any semantic edit to a query — a changed predicate,
  * a dropped broadcast hint, a new join — changes the fingerprint and
  * trips the gate until a fresh sf1→sf10 exponent is pinned for it.
  */
object FingerprintKit {

  /** NOT `canonicalized`: Canonicalize sorts commutative operand
    * groups (multiCommutativeOp) by child hashCode, which still
    * contains pre-normalization exprIds — the order flips with the
    * session-global counter, i.e. with catalog build order. The raw
    * analyzed text keeps source operand order; stripping `#id` tokens
    * afterwards removes the counter without letting it reorder
    * anything.
    */
  def canonicalText(df: DataFrame, sfDir: String): String =
    renumberExprIds(df.queryExecution.analyzed.toString
      .replace(sfDir, "<SF>")
      // ScalaUDF / typed-map closures print their JVM lambda identity
      // (class$$Lambda$N/0xADDR@hash) — address-dependent, differs per
      // JVM. Keep the owning class, drop the allocation identity.
      .replaceAll("""\$\$Lambda[$/][^,\s)]*""", "\\$\\$Lambda")
      .replaceAll("@[0-9a-f]{6,}", "@id")
      // higher-order-function variables embed the session-global
      // counter in the NAME itself (`lambda x_67`): normalize the
      // suffix, keep the variable letter
      .replaceAll("(lambda [A-Za-z]+)_\\d+", "$1_"))

  /** exprIds come from a session-global counter — build-order
    * dependent across catalog walks — but DELETING them (pre-r13)
    * collapsed distinct same-named attributes: a self-join alias swap
    * (a.col vs b.col) or an edit re-routing which duplicate-named
    * column feeds an expression fingerprinted identically and slipped
    * the gate. Renumber each distinct id to its first-occurrence
    * ordinal in text order instead: stable across sessions and build
    * order, yet `col#5 join col#9` and the swapped wiring renumber
    * differently.
    */
  private def renumberExprIds(text: String): String = {
    val ids = scala.collection.mutable.HashMap.empty[String, Int]
    "#(\\d+)".r.replaceAllIn(text, m =>
      "#" + ids.getOrElseUpdate(m.group(1), ids.size + 1))
  }

  def fingerprint(df: DataFrame, sfDir: String): String = {
    val d = MessageDigest.getInstance("SHA-256")
      .digest(canonicalText(df, sfDir).getBytes(StandardCharsets.UTF_8))
    d.map("%02x".format(_)).mkString.take(16)
  }

  /** Fingerprint every catalog query (prepares first, like the other
    * catalog walks). Queries whose build fails map to "error:<class>"
    * so a broken builder can't silently vanish from the gate.
    */
  def dumpAll(spark: SparkSession, sfDir: String,
              debugDir: Option[String] = None): Map[String, String] = {
    val prepares = SparkEntry.prepares
    SparkEntry.queries.map { case (name, fn) =>
      val fp =
        try {
          prepares.get(name).foreach(p => p(spark, sfDir))
          val df = fn(spark, sfDir)
          debugDir.foreach { dir =>
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"$dir/$name.txt"),
              canonicalText(df, sfDir).getBytes(StandardCharsets.UTF_8))
          }
          fingerprint(df, sfDir)
        } catch { case t: Throwable => s"error:${t.getClass.getSimpleName}" }
      name -> fp
    }
  }
}

/** `Test/runMain graft.FingerprintDumpMain [sfDir] [out.json]` — dumps
  * {name: fingerprint} for tools/update_pins.py to merge with measured
  * sf1/sf10 exponents into the pinned gate file.
  */
object FingerprintDumpMain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = args.lift(1).getOrElse("/tmp/graft_fingerprints.json")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    val fps = FingerprintKit.dumpAll(spark, sfDir, args.lift(2))
    val json = fps.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "$k": "$v"""" }
      .mkString("{\n", ",\n", "\n}\n")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes(StandardCharsets.UTF_8))
    spark.stop()
    println(s"wrote ${fps.size} fingerprints to $out")
  }
}
