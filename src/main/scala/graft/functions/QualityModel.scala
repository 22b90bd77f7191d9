package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fasttext-style linear quality classifier — the "model-based quality
  * filtering" stage of the GPT-3/CCNet pipelines (a cheap linear model
  * over unigram features, trained against a heuristic label, scores
  * every document; the pipeline keeps docs the model likes).
  *
  * Design for the oracle contract (QueryDef): scoring must be
  * hash-reproducible in DuckDB, so the trained weights are QUANTIZED to
  * DECIMAL(18,6) at publish time and the per-doc feature sum
  * Σ w_t · c_t runs entirely in decimal (exact, order-independent in
  * both engines); only the final score divides as IEEE doubles. A raw
  * double weight table would NOT replay: the two engines round
  * binary64→decimal differently, and a double Σ depends on
  * accumulation order.
  *
  * Scale shape: vocab selection is one distributed DF pass
  * (top-`vocabSize` terms, deterministic tie-break); training collects
  * only a fixed-size hash-ordered SAMPLE to the driver (the same
  * bounded-collect class as BPE vocab / k-means init); scoring is
  * distributed — exploded tokens join the broadcast weight table and
  * re-aggregate per doc.
  */
object QualityModel {

  val vocabSize = 256
  val sampleCap = 1000
  val labelStopwordFrac = 0.06
  val epochs = 200
  val learningRate = 1.0
  val l2 = 1e-4
  val biasTerm = "__bias__"

  /** Top-`vocabSize` corpus terms by document frequency (ties → term
    * asc) — deterministic, one distributed pass.
    */
  def vocab(docs: DataFrame): Seq[String] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), explode(TextFunctions.tokens(col("text"))).as("term"))
      .distinct()
      .groupBy("term").agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("term").asc)
      .limit(vocabSize)
      .select("term").as[String].collect().toSeq
  }

  /** Train on a deterministic md5-ordered sample: heuristic label =
    * stopword fraction ≥ [[labelStopwordFrac]]; features = per-term
    * count / n_tokens over [[vocab]]; plain batch gradient descent
    * (fixed epochs/lr/l2, zero init, sample in sorted order) — fully
    * deterministic. Returns (term → weight) rows INCLUDING the
    * [[biasTerm]] row, each weight rounded HALF_UP to 6 decimals.
    */
  def train(docs: DataFrame): Seq[(String, JBigDecimal)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val terms = vocab(docs)
    val tIndex = terms.zipWithIndex.toMap
    val sample = docs
      .select(col("doc_id"), col("text"),
        md5(col("doc_id").cast("string")).as("__h"))
      .orderBy(col("__h").asc, col("doc_id").asc)
      .limit(sampleCap)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)].collect().sortBy(_._1)
    val stop = TextFunctions.stopwords.toSet
    val rows = sample.flatMap { case (_, text) =>
      // tokensLocal mirrors the scorer's tokens() bit-for-bit (empty
      // tokens kept); a divergent trainer tokenizer mis-calibrates the
      // weights on any corpus with tab/newline-padded documents
      val toks = if (text == null) Array.empty[String]
                 else TextFunctions.tokensLocal(text)
      if (toks.isEmpty) None
      else {
        val x = new Array[Double](terms.size)
        toks.foreach(t => tIndex.get(t).foreach(i => x(i) += 1.0))
        val n = toks.length.toDouble
        var i = 0
        while (i < x.length) { x(i) /= n; i += 1 }
        val y = if (toks.count(stop.contains).toDouble / n >= labelStopwordFrac) 1.0 else 0.0
        Some((x, y))
      }
    }
    val d = terms.size
    val w = new Array[Double](d)
    var b = 0.0
    var epoch = 0
    while (epoch < epochs) {
      val gw = new Array[Double](d)
      var gb = 0.0
      rows.foreach { case (x, y) =>
        var z = b
        var i = 0
        while (i < d) { z += w(i) * x(i); i += 1 }
        val p = 1.0 / (1.0 + math.exp(-z))
        val err = p - y
        i = 0
        while (i < d) { gw(i) += err * x(i); i += 1 }
        gb += err
      }
      val m = rows.length.toDouble.max(1.0)
      var i = 0
      while (i < d) { w(i) -= learningRate * (gw(i) / m + l2 * w(i)); i += 1 }
      b -= learningRate * (gb / m)
      epoch += 1
    }
    def q(v: Double): JBigDecimal =
      JBigDecimal.valueOf(v).setScale(6, RoundingMode.HALF_UP)
    terms.zip(w.toSeq).map { case (t, wi) => (t, q(wi)) } :+ (biasTerm, q(b))
  }
}
