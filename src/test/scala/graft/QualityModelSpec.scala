package graft

import org.apache.spark.sql.functions._

import graft.functions.QualityModel

/** Ground truth for the model-based quality filter: the trainer must be
  * deterministic, publish quantized decimal weights, and actually
  * separate a separable planted corpus (stopword-rich vs stopword-free
  * docs score on opposite sides of 0 after training against the
  * stopword-fraction heuristic).
  */
class QualityModelSpec extends SparkSpecBase {
  import spark.implicits._

  /** 120 docs: even ids stopword-rich (the/a/an heavy), odd ids
    * stopword-free — linearly separable on the unigram features.
    */
  private lazy val planted = {
    val rich = "the a an the of data the a table the an merge the a scan"
    val poor = "vector window batch stream hash sort group filter join part"
    (0 until 120).map { i =>
      (i.toLong, if (i % 2 == 0) s"$rich extra$i" else s"$poor extra$i")
    }.toDF("doc_id", "text")
  }

  test("training is deterministic and weights are quantized to 6 decimals") {
    val w1 = QualityModel.train(planted)
    val w2 = QualityModel.train(planted)
    assert(w1 == w2)
    assert(w1.exists(_._1 == QualityModel.biasTerm))
    assert(w1.forall(_._2.scale == 6))
    assert(w1.size <= QualityModel.vocabSize + 1)
  }

  test("trained model separates the planted classes through the full query path") {
    val dir = java.nio.file.Files.createTempDirectory("qmodel").toString
    planted.withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_doc_quality_model")(spark, dir)
      .collect().map(r => (r.getLong(0), r.getDouble(2), r.getBoolean(3)))
    assert(out.length == 120)
    val (rich, poor) = out.partition(_._1 % 2 == 0)
    // every stopword-rich doc must out-score every stopword-free doc
    assert(rich.map(_._2).min > poor.map(_._2).max)
    // and the decision bit splits the classes
    assert(rich.forall(_._3) && poor.forall(!_._3),
      s"misclassified: ${out.filter(r => r._3 != (r._1 % 2 == 0)).take(5).toSeq}")
  }

  test("vocab is top-df with deterministic tie-break") {
    val v = QualityModel.vocab(planted)
    assert(v.distinct.size == v.size)
    // the shared tokens appear in 60+ docs each and must all be in vocab
    Seq("the", "a", "an", "vector", "window").foreach(t => assert(v.contains(t)))
  }
}
