package graft

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Adversarial-corpus generator (round-10 verdict #2; not a CI test —
  * run with `Test/runMain graft.AdvGenMain [outDir]`, default
  * `/tmp/graft_adv`): produces an sf0.01-SHAPED corpus — the driver's
  * ten tables, byte-identical schemas, single-file parquet so DuckDB's
  * `read_parquet('dir/t.parquet')` path works — in which every
  * data-dependent branch of the catalog actually FIRES.
  *
  * Why: hash-green on the driver's corpus proves nothing about
  * branches the corpus never exercises. q_doc_pii_stats was red for
  * two rounds while green-by-vacuity on earlier corpora (zero
  * URLs/emails at sf0.01) — the regex paths diverged and no gate
  * noticed. This corpus is the mechanical fix: the full catalog runs
  * against it through the SAME harness
  * (`python3 tools/check_correctness.py /tmp/graft_adv /tmp/graft_adv_verify`,
  * or `tools/check_adversarial.sh`), so Spark-vs-DuckDB agreement is
  * re-proven on inputs where the interesting code paths execute.
  *
  * Construction: each source table is copied VERBATIM (so every
  * existing planted structure — near-dup pairs, the doc_id < 10
  * benchmark stand-in, vec_id < 5 ANN queries — survives), then
  * adversarial rows are appended in a disjoint key range (1e6+ /
  * 1e7+, far above sf0.01 maxima). Plant groups (each comment names
  * the branches it exists to fire):
  *
  *   documents — PII regex hits incl. the `[^ \x09-\x0d]` URL
  *   whitespace-class boundaries and non-matching look-alikes; NFC vs
  *   NFD unicode, CJK/Cyrillic/Arabic/emoji/zero-width/控制 chars
  *   (normalization + langid classes); empty/whitespace-only/1-char/
  *   huge/repetition-heavy/punctuation-only texts (gopher + quality
  *   guards); an exact-dup triple, a near-dup edit chain, shared
  *   paragraphs and boilerplate lines (every dedup family); a
  *   150-identical-doc mega-cluster that BINDS the
  *   SimilarityQ.maxBandBucket = 128 CLIQUE+STAR cap; benchmark
  *   5-gram contamination plants lifted from doc_id < 10; sort-key
  *   ties (same n_chars / token count); a NULL text/lang/source row
  *   and ""/unusual lang + source values (null-ordering and
  *   empty-group-key paths).
  *
  *   embeddings — zero vector (cosine 0-norm guard), identical and
  *   antipodal pairs, denormal and 1e20 magnitudes (float overflow to
  *   Inf), one NaN and one Inf component, copies of vec 0/1 (cross
  *   old-new dups), and a 140-wide identical cluster (binds the
  *   embedding-LSH band cap).
  *
  *   events — NaN/±Inf/null/−0.0/1e308 values; duplicate (user, ts)
  *   rows and 5-deep identical-ts ties; spans exactly AT the
  *   30-minute session gap (> vs >= boundary); exact-midnight and
  *   23:59:59.999999 window edges; a 1-event user, a 300-event
  *   1 Hz bot burst; malformed/empty/nested/unicode/null props JSON;
  *   ""/new/null event types; 1970 and 2030 date outliers (calendar-
  *   grain sweeps).
  *
  *   TPC-H side — customer with no orders, order with no lineitems
  *   (empty-group / left-join-null branches), discount 0 and 1
  *   (divide-by-(1−d) guards), zero/negative/sentinel quantities
  *   (range- and sentinel-invalidation), o_totalprice ties, leap-day
  *   order date, NULL c_mktsegment / o_orderpriority (null group
  *   keys), unicode + quote-bearing names, a nation with no
  *   customers, a region with no nations.
  *
  * Determinism: every planted value is a literal or a pure function
  * of constants — no RNG, no clock — so the corpus is byte-stable
  * across regenerations and the existing oracle replay machinery
  * (corpus_key = SUM(n_chars) aux artifacts) just works.
  */
object AdvGenMain {

  private val src = "/root/testdata/sf0.01"

  private type Doc = (Long, Option[String], Option[String], Option[String])
  private type Emb = (Long, Array[Float], Int)
  private type Ev = (Long, String, Long, Option[String], Option[Double], Option[String])
  private type Li = (Long, Long, Long, Int, Double, Double, Double, Double, String, String, String)

  /** Cast/reorder planted columns to the source schema (string → the
    * source's timestamp flavor, array<float,false> → nullable, Int →
    * int32, ...) so the union — and the written parquet — is
    * schema-identical to the driver's files.
    */
  private def conform(planted: DataFrame, schema: StructType): DataFrame =
    planted.select(schema.fields.map(f => col(f.name).cast(f.dataType)).toIndexedSeq: _*)

  /** Write as a SINGLE file named `t.parquet` (the harness reads
    * `read_parquet('$dir/t.parquet')` — a plain path, not a glob — so
    * a Spark part-file directory would be unreadable to DuckDB).
    */
  private def writeOne(df: DataFrame, out: String, t: String): Unit = {
    val tmp = s"$out/__tmp_$t"
    df.coalesce(1).write.mode("overwrite").parquet(tmp)
    val part = new java.io.File(tmp).listFiles()
      .find(f => f.getName.endsWith(".parquet")).get
    Files.createDirectories(Paths.get(out))
    Files.move(part.toPath, Paths.get(s"$out/$t.parquet"),
      StandardCopyOption.REPLACE_EXISTING)
    new java.io.File(tmp).listFiles().foreach(_.delete())
    Files.deleteIfExists(Paths.get(tmp))
    println(s"adv: wrote $t")
  }

  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft_adv")
    val spark = Sessions.local()
    spark.sparkContext.setLogLevel("ERROR")
    generate(spark, out)
    spark.stop()
  }

  /** Corpus generation proper, callable from a spec against a shared
    * session (AdvCoverageSpec regenerates into its own /tmp dir — it
    * must not stop the suite-wide session the way [[main]] does).
    */
  def generate(spark: SparkSession, out: String): Unit = {
    import spark.implicits._

    def tbl(t: String): DataFrame = spark.read.parquet(s"$src/$t.parquet")

    // ------------------------------------------------------------------
    // documents
    // ------------------------------------------------------------------
    val docsSrc = tbl("documents")
    // benchmark stand-in texts (doc_id < 10): bounded 10-row collect,
    // used to plant real 5-gram contamination
    val benchTexts = docsSrc.filter(col("doc_id") < 10)
      .select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    def benchSpan(i: Int, from: Int, n: Int): String =
      benchTexts(i)._2.split("\\s+").slice(from, from + n).mkString(" ")

    val d = scala.collection.mutable.ArrayBuffer.empty[Doc]
    var id = 1000000L
    def doc(text: String, lang: String = "en", source: String = "adv0"): Unit = {
      d += ((id, Option(text), Option(lang), Option(source))); id += 1
    }

    // -- A: PII regex branches (URL whitespace-class boundaries, email
    //       shapes, non-matching look-alikes)
    doc("contact me at alice@example.com for details")
    doc("visit https://example.com/path?q=1 now", source = "adv1")
    doc("url with vt https://a.example/xtail and more")
    doc("url with ff https://a.example/ytail here")
    doc("url with cr https://a.example/z\rtail here")
    doc("tab bounded https://t.example/q\tafter words")
    doc("newline https://n.example/p\nnext line text")
    doc("url at end of doc https://end.example/final")
    doc("two http://a.b/1 urls https://c.d/2 in one doc", source = "adv1")
    doc("UPPER HTTPS://CAPS.EXAMPLE/A does not match the lowercase pattern")
    doc("no tld bob@localhost but carol.smith+tag@sub.domain.co.uk matches")
    doc("ip 192.168.0.1 phone 212-555-0100 ssn 123-45-6789 no match")
    doc("mailto:dave@ex.org still contains a matching email dave@ex.org")
    doc("ftp://old.example/file is not http. x@y.z minimal email no (z too short)")
    doc("a@b.co is the shortest matching email and https://s is the shortest url")

    // -- B: unicode normalization / langid classes
    doc("café résumé naïve composed accents", source = "adv2")
    doc("café résumé naïve combining accents", source = "adv2")
    doc("深度学习模型在大规模数据上训练效果更好", lang = "zh")
    doc("Быстрая коричневая лиса прыгает", lang = "xx")
    doc("النص العربي للاختبار جيد", lang = "xx")
    doc("rocket 🚀 launch 🌕 done 🎉 emoji astral plane")
    doc("zero​width​space inside words here")
    doc("non breaking space text here")
    doc("ctrlcharshere and  end")
    doc("ｆｕｌｌｗｉｄｔｈ　ｔｅｘｔ fullwidth")
    doc("mixed language doc 语言混合 with english and 中文 together")

    // -- C: degenerate shapes (gopher/quality guards)
    doc("")
    doc("   \t   ")
    doc("x")
    doc("!!! ??? *** ((( ))) ,,, ...")
    doc("12345 67890 11111 22222 33333")
    d += ((id, None, None, None)); id += 1 // full-null row (null ordering paths)
    doc((0 until 3000).map(i => s"tok${i % 50}").mkString(" "), source = "adv3")
    doc(Array.fill(500)("spam").mkString(" "), source = "adv3")
    doc("a" * 5000, source = "adv3")
    doc("word " * 99 + "word", lang = "", source = "übersrc")

    // -- D: dedup families (exact triple, edit chain, shared
    //       paragraphs, boilerplate, self-repeated lines)
    val dupText = (0 until 40).map(i => s"dupbase${i % 13} common").mkString(" ")
    doc(dupText, source = "adv0"); doc(dupText, source = "adv1"); doc(dupText, source = "adv2")
    val base = (0 until 60).map(i => s"near${i}").mkString(" ")
    for (v <- 0 until 6)
      doc(base.split(" ").updated(10 * v, s"edited$v").mkString(" "), source = "adv1")
    val sharedPara = "this exact paragraph is shared across five documents verbatim"
    for (v <- 0 until 5)
      doc(s"unique opening $v words here\n\n$sharedPara\n\nunique closing $v tail", source = "adv2")
    doc((0 until 10).map(_ => "repeated line content here").mkString("\n"))
    for (v <- 0 until 8)
      doc(s"subscribe to our newsletter now\nbody text variant $v differs\nall rights reserved footer", source = "adv3")

    // -- E: mega-cluster — 150 byte-identical docs; > maxBandBucket =
    //       128, so the CLIQUE+STAR cap and the LSH bucket cap BIND
    val mega = (0 until 30).map(i => s"mega${i % 11} cluster").mkString(" ")
    for (_ <- 0 until 150) doc(mega, source = "adv0")

    // -- F: benchmark contamination (verbatim 5-gram+ spans of the
    //       doc_id < 10 eval stand-in, plus one full-copy leak)
    for (i <- 0 until 5)
      doc(s"leading filler then ${benchSpan(i, 2, 8)} then trailing filler", source = "adv1")
    doc(benchTexts(3)._2, source = "adv1")

    // -- G: sort-key ties — same n_chars, same token count, distinct text
    doc("tie aaaa bbbb cccc dddd"); doc("tie bbbb aaaa dddd cccc")
    doc("tie cccc dddd aaaa bbbb"); doc("tie dddd cccc bbbb aaaa")

    val docsPlanted = d.toSeq.toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", length(col("text")).cast("long"))
    writeOne(docsSrc.unionByName(conform(docsPlanted, docsSrc.schema)), out, "documents")

    // ------------------------------------------------------------------
    // embeddings (dim 64)
    // ------------------------------------------------------------------
    val embSrc = tbl("embeddings")
    val v01 = embSrc.filter(col("vec_id") < 2)
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect().sortBy(_._1)
    def vec(f: Int => Float): Array[Float] = Array.tabulate(64)(f)
    val unit = vec(i => if (i == 0) 1f else 0f)
    val e = scala.collection.mutable.ArrayBuffer.empty[Emb]
    var vid = 1000000L
    def emb(a: Array[Float], label: Int = 7): Unit = { e += ((vid, a, label)); vid += 1 }

    emb(vec(_ => 0f))                       // zero vector: 0-norm cosine guard
    emb(unit); emb(unit)                    // identical pair (cos exactly 1)
    emb(vec(i => if (i == 0) -1f else 0f))  // antipodal to unit (cos exactly -1)
    emb(vec(_ => 1e-30f))                   // denormal norm underflow
    emb(vec(_ => 1e20f))                    // dot overflow to Inf in float
    emb(vec(i => if (i == 0) Float.NaN else 0.5f), label = -1)
    emb(vec(i => if (i == 0) Float.PositiveInfinity else 0.5f), label = 999)
    emb(v01(0)._2); emb(v01(1)._2)          // cross old-new exact dups
    val cluster = vec(i => (i % 7).toFloat / 7f)
    for (_ <- 0 until 140) emb(cluster)     // binds the band cap (128)

    val embPlanted = e.toSeq.toDF("vec_id", "embedding", "label")
    writeOne(embSrc.unionByName(conform(embPlanted, embSrc.schema)), out, "embeddings")

    // ------------------------------------------------------------------
    // events
    // ------------------------------------------------------------------
    val evSrc = tbl("events")
    val ev = scala.collection.mutable.ArrayBuffer.empty[Ev]
    var eid = 10000000L
    def event(ts: String, user: Long, typ: String, value: java.lang.Double,
              props: String = "{}"): Unit = {
      ev += ((eid, ts, user, Option(typ), Option(value).map(_.doubleValue), Option(props)))
      eid += 1
    }
    val uA = 1000000L; val uB = 1000001L; val uBot = 1000002L; val uGap = 1000003L
    // ties: 5 events at the identical microsecond + a duplicate-row pair
    for (_ <- 0 until 5) event("2024-01-10 12:00:00.000000", uA, "click", 1.0)
    event("2024-01-10 12:00:00.000000", uA, "view", 2.0)
    // window edges: exact midnight, last representable microsecond of a day
    event("2024-01-15 00:00:00.000000", uA, "view", 3.0)
    event("2024-01-14 23:59:59.999999", uA, "view", 4.0)
    // session-gap boundary: gaps of exactly 1800s, 1799.999999s, 1800.000001s
    event("2024-01-16 00:00:00.000000", uGap, "click", 1.0)
    event("2024-01-16 00:30:00.000000", uGap, "click", 1.0)   // == gap
    event("2024-01-16 01:00:00.000001", uGap, "click", 1.0)   // gap + 1us
    event("2024-01-16 01:29:59.999999", uGap, "click", 1.0)   // gap - 1us
    // special values: NaN, ±Inf, null, -0.0, 1e308 (sum-overflow)
    event("2024-01-17 10:00:00", uA, "purchase", Double.NaN)
    event("2024-01-17 10:00:01", uA, "purchase", Double.PositiveInfinity)
    event("2024-01-17 10:00:02", uA, "purchase", Double.NegativeInfinity)
    event("2024-01-17 10:00:03", uA, "purchase", null)
    event("2024-01-17 10:00:04", uA, "purchase", -0.0)
    event("2024-01-17 10:00:05", uA, "purchase", 1e308)
    event("2024-01-17 10:00:06", uA, "purchase", 1e308)
    // props JSON branches: empty string, malformed, nested, unicode, null
    event("2024-01-18 09:00:00", uA, "view", 1.0, props = "")
    event("2024-01-18 09:00:01", uA, "view", 1.0, props = "not json {")
    event("2024-01-18 09:00:02", uA, "view", 1.0,
      props = """{"k":{"n":[1,2,{"d":true}]}}""")
    event("2024-01-18 09:00:03", uA, "view", 1.0, props = """{"u":"é"}""")
    ev += ((eid, "2024-01-18 09:00:04", uA, Some("view"), Some(1.0), None)); eid += 1
    // event_type branches: empty, novel, null
    event("2024-01-19 08:00:00", uA, "", 1.0)
    event("2024-01-19 08:00:01", uA, "weird_type", 1.0)
    ev += ((eid, "2024-01-19 08:00:02", uA, None, Some(1.0), Some("{}"))); eid += 1
    // single-event user; 300-event 1 Hz bot burst
    event("2024-01-20 12:34:56.789012", uB, "signup", 1.0)
    for (i <- 0 until 300)
      event(f"2024-01-21 06:${i / 60}%02d:${i % 60}%02d.000000", uBot, "click", 1.0)
    // calendar outliers: epoch day, far future
    event("1970-01-01 00:00:00.000000", uA, "view", 1.0)
    event("2030-12-31 23:59:59.000000", uA, "view", 1.0)

    val evPlanted = ev.toSeq.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    writeOne(evSrc.unionByName(conform(evPlanted, evSrc.schema)), out, "events")

    // ------------------------------------------------------------------
    // TPC-H side
    // ------------------------------------------------------------------
    val custSrc = tbl("customer")
    val custPlanted = Seq[(Long, Option[String], Int, Double, Option[String])](
      (1000000L, Some("Adversarial NoOrders"), 0, 0.0, Some("BUILDING")), // no orders
      (1000001L, Some("Adversarial O'Brien \"Ltd\""), 1, -999.99, None),  // null segment
      (1000002L, Some("Adversarial café"), 24, 0.0, Some(""))        // empty segment
    ).toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment")
    writeOne(custSrc.unionByName(conform(custPlanted, custSrc.schema)), out, "customer")

    val ordSrc = tbl("orders")
    val ordPlanted = Seq[(Long, Long, String, Double, String, Option[String])](
      (10000000L, 1000001L, "X", 0.0, "2024-02-29 00:00:00", Some("0-WEIRD")),  // no lineitems, leap day
      (10000001L, 1000001L, "O", 77777.77, "2024-01-05 00:00:00", Some("1-URGENT")), // totalprice tie a
      (10000002L, 1000002L, "O", 77777.77, "2024-01-05 00:00:00", None)              // tie b, null priority
    ).toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate", "o_orderpriority")
    writeOne(ordSrc.unionByName(conform(ordPlanted, ordSrc.schema)), out, "orders")

    val liSrc = tbl("lineitem")
    val liPlanted = Seq[Li](
      (10000001L, 1L, 1L, 1, 0.0, 0.0, 0.0, 0.0, "N", "O", "2024-01-06 00:00:00"),      // zero everything
      (10000001L, 2L, 2L, 2, -5.0, -100.0, 0.0, 0.0, "R", "F", "2024-01-07 00:00:00"),  // negative qty/price
      (10000001L, 3L, 3L, 3, 10.0, 1000.0, 1.0, 0.08, "N", "O", "2024-01-08 00:00:00"), // discount == 1
      (10000001L, 4L, 4L, 4, -999.0, 500.0, 0.05, 0.0, "A", "F", "2024-01-09 00:00:00"),// sentinel qty
      (10000001L, 5L, 5L, 5, 7.0, 700.0, 0.05, 0.05, "N", "O", "1992-01-01 00:00:00"),  // date outlier
      (10000002L, 5L, 5L, 1, 7.0, 700.0, 0.05, 0.05, "N", "O", "2024-01-10 00:00:00"),  // identical twin a
      (10000002L, 5L, 5L, 2, 7.0, 700.0, 0.05, 0.05, "N", "O", "2024-01-10 00:00:00")   // twin b (linenumber only)
    ).toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
      "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus", "l_shipdate")
    writeOne(liSrc.unionByName(conform(liPlanted, liSrc.schema)), out, "lineitem")

    val partSrc = tbl("part")
    val partPlanted = Seq[(Long, String, String, String, Int, Double)](
      (1000000L, "adversarial widget café", "Brand#00", "", 0, 0.0),
      (1000001L, "adversarial negative", "Brand#00", "TYPE NEW KIND", -1, 1.0)
    ).toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
    writeOne(partSrc.unionByName(conform(partPlanted, partSrc.schema)), out, "part")

    val supSrc = tbl("supplier")
    val supPlanted = Seq[(Long, String, Int, Double)](
      (1000000L, "Adversarial O'Supplier \"Inc\"", 0, -1000.0)
    ).toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    writeOne(supSrc.unionByName(conform(supPlanted, supSrc.schema)), out, "supplier")

    val natSrc = tbl("nation")
    val natPlanted = Seq[(Int, String, Int)]((99, "ZZVOID", 0))  // no customers/suppliers
      .toDF("n_nationkey", "n_name", "n_regionkey")
    writeOne(natSrc.unionByName(conform(natPlanted, natSrc.schema)), out, "nation")

    val regSrc = tbl("region")
    val regPlanted = Seq[(Int, String)]((9, "NOWHERE"))          // no nations
      .toDF("r_regionkey", "r_name")
    writeOne(regSrc.unionByName(conform(regPlanted, regSrc.schema)), out, "region")

    // post-generation sanity: every table readable, schema unchanged
    graft.sources.Tables.names.foreach { t =>
      val a = spark.read.parquet(s"$src/$t.parquet")
      val b = spark.read.parquet(s"$out/$t.parquet")
      require(a.schema == b.schema, s"$t: schema drifted:\n${a.schema}\n${b.schema}")
      println(s"check: $t rows=${b.count()} (src ${a.count()})")
    }
  }

  /** Neutralized twin of an adversarial corpus (round-10 verdict #4 —
    * the mutation test's control arm): SAME tables, SAME row counts,
    * SAME planted keys, but every planted row's CONTENT swapped for
    * bland, finite, distinct, non-null values — plain English text,
    * well-formed vectors, 61-second event spacing with no ties and no
    * session-gap boundaries, in-domain TPC-H numbers.
    *
    * Why content-swap rather than "benign = the driver corpus":
    * appending ANY rows changes counts, so "adv differs from sf0.01"
    * is vacuously true for every class. Holding keys/cardinality fixed
    * and varying only the adversarial content isolates exactly the
    * thing the gate exists to prove — that each planted data class
    * still FIRES a branch that moves some query's output. A class
    * whose guard goes dead (regex that no longer matches, a cap that
    * no longer binds, a tie-break that no longer sees ties) makes the
    * adversarial and neutral outputs IDENTICAL, and AdvCoverageSpec
    * goes red instead of the gate passing green-by-vacuity.
    *
    * Structural plants (customer with no orders, order with no
    * lineitems, nation/region with no members, the 1-event user) are
    * key-relational, so a content swap PRESERVES them — those are
    * asserted directly on the adversarial corpus by the spec instead.
    */
  def neutralize(spark: SparkSession, advDir: String, out: String): Unit = {
    def tbl(t: String): DataFrame = spark.read.parquet(s"$advDir/$t.parquet")
    def swap(t: String, planted: org.apache.spark.sql.Column,
             repl: (String, org.apache.spark.sql.Column)*): Unit = {
      val srcDf = tbl(t)
      val byName = repl.toMap
      val swapped = srcDf.select(srcDf.schema.fields.map { f =>
        byName.get(f.name)
          // cast the replacement to the field type BEFORE when(): the
          // two branches must agree (string literal vs timestamp col)
          .map(c => when(planted, c.cast(f.dataType)).otherwise(col(f.name)).as(f.name))
          .getOrElse(col(f.name))
      }.toIndexedSeq: _*)
      writeOne(conform(swapped, srcDf.schema), out, t)
    }

    val neutralText = concat(
      lit("plain neutral filler text about ordinary subjects number "),
      col("doc_id").cast("string"),
      lit(" with several additional ordinary everyday words appended for balance"))
    swap("documents", col("doc_id") >= 1000000L,
      "text" -> neutralText,
      "lang" -> lit("en"),
      "source" -> lit("adv0"),
      "n_chars" -> length(neutralText).cast("long"))

    swap("embeddings", col("vec_id") >= 1000000L,
      // distinct, finite, zero-free, moderate-norm vectors: a pure
      // function of vec_id so the twin stays byte-stable
      "embedding" -> expr(
        "transform(sequence(0, 63), i -> CAST((CAST(pmod(vec_id * 31 + i * 7, 97) AS INT) - 48) / 48.0 AS FLOAT))"),
      "label" -> lit(7))

    // 61-second spacing from a fixed base: strictly monotone in
    // event_id, so no ties, no duplicate rows, no exact-gap sessions,
    // no midnight edges, no 1 Hz cadence, no calendar outliers
    val evSchema = tbl("events").schema
    val neutralSec = lit(1709251200L) + (col("event_id") - 10000000L) * 61L
    val neutralTs =
      if (evSchema("ts").dataType == org.apache.spark.sql.types.LongType)
        (neutralSec * 1000000000L).cast("long") // int64-nanos generation
      else timestamp_seconds(neutralSec)
    swap("events", col("event_id") >= 10000000L,
      "ts" -> neutralTs,
      "event_type" -> lit("click"),
      "value" -> lit(1.0),
      "props" -> lit("{}"))

    swap("customer", col("c_custkey") >= 1000000L,
      "c_name" -> concat(lit("Neutral Customer "), col("c_custkey").cast("string")),
      "c_acctbal" -> lit(100.0),
      "c_mktsegment" -> lit("BUILDING"))

    swap("orders", col("o_orderkey") >= 10000000L,
      "o_orderstatus" -> lit("O"),
      "o_totalprice" -> (lit(50000.0) + pmod(col("o_orderkey"), lit(1000L))),
      "o_orderdate" -> lit("2024-01-05 00:00:00"),
      "o_orderpriority" -> lit("3-MEDIUM"))

    swap("lineitem", col("l_orderkey") >= 10000000L,
      "l_quantity" -> (lit(10.0) + col("l_linenumber")),
      "l_extendedprice" -> (lit(1000.0) + col("l_linenumber") * 10.0),
      "l_discount" -> lit(0.05),
      "l_tax" -> lit(0.05),
      "l_returnflag" -> lit("N"),
      "l_linestatus" -> lit("O"),
      "l_shipdate" -> expr(
        "timestamp'2024-01-06 00:00:00' + make_interval(0, 0, 0, l_linenumber)"))

    swap("part", col("p_partkey") >= 1000000L,
      "p_name" -> lit("neutral brass part"),
      "p_type" -> lit("STANDARD BRASS"),
      "p_size" -> lit(10),
      "p_retailprice" -> lit(100.0))

    swap("supplier", col("s_suppkey") >= 1000000L,
      "s_name" -> lit("Neutral Supplier"),
      "s_acctbal" -> lit(100.0))

    swap("nation", col("n_nationkey") === 99,
      "n_name" -> lit("NEUTRALIA"))

    swap("region", col("r_regionkey") === 9,
      "r_name" -> lit("NEUTRALREG"))
  }
}
