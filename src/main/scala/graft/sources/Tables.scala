package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated benchmark tables (TESTDATA.md).
  *
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst's vectorized reader, predicate
  * pushdown and column pruning all apply; at cluster scale the same
  * paths would simply point at partitioned directories and nothing
  * here changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Relation-resolution memo (r14, guide §1/§6): `spark.read.parquet`
    * pays ~80–130 ms of driver-side work per call (fresh
    * InMemoryFileIndex listing + a synchronous footer read for schema
    * inference), and every catalog query fn re-resolves each table on
    * every invocation — twice per query in the bench's min-of-two, ~18 s
    * across the 237-query catalog at sf0.1. The memo returns the SAME
    * unresolved relation (metadata only: listing + schema — exactly what
    * a metastore entry is; no rows are cached and every materialization
    * still scans the parquet), keyed by a CONTENT SIGNATURE of the path
    * — (size, mtime) for a file, the child (name, size, mtime) set for a
    * directory — so a corpus rewritten in place (planted-spec dirs,
    * regenerated /tmp corpora) re-resolves instead of serving a stale
    * file list. The analyzed-plan text is identical to a fresh resolve,
    * so plan fingerprints and the 10x-probe pins are unaffected.
    */
  private val relationMemo =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), DataFrame]()

  private def contentSignature(path: java.nio.file.Path): String = {
    import java.nio.file.Files
    def stamp(p: java.nio.file.Path): String =
      s"${Files.size(p)}:${Files.getLastModifiedTime(p).toMillis}"
    try {
      if (Files.isDirectory(path)) {
        import scala.jdk.CollectionConverters._
        val s = Files.list(path)
        try s.iterator().asScala.map(c => s"${c.getFileName}=${stamp(c)}")
          .toSeq.sorted.mkString(";")
        finally s.close()
      } else stamp(path)
    } catch { case _: java.io.IOException => s"unreadable:${System.nanoTime()}" }
  }

  /** A/B kill-switch: SPARK_GRAFT_RELATION_MEMO=0 restores the
    * resolve-per-call behavior (used for back-to-back adjudication legs
    * without a recompile; the default is on).
    */
  private val memoEnabled: Boolean =
    sys.env.get("SPARK_GRAFT_RELATION_MEMO").forall(_ != "0")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    if (!memoEnabled) spark.read.parquet(s"$sfDir/$name.parquet")
    else {
      val path = s"$sfDir/$name.parquet"
      val sig = contentSignature(java.nio.file.Paths.get(path))
      relationMemo.computeIfAbsent((spark, path, sig),
        _ => spark.read.parquet(path))
    }

  /** Register every table as a temp view named after itself (idempotent). */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach { n =>
      val df = if (n == "events") events(spark, sfDir) else load(spark, sfDir, n)
      df.createOrReplaceTempView(n)
    }

  def region(spark: SparkSession, d: String): DataFrame    = load(spark, d, "region")
  def nation(spark: SparkSession, d: String): DataFrame    = load(spark, d, "nation")
  def customer(spark: SparkSession, d: String): DataFrame  = load(spark, d, "customer")
  def supplier(spark: SparkSession, d: String): DataFrame  = load(spark, d, "supplier")
  def part(spark: SparkSession, d: String): DataFrame      = load(spark, d, "part")
  def orders(spark: SparkSession, d: String): DataFrame    = load(spark, d, "orders")
  def lineitem(spark: SparkSession, d: String): DataFrame  = load(spark, d, "lineitem")
  /** events.ts has shipped in two physical shapes across testdata
    * generations: nanosecond-precision parquet (surfaced as LongType via
    * the legacy nanosAsLong conf, which [[graft.Sessions]] still sets for
    * backward compat) and plain `timestamp[us]` (surfaced as
    * TimestampType or TimestampNTZType depending on the writer's
    * isAdjustedToUTC flag). Branch on the read schema: longs are nanos
    * and get an integral `div 1000` truncation to micros (a double
    * round-trip would lose exactness at 2^60 nanos); timestamp columns
    * pass through, NTZ normalized to session-tz TimestampType so every
    * downstream consumer sees one type. DuckDB's CAST(ts AS TIMESTAMP)
    * yields the same instants in both shapes, keeping oracles exact.
    */
  def events(spark: SparkSession, d: String): DataFrame =
    normalizeTs(load(spark, d, "events"))

  /** Normalize the `ts` column of an events frame to session-tz
    * TimestampType whatever physical shape it was read in (see
    * [[events]]). Shared by the batch loader and the streaming file
    * source ([[graft.streaming.StreamingEvents.readEventsStream]]).
    */
  def normalizeTs(raw: DataFrame): DataFrame = {
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType    => raw
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => sys.error(s"events.ts: unsupported physical type $other")
    }
  }
  def documents(spark: SparkSession, d: String): DataFrame = load(spark, d, "documents")
  def embeddings(spark: SparkSession, d: String): DataFrame = load(spark, d, "embeddings")
}
