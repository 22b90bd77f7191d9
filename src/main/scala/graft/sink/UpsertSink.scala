package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.transform.Ops

/** K1/K2 — the reference's storage layer re-expressed for an engine
  * whose tables live as Parquet (offline: no Postgres at test time).
  *
  * Two upsert strategies (SURVEY §2.2 K2):
  *  (a) [[upsertParquet]] — key-preferring latest-wins overwrite for
  *      engine-managed tables: read existing ∪ incoming, keep the
  *      incoming row per unique key, rewrite atomically (temp dir +
  *      directory swap — §7.5.4's "write-new-then-swap"; no
  *      transactional store offline).
  *  (b) [[upsertSql]] — the PostgreSQL `INSERT … ON CONFLICT` statement
  *      generator (storage.py:230-297 semantics: DO UPDATE SET every
  *      non-key column from EXCLUDED, falling back to DO NOTHING when
  *      only key columns exist), for use with a real JDBC sink.
  *
  * Scale notes: (a) rewrites the table — correct for the reference's
  * dimension-sized tables (hundreds to thousands of rows); at 100 TB
  * the same latest-wins plan applies per partition (the union +
  * window shuffles once on the unique keys) and you'd overwrite only
  * affected partitions (partitionBy on the key prefix) or use a
  * transactional table format. The dedup itself is the W1 argmax —
  * one shuffle, no skew on real unique keys.
  */
object UpsertSink {

  /** Strategy (a): latest-wins upsert into a Parquet directory.
    * Incoming rows beat existing rows on the same key; ties inside a
    * single batch resolve by `tieBreak` (defaults to arbitrary-but-
    * deterministic: all non-key columns desc).
    */
  def upsertParquet(
      spark: SparkSession,
      dir: String,
      incoming: DataFrame,
      keys: Seq[String],
      partitionBy: Seq[String] = Nil): Unit = {
    require(keys.nonEmpty, "upsert needs unique key columns")
    val target = Paths.get(dir)
    val merged =
      if (Files.exists(target)) {
        val existing = spark.read.parquet(dir)
        val all = existing.withColumn("__pri", lit(0))
          .unionByName(incoming.withColumn("__pri", lit(1)), allowMissingColumns = true)
        val tieBreak = all.columns.filterNot(keys.contains).filterNot(_ == "__pri")
          .map(c => col(c).desc_nulls_last).toSeq
        all
          .transform(Ops.latestPerGroup(keys, col("__pri").desc +: tieBreak))
          .drop("__pri")
      } else {
        val tieBreak = incoming.columns.filterNot(keys.contains)
          .map(c => col(c).desc_nulls_last).toSeq
        incoming.transform(Ops.latestPerGroup(keys,
          if (tieBreak.isEmpty) Seq(lit(1).asc) else tieBreak))
      }
    writeAtomic(merged, target, partitionBy)
  }

  /** Write-new-then-swap (§7.5.4): materialize to a sibling temp dir,
    * then swap directories so readers never observe a half-written
    * table. (Two renames — not a transaction, but the window is a
    * metadata op, not a data write.)
    */
  private def writeAtomic(df: DataFrame, target: Path,
                          partitionBy: Seq[String] = Nil): Unit = {
    val tmp = target.resolveSibling(s"${target.getFileName}.tmp-${UUID.randomUUID()}")
    // materialize fully before touching the target (the source may read
    // the target itself)
    df.cache().count()
    try {
      val writer = df.write.mode("overwrite")
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(tmp.toString)
      val old = target.resolveSibling(s"${target.getFileName}.old-${UUID.randomUUID()}")
      val existed = Files.exists(target)
      if (existed) Files.move(target, old)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      if (existed) deleteRecursively(old)
    } finally df.unpersist()
  }

  private def deleteRecursively(p: Path): Unit = FsUtil.deleteRecursively(p)

  /** Strategy (b): PostgreSQL upsert statement generator
    * (storage.py:265-287). Every non-key column updates from EXCLUDED;
    * with nothing to update the conflict is ignored.
    */
  def upsertSql(table: String, columns: Seq[String], uniqueCols: Seq[String]): String = {
    require(uniqueCols.nonEmpty && uniqueCols.forall(columns.contains),
      "unique columns must be a subset of columns")
    val collist = columns.mkString(", ")
    val placeholders = columns.map(_ => "?").mkString(", ")
    val updatable = columns.filterNot(uniqueCols.contains)
    val conflict =
      if (updatable.isEmpty) "DO NOTHING"
      else "DO UPDATE SET " + updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table ($collist) VALUES ($placeholders) " +
      s"ON CONFLICT (${uniqueCols.mkString(", ")}) $conflict"
  }

  /** K1 — JDBC append with the reference's batching (storage.py:211-218:
    * chunksize 1000, multi-row inserts → Spark `batchsize`). Untestable
    * offline (no database in the container); exercised only through its
    * option set.
    */
  def jdbcAppendOptions(batchSize: Int = 1000): Map[String, String] =
    Map("batchsize" -> batchSize.toString, "isolationLevel" -> "READ_COMMITTED")

  def jdbcAppend(df: DataFrame, url: String, table: String,
                 properties: java.util.Properties,
                 batchSize: Int = 1000): Unit = {
    jdbcAppendOptions(batchSize).foreach { case (k, v) => properties.setProperty(k, v) }
    df.write.mode("append").jdbc(url, table, properties)
  }
}
