package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.{Comparator, UUID}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Small-file compaction — the table-maintenance operator every
  * long-lived warehouse needs: streaming sinks, incremental appends,
  * and over-parallel writes fragment a table into thousands of tiny
  * parquet files, and each file costs a task + a footer read + an open
  * per scan (at 100 TB, a 10^6-file table spends more time scheduling
  * than scanning). Compaction rewrites the directory into
  * ~`targetBytes` files, sized from the MEASURED input bytes — never a
  * guessed partition count — and swaps atomically (write-new-then-swap,
  * same discipline as UpsertSink) so concurrent readers never observe a
  * half-compacted table.
  *
  * Reference anchor: the reference's parquet export writes one pandas
  * frame per dataset (storage.py:336-382) and never fragments; the
  * operator exists for the engine's own incremental/streaming outputs.
  */
object Compactor {

  /** Rewrite the parquet table at `dir` into files of ~`targetBytes`.
    * Returns (filesBefore, filesAfter). Row content is preserved
    * exactly; file layout is the only thing that changes.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val target = Paths.get(dir)
    val parquetFiles: Seq[Path] = Files.walk(target).iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
      .toSeq
    val before = parquetFiles.size
    val bytes = parquetFiles.map(Files.size).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    val df = spark.read.parquet(dir).repartition(parts)
    // materialize before touching the source we are about to replace
    df.cache().count()
    try {
      val tmp = target.resolveSibling(s"${target.getFileName}.tmp-${UUID.randomUUID()}")
      df.write.mode("overwrite").parquet(tmp.toString)
      val old = target.resolveSibling(s"${target.getFileName}.old-${UUID.randomUUID()}")
      Files.move(target, old)
      Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
      deleteRecursively(old)
    } finally df.unpersist()

    val after = Files.walk(target).iterator().asScala
      .count(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p))
    (before, after)
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]())
        .forEach(f => Files.delete(f))
}
