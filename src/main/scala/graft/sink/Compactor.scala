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
  * guessed partition count — then swaps via write-new-then-two-moves
  * (same discipline as UpsertSink).
  *
  * Consistency contract (plain parquet directories have no manifest, so
  * this is the strongest a filesystem swap can give): readers never
  * observe HALF-compacted data — they see the old files, the new files,
  * or a brief window between the two moves where the path is absent and
  * a listing fails loudly (retry the read). A crash inside that window
  * leaves the table intact under a `.old-*` sibling; the next
  * [[compact]] (or an explicit [[recover]]) restores it before doing
  * anything else. Tables needing a zero-window swap belong in a
  * manifest-based format, not a bare directory.
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
    recover(target)
    val parquetFiles: Seq[Path] = walk(target)(
      _.filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toSeq)
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

    val after = walk(target)(
      _.count(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)))
    (before, after)
  }

  /** Crash recovery for the two-move swap. A compaction that died
    * mid-swap leaves the table intact under `<name>.old-*` with the
    * live path absent — move it back. Leftover `.tmp-*` (died before
    * the swap) and `.old-*` beside a live table (died before cleanup)
    * are deleted: both are complete, superseded copies.
    */
  def recover(target: Path): Unit = {
    val parent = target.toAbsolutePath.getParent
    val name = target.getFileName.toString
    if (parent == null || !Files.isDirectory(parent)) return
    val siblings = {
      val s = Files.list(parent)
      try s.iterator().asScala.toSeq finally s.close()
    }
    siblings.filter(_.getFileName.toString.startsWith(s"$name.tmp-"))
      .foreach(deleteRecursively)
    val olds = siblings.filter(_.getFileName.toString.startsWith(s"$name.old-"))
    if (Files.exists(target)) olds.foreach(deleteRecursively)
    else olds.headOption.foreach(o => Files.move(o, target))
  }

  private def walk[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(p)
    try f(s.iterator().asScala) finally s.close()
  }

  private def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      try s.sorted(Comparator.reverseOrder[Path]()).iterator().asScala
        .foreach(f => Files.delete(f))
      finally s.close()
    }
}
