package graft.sink

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.UUID

import org.apache.spark.sql.SparkSession

import FsUtil.{deleteRecursively, listDir, walk}

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
  * Hive-partitioned layouts (`col=value` subdirectories, e.g.
  * ShardSink's `shard_id=N/`) are compacted PER LEAF PARTITION: each
  * leaf directory holds plain parquet whose rows never mention the
  * partition column, so rewriting leaves in place preserves the
  * layout, the partition column, and its inferred type exactly —
  * flattening through a top-level `spark.read` would silently fold the
  * partition column into the data files and drop the directories.
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
    * Partitioned layouts compact leaf-by-leaf (layout preserved).
    * Returns (filesBefore, filesAfter). Row content is preserved
    * exactly; file layout is the only thing that changes.
    */
  def compact(spark: SparkSession, dir: String,
              targetBytes: Long = 128L * 1024 * 1024): (Int, Int) = {
    val target = Paths.get(dir)
    recover(target)
    val partitions = partitionDirs(target)
    if (partitions.nonEmpty) {
      val results = partitions.map(p => compactLeaf(spark, p, targetBytes))
      (results.map(_._1).sum, results.map(_._2).sum)
    } else compactLeaf(spark, target, targetBytes)
  }

  /** Leaf directories of a (possibly nested) `col=value` partition
    * tree; empty when `dir` is itself an unpartitioned leaf.
    */
  private val residueRe = """^(.+)\.(old|tmp)-[^.]*$""".r

  private def partitionDirs(dir: Path): Seq[Path] = {
    val children = listDir(dir).filter { p =>
      val n = p.getFileName.toString
      // swap residue also contains '=' (e.g. shard_id=3.old-uuid) and
      // must never be read as a live partition
      Files.isDirectory(p) && n.contains("=") && residueRe.findFirstIn(n).isEmpty
    }
    children.flatMap { c =>
      val nested = partitionDirs(c)
      if (nested.nonEmpty) nested else Seq(c)
    }
  }

  private def compactLeaf(spark: SparkSession, target: Path,
                          targetBytes: Long): (Int, Int) = {
    val parquetFiles: Seq[Path] = walk(target)(
      _.filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toSeq)
    val before = parquetFiles.size
    val bytes = parquetFiles.map(Files.size).sum
    val parts = math.max(1L, (bytes + targetBytes - 1) / targetBytes).toInt

    // The write to tmp reads the (untouched) source lazily; no cache is
    // needed — the source is only moved after the tmp write completes.
    val df = spark.read.parquet(target.toString).repartition(parts)
    val tmp = target.resolveSibling(s"${target.getFileName}.tmp-${UUID.randomUUID()}")
    df.write.mode("overwrite").parquet(tmp.toString)
    val old = target.resolveSibling(s"${target.getFileName}.old-${UUID.randomUUID()}")
    Files.move(target, old)
    Files.move(tmp, target, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursively(old)

    val after = walk(target)(
      _.count(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)))
    (before, after)
  }

  /** Crash recovery for the two-move swap. A compaction that died
    * mid-swap leaves the table intact under `<name>.old-*` with the
    * live path absent — move it back. Leftover `.tmp-*` (died before
    * the swap) and `.old-*` beside a live table (died before cleanup)
    * are deleted: both are complete, superseded copies. Applied to the
    * table root and to every partition leaf.
    */
  def recover(target: Path): Unit = {
    recoverOne(target)
    if (Files.isDirectory(target)) {
      // a leaf stranded mid-swap is ABSENT — find it via its residue
      // dirs rather than via the (missing) live path
      val strandedBases = walk(target)(_.collect {
        case p if Files.isDirectory(p) =>
          residueRe.findFirstMatchIn(p.getFileName.toString)
            .map(m => p.resolveSibling(m.group(1)))
      }.flatten.toSeq).distinct
      strandedBases.foreach(recoverOne)
      partitionDirs(target).foreach(recoverOne)
    }
  }

  private def recoverOne(target: Path): Unit = {
    val parent = target.toAbsolutePath.getParent
    val name = target.getFileName.toString
    if (parent == null || !Files.isDirectory(parent)) return
    val siblings = listDir(parent)
    siblings.filter(_.getFileName.toString.startsWith(s"$name.tmp-"))
      .foreach(deleteRecursively)
    val olds = siblings.filter(_.getFileName.toString.startsWith(s"$name.old-"))
    if (Files.exists(target)) olds.foreach(deleteRecursively)
    else olds.headOption.foreach(o => Files.move(o, target))
  }
}
