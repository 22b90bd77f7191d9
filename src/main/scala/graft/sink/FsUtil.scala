package graft.sink

import java.nio.file.{Files, Path}
import java.util.Comparator

import scala.jdk.CollectionConverters._

/** Shared filesystem helpers for the local-directory sinks (UpsertSink,
  * Compactor) — one implementation of the delete/list primitives so a
  * fix (stream closing, symlink handling, retries) lands everywhere.
  */
private[sink] object FsUtil {

  def deleteRecursively(p: Path): Unit =
    if (Files.exists(p)) {
      val s = Files.walk(p)
      // sorted() drains the walk before the first delete, so removing
      // entries during iteration cannot invalidate the stream
      try s.sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
      finally s.close()
    }

  /** Immediate children of `dir` (closed stream). */
  def listDir(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try s.iterator().asScala.toSeq finally s.close()
  }

  /** All paths under `p` (closed stream), mapped through `f`. */
  def walk[A](p: Path)(f: Iterator[Path] => A): A = {
    val s = Files.walk(p)
    try f(s.iterator().asScala) finally s.close()
  }
}
