package graft

import java.nio.file.{Files, Path}

/** Directory listings that CLOSE their underlying `DirectoryStream`.
  *
  * `java.nio.file.Files.list/walk` hold an open directory file
  * descriptor until `.close()` — consuming the iterator does NOT
  * release it, only GC finalization eventually does. The engine lists
  * changelog/snapshot dirs on EVERY epoch publication (frontier reads,
  * the background-compaction interval check), so unclosed streams
  * accumulate file descriptors far faster than GC reclaims them and a
  * long single-JVM run (the full test suite, a long-lived server)
  * exhausts the process fd limit. Every listing goes through here.
  */
object FsList {

  /** Immediate children of `dir`, stream closed before returning. */
  def list(dir: Path): Seq[Path] = {
    val s = Files.list(dir)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }

  /** Recursive walk of `root` (depth-first pre-order), stream closed. */
  def walk(root: Path): Seq[Path] = {
    val s = Files.walk(root)
    try {
      import scala.jdk.CollectionConverters._
      s.iterator().asScala.toSeq
    } finally s.close()
  }
}
