package graft.core

/** Tiny filesystem helpers shared by gates and services. */
object Fs {

  /** Delete a directory tree (children before parents; missing entries
    * tolerated — a concurrent cleanup is not an error). */
  def deleteRecursively(dir: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(dir)) {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }

  def deleteRecursively(dir: String): Unit =
    deleteRecursively(java.nio.file.Paths.get(dir))
}
