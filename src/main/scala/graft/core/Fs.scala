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

  /** Crash-safe directory swap for offline compaction: replace `src`
    * with the fully-written `tmp` using RENAMES only, so no crash
    * window leaves the table absent. Order: `src` → `src.old` (rename),
    * `tmp` → `src` (rename), delete `src.old`. A crash before the
    * first rename leaves `src` intact (stale `tmp` is overwritten by
    * the next compaction); between the renames [[recoverSwap]] restores
    * from `src.old`; after the second rename only the redundant
    * `src.old` survives, deleted on the next access. */
  def swapDir(src: String, tmp: String): Unit = {
    import java.nio.file.{Files, Paths}
    val old = src + ".old"
    deleteRecursively(old)
    Files.move(Paths.get(src), Paths.get(old))
    Files.move(Paths.get(tmp), Paths.get(src))
    deleteRecursively(old)
  }

  /** Raw recursive copy (bytes + structure, no re-encode): the safe way
    * to carry a directory whose contents may be PARTIAL (a crashed
    * write with no readable footers would fail a Spark read-rewrite,
    * and a re-encode would forge a `_SUCCESS` the original never
    * earned). */
  def copyRecursively(src: String, dst: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val s = Paths.get(src)
    Files.walk(s).iterator().asScala.foreach { p =>
      val t = Paths.get(dst).resolve(s.relativize(p))
      if (Files.isDirectory(p)) Files.createDirectories(t)
      else { Files.createDirectories(t.getParent); Files.copy(p, t) }
    }
  }

  /** ONE commit-proof rule for every parquet-dir store (BatchStore
    * batches, MetadataStats generations, CachedResults row stores): a
    * directory write counts as committed only with the committer's
    * `_SUCCESS` marker. Keeping the probe here means a future change to
    * the rule (committer variants, marker-disabled deployments) lands
    * in one place. Callers that have a SparkSession should prefer
    * [[committedUnder]], which honors a marker-disabled committer conf. */
  def committed(dir: String): Boolean =
    java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))

  /** Whether THIS session's parquet writes produce `_SUCCESS` markers
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs`, default true).
    * Read from the conf, never inferred from directory state — a store
    * whose early batches carry markers must not pin a later
    * markers-disabled deployment to "everything unproven" forever. */
  def markersEnabled(spark: org.apache.spark.sql.SparkSession): Boolean =
    spark.sparkContext.hadoopConfiguration.getBoolean(
      "mapreduce.fileoutputcommitter.marksuccessfuljobs", true)

  /** [[committed]] under the session's committer conf: with markers
    * enabled the `_SUCCESS` rule applies verbatim; a marker-disabled
    * deployment never writes one, so requiring it would read every
    * store as permanently absent — there the probe degrades to
    * "directory holds at least one data file" (no partial-write
    * protection: the documented tradeoff of running marker-less). One
    * rule for EVERY Fs.committed consumer, so the conf cannot wedge one
    * store while its siblings degrade gracefully. */
  def committedUnder(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Boolean =
    if (markersEnabled(spark)) committed(dir)
    else {
      val p = java.nio.file.Paths.get(dir)
      if (!java.nio.file.Files.isDirectory(p)) false
      else {
        val s = java.nio.file.Files.list(p)
        try s.anyMatch { f =>
          val n = f.getFileName.toString
          !n.startsWith("_") && !n.startsWith(".")
        } finally s.close()
      }
    }

  /** Recovery entry for [[swapDir]], called by readers/appenders before
    * touching `src`: if a crash hit between the two renames (`src`
    * missing, `src.old` present) the old generation is restored —
    * readers never observe a missing table; a completed-but-uncleaned
    * swap (`src` present, `src.old` leftover) just drops the leftover.
    * Stale `*.compacting` temps are also cleared so a retried
    * compaction starts clean. */
  def recoverSwap(src: String): Unit = {
    import java.nio.file.{Files, Paths}
    val old = src + ".old"
    if (!Files.exists(Paths.get(src)) && Files.exists(Paths.get(old)))
      Files.move(Paths.get(old), Paths.get(src))
    else deleteRecursively(old)
    deleteRecursively(src + ".compacting")
  }
}
