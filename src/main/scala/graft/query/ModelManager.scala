package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}
import scala.collection.mutable.ArrayBuffer
import graft.jexl.PolicyException

/** One field mapping of a named query model — the relational row behind
  * the reference's ModelKeyParser keys (model rows live in the metadata
  * table; colf = `modelName[\x00attribute]`): FORWARD rows expand a
  * query alias to physical fields (1→N), REVERSE rows rename result
  * fields for display. [[graft.jexl.QueryModelLoader]] consumes exactly
  * this shape at query time. */
final case class ModelMapping(model_name: String, alias: String,
                              field: String, direction: String,
                              visibility: String = "")

object ModelStore {
  /** Column families the shared metadata table reserves for its own
    * record kinds — a model may not take these names, and table scans
    * never report them as models (ModelBean.java:91
    * RESERVED_COLF_VALUES). */
  val Reserved: Set[String] =
    Set("e", "i", "ri", "f", "tf", "m", "desc", "edge", "t", "n", "h")

  val Directions: Set[String] = Set("FORWARD", "REVERSE")

  /** Typed verb outcomes → the reference's HTTP statuses. */
  sealed trait ModelError { def status: Int; def msg: String }
  /** 412 — import/clone target already exists; delete it first
    * (ModelBean.importModel → PreConditionFailedException). */
  final case class AlreadyExists(name: String) extends ModelError {
    val status = 412
    val msg = s"model '$name' already exists; delete it first"
  }
  /** 404 — named model has no mappings (ModelBean.getModel/deleteModel
    * → NotFoundException). */
  final case class NotFound(name: String) extends ModelError {
    val status = 404; val msg = s"model '$name' not found"
  }
  /** 400 — malformed or reserved input. */
  final case class Rejected(msg: String) extends ModelError {
    val status = 400
  }
}

/** Model management with ModelBean semantics (ModelBean.java:124-478:
  * list / get / import / clone / delete / insert / delete-mapping) over
  * a LAKE-backed model table instead of metadata-table mutations.
  *
  * Storage: the full mapping set rewrites as one tiny versioned parquet
  * table per mutation (`dir/v<N>` + an atomically-replaced `CURRENT`
  * pointer — the same write-new-then-swap-pointer commit shape lake
  * formats use), because a model is curated configuration (hundreds of
  * rows, the reference caps its batch writer at ~10 MB), not data
  * volume. Readers resolve `CURRENT` and read one immutable directory;
  * a crash mid-write leaves the pointer on the previous version.
  * Mutations are driver-side on the cached row set — no Spark job per
  * admin verb except the one-partition persist write.
  */
final class ModelStore(dir: String, maxEntries: Int = 10000) {
  import ModelStore._

  private val rows = ArrayBuffer.empty[ModelMapping]

  /** Name matching is CASE-INSENSITIVE everywhere in this store, because
    * [[graft.jexl.QueryModelLoader]] resolves `model=NAME` with
    * `upper(model_name)` — if 'TPCH' and 'tpch' could coexist here, a
    * query would silently merge both models' mappings at plan time. The
    * store therefore enforces one spelling per name: lookups/uniqueness
    * ignore case, and mutations canonicalize to the stored spelling. */
  private def sameName(a: String, b: String): Boolean = a.equalsIgnoreCase(b)
  /** The stored spelling of `name`, if any mappings exist under it. */
  private def storedSpelling(name: String): Option[String] =
    rows.collectFirst { case m if sameName(m.model_name, name) => m.model_name }
  private var loaded = false
  private var version = 0L

  private def currentFile = java.nio.file.Paths.get(dir, "CURRENT")

  private def ensureLoaded(spark: SparkSession): Unit =
    if (!loaded) {
      if (java.nio.file.Files.exists(currentFile)) {
        val v = new String(java.nio.file.Files.readAllBytes(currentFile),
          java.nio.charset.StandardCharsets.UTF_8).trim
        val collected = spark.read.parquet(s"$dir/v$v")
          .select("model_name", "alias", "field", "direction", "visibility")
          .limit(maxEntries + 1).collect()
        if (collected.length > maxEntries)
          throw new PolicyException(
            s"model store exceeds $maxEntries mappings — refusing to load")
        rows ++= collected.map(r => ModelMapping(r.getString(0),
          r.getString(1), r.getString(2), r.getString(3), r.getString(4)))
        version = v.toLong
      }
      loaded = true
    }

  /** Commit the in-memory rows as the next table version: write the new
    * immutable directory FIRST, then swap the pointer (atomic move), so
    * readers only ever see a fully-written version. */
  private def persist(spark: SparkSession): Unit = {
    import spark.implicits._
    val next = version + 1
    spark.createDataset(rows.toList).toDF().coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/v$next")
    val tmp = java.nio.file.Paths.get(dir, s".CURRENT.$next")
    java.nio.file.Files.write(tmp, next.toString.getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    java.nio.file.Files.move(tmp, currentFile,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    // prior version is unreachable once the pointer moved on
    if (version > 0) graft.core.Fs.deleteRecursively(s"$dir/v$version")
    version = next
  }

  /** Model names present in the table, reserved record kinds excluded
    * (ModelBean.listModelNames). */
  def listNames(spark: SparkSession): Seq[String] = synchronized {
    ensureLoaded(spark)
    rows.map(_.model_name).distinct.filterNot(Reserved.contains).sorted.toSeq
  }

  /** All mappings of `name`; Left(NotFound) when none exist
    * (ModelBean.getModel returns 404 for an empty scan). */
  def getModel(spark: SparkSession,
               name: String): Either[ModelError, Seq[ModelMapping]] =
    synchronized {
      ensureLoaded(spark)
      val ms = rows.filter(m => sameName(m.model_name, name)).toSeq
      if (ms.isEmpty) Left(NotFound(name)) else Right(ms)
    }

  /** Create a NEW model (ModelBean.importModel): the name must not
    * exist (412) and must not be a reserved record kind. */
  def importModel(spark: SparkSession, name: String,
                  ms: Seq[ModelMapping]): Either[ModelError, Unit] =
    synchronized {
      ensureLoaded(spark)
      validate(name, ms) match {
        case Some(err) => Left(err)
        case None if rows.exists(m => sameName(m.model_name, name)) =>
          Left(AlreadyExists(name))
        case None =>
          rows ++= ms.map(_.copy(model_name = name))
          persist(spark)
          Right(())
      }
    }

  /** Copy `name`'s mappings under `newName` (ModelBean.cloneModel =
    * getModel + rename + importModel, with both verbs' failure modes). */
  def cloneModel(spark: SparkSession, name: String,
                 newName: String): Either[ModelError, Unit] = synchronized {
    getModel(spark, name).flatMap(ms => importModel(spark, newName, ms))
  }

  /** Drop the whole model (ModelBean.deleteModel): 404 when absent. */
  def deleteModel(spark: SparkSession,
                  name: String): Either[ModelError, Unit] = synchronized {
    ensureLoaded(spark)
    if (!rows.exists(m => sameName(m.model_name, name))) Left(NotFound(name))
    else {
      rows.filterInPlace(m => !sameName(m.model_name, name))
      persist(spark)
      Right(())
    }
  }

  /** Add mappings to an existing (or new) model — the reference's
    * `/Model/insert` writes mutations without an existence
    * precondition. Duplicate rows collapse. */
  def insertMappings(spark: SparkSession, name: String,
                     ms: Seq[ModelMapping]): Either[ModelError, Unit] =
    synchronized {
      ensureLoaded(spark)
      validate(name, ms) match {
        case Some(err) => Left(err)
        case None =>
          // inserts under 'tpch' land under an existing 'TPCH' spelling
          val canonical = storedSpelling(name).getOrElse(name)
          val add = ms.map(_.copy(model_name = canonical))
            .filterNot(rows.contains)
          if (add.nonEmpty) { rows ++= add; persist(spark) }
          Right(())
      }
    }

  /** Remove exactly the given mappings (`/Model/delete` form). */
  def deleteMappings(spark: SparkSession, name: String,
                     ms: Seq[ModelMapping]): Either[ModelError, Unit] =
    synchronized {
      ensureLoaded(spark)
      val canonical = storedSpelling(name).getOrElse(name)
      val drop = ms.map(_.copy(model_name = canonical)).toSet
      if (drop.exists(rows.contains)) {
        rows.filterInPlace(!drop.contains(_))
        persist(spark)
      }
      Right(())
    }

  /** The model table as a frame — what [[graft.jexl.QueryModelLoader]]
    * loads from at query time (the reference's metadata-table scan). */
  def table(spark: SparkSession): DataFrame = synchronized {
    ensureLoaded(spark)
    import spark.implicits._
    spark.createDataset(rows.toList).toDF()
  }

  private def validate(name: String,
                       ms: Seq[ModelMapping]): Option[ModelError] =
    if (name.isEmpty) Some(Rejected("model name must be non-empty"))
    else if (Reserved.contains(name.toLowerCase))
      Some(Rejected(s"'$name' is a reserved record kind"))
    else if (rows.size + ms.size > maxEntries)
      Some(Rejected(s"model store would exceed $maxEntries mappings"))
    else ms.collectFirst {
      case m if !Directions.contains(m.direction) =>
        Rejected(s"direction must be FORWARD or REVERSE, got '${m.direction}'")
      case m if m.alias.isEmpty || m.field.isEmpty =>
        Rejected("alias and field must be non-empty")
    }
}
