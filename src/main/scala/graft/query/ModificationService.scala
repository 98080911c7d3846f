package graft.query

import org.apache.spark.sql.DataFrame
import graft.ingest.Modifications
import graft.ingest.Modifications.{FieldEdit, PutField, DeleteField, UpdateField}

object ModificationRegistry {
  /** One registered modification service — the reference's
    * ModificationServiceConfiguration as surfaced by
    * `/Modification/listConfigurations` (ModificationService.java:58-70:
    * name, request class, description, authorized roles). Services that
    * maintain a HISTORY trail enforce the mutable-field list; "no
    * history" services treat all fields as mutable
    * (MutableMetadataHandler.java:341-344). */
  final case class ServiceConfig(name: String, description: String,
                                 requestClass: String,
                                 authorizedRoles: Seq[String],
                                 insertHistory: Boolean = true)

  /** Typed submit failure → the reference's HTTP statuses. */
  final class ModificationException(val status: Int, msg: String)
      extends RuntimeException(msg)
}

/** Mutable-field cache (ModificationCache.java:48-112): which fields of
  * which datatype a history-keeping modification service may touch —
  * the reference scans the metadata table's `m` records (row = field
  * name, colq = datatype) into a datatype→fields map and atomically
  * replaces the map on reload. `load` supplies the (datatype, field)
  * pairs — curated configuration, bounded like a model. */
final class MutableFieldCache(load: () => Seq[(String, String)]) {
  @volatile private var cache: Map[String, Set[String]] = build()

  private def build(): Map[String, Set[String]] =
    load().groupBy(_._1).map { case (dt, fs) => dt -> fs.map(_._2).toSet }

  /** Re-scan and atomically swap (reloadMutableFieldCache). */
  def reload(): Unit = { cache = build() }

  /** Absent datatype = nothing mutable (the reference's null-map guard,
    * MutableMetadataHandler.isFieldMutable:965-971). */
  def isFieldMutable(datatype: String, field: String): Boolean =
    cache.getOrElse(datatype, Set.empty).contains(field)

  def mutableFieldList: Map[String, Set[String]] = cache
}

/** The Modification service dispatch tier
  * (ModificationService.java:82-130 submit): resolve the named service
  * configuration, validate the request class, check the caller holds at
  * least one authorized role (401 otherwise), enforce per-field
  * mutability for history-keeping services, then apply the edits
  * through [[graft.ingest.Modifications.applyEdits]] — the
  * MutableMetadataHandler process step. */
final class ModificationRegistry(
    configs: Seq[ModificationRegistry.ServiceConfig],
    val cache: MutableFieldCache) {
  import ModificationRegistry._

  def listConfigurations: Seq[ServiceConfig] = configs

  /** Validate + apply; returns the edited long frame. The caller owns
    * rebinding/writing the result (the reference's batch writer commits
    * to the shard table). */
  def submit(long: DataFrame, serviceName: String, requestClass: String,
             userRoles: Set[String], edits: Seq[FieldEdit],
             user: String, timeMillis: Long): DataFrame = {
    val cfg = configs.find(_.name == serviceName).getOrElse(
      throw new ModificationException(404,
        s"unknown modification service '$serviceName'"))
    if (requestClass != cfg.requestClass)
      throw new ModificationException(400,
        s"Requires: ${cfg.requestClass} but got $requestClass")
    if (cfg.authorizedRoles.nonEmpty &&
        !cfg.authorizedRoles.exists(userRoles.contains))
      throw new ModificationException(401,
        s"Requires one of: ${cfg.authorizedRoles.mkString(", ")}")
    if (cfg.insertHistory) edits.foreach { e =>
      val (dt, f) = e match {
        case p: PutField => (p.datatype, p.field)
        case d: DeleteField => (d.datatype, d.field)
        case u: UpdateField => (u.datatype, u.field)
      }
      if (!cache.isFieldMutable(dt, f))
        throw new ModificationException(400, s"Field $f is not mutable")
    }
    Modifications.applyEdits(long, edits, insertHistory = cfg.insertHistory,
      user = user, timeMillis = timeMillis)
  }
}
