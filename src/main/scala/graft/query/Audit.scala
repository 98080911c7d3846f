package graft.query

import graft.jexl.{JexlParser, LuceneParser, Node, CompareOp}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query auditing — the reference's audit-before-execute contract
  * (QueryExecutorBean.java:704-740): every query logic declares an
  * audit type; for anything other than NONE the query is audited
  * BEFORE execution with the selectors extracted from it, and an audit
  * failure fails the query (QUERY_AUDITING_ERROR), not just a log line.
  *
  * Selector extraction mirrors DatawaveSelectorExtractor.java:22-52:
  * parse as JEXL, fall back to LUCENE, then collect the literal values
  * of the POSITIVE equality nodes (an equality under an odd number of
  * negations is not a selector). SplitSelectorExtractor's
  * separator-splitting variant is [[splitSelectors]].
  */
object Audit {

  /** Auditor.AuditType: NONE skips auditing entirely; PASSIVE audits
    * best-effort (an auditor failure is swallowed and the query still
    * runs); ACTIVE and LOCALONLY must succeed before the query runs
    * (the transport differs in the reference; the library-level
    * contract — audit-or-fail before execution — is the same, so they
    * share [[audited]]'s fail-closed behavior here). */
  sealed abstract class AuditType(val name: String)
  case object None_ extends AuditType("NONE")
  case object Passive extends AuditType("PASSIVE")
  case object Active extends AuditType("ACTIVE")
  case object LocalOnly extends AuditType("LOCALONLY")

  final case class AuditRecord(auditId: String, user: String, query: String,
                               syntax: String, logicName: String,
                               auditType: String, selectors: Seq[String],
                               timeMillis: Long)

  trait Auditor { def audit(rec: AuditRecord): Unit }

  /** Collecting auditor (the test/local analog of the reference's audit
    * service): thread-safe append, queryable as a DataFrame — the audit
    * TABLE every deployment keeps. */
  final class CollectingAuditor extends Auditor {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[AuditRecord]()
    override def audit(rec: AuditRecord): Unit = buf.add(rec)
    def records: Seq[AuditRecord] = {
      import scala.jdk.CollectionConverters._
      buf.iterator().asScala.toSeq
    }
    def toDF(spark: SparkSession): DataFrame = {
      import spark.implicits._
      records.toDF()
    }
  }

  /** Positive-equality selector extraction. Returns literal values in
    * query order; unparseable queries yield no selectors (the reference
    * logs and returns an empty list rather than failing the audit). */
  def extractSelectors(query: String, syntax: String = "JEXL"): Seq[String] = {
    // exactly the reference's order — JEXL first, LUCENE on parse
    // failure — REGARDLESS of the declared syntax
    // (DatawaveSelectorExtractor.java:28-35 ignores the syntax marker),
    // so a LUCENE-marked query that is actually JEXL still yields its
    // selectors
    def tryParse(asLucene: Boolean): Option[Node] =
      try Some(if (asLucene) LuceneParser.parse(query)
               else JexlParser.parse(query))
      catch { case _: Exception => None }
    val parsed = tryParse(asLucene = false).orElse(tryParse(asLucene = true))
    parsed.map(collectEq(_, negated = false)).getOrElse(Seq.empty)
  }

  private def collectEq(n: Node, negated: Boolean): Seq[String] = n match {
    case Node.FieldOp(_, CompareOp.Eq, lit) if !negated => Seq(lit.raw)
    case Node.FieldOp(_, CompareOp.Ne, lit) if negated => Seq(lit.raw)
    case Node.And(cs) => cs.flatMap(collectEq(_, negated))
    case Node.Or(cs) => cs.flatMap(collectEq(_, negated))
    case Node.Not(c) => collectEq(c, !negated)
    case _ => Seq.empty
  }

  /** SplitSelectorExtractor.java:19-40: each extracted selector is a
    * separator-joined list (UID batches etc.); split and flatten. */
  def splitSelectors(selectors: Seq[String], separator: Char): Seq[String] =
    selectors.flatMap(_.split(separator).toSeq.map(_.trim).filter(_.nonEmpty))

  /** Audit-before-execute: for [[None_]] run the body directly; for
    * every other type build the record (auditId defaults to the query
    * id) and audit FIRST. An auditor exception propagates — and the
    * query never runs — for ACTIVE/LOCALONLY; PASSIVE is best-effort:
    * the failure is swallowed and execution proceeds. */
  def audited[A](auditor: Auditor, auditType: AuditType, queryId: String,
                 user: String, query: String, syntax: String,
                 logicName: String, timeMillis: Long,
                 selectors: Option[Seq[String]] = None)(body: => A): A = {
    if (auditType != None_) {
      try auditor.audit(AuditRecord(queryId, user, query, syntax, logicName,
        auditType.name,
        selectors.getOrElse(extractSelectors(query, syntax)), timeMillis))
      catch { case _: Exception if auditType == Passive => () }
    }
    body
  }
}
