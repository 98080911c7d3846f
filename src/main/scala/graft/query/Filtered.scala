package graft.query

import org.apache.spark.sql.DataFrame
import graft.vis.Visibility

/** FilteredQueryLogic (core/query logic/filtered/FilteredQueryLogic.java:23-76):
  * a wrapper that executes its delegate query logic only when a
  * configured filter accepts the query settings and the caller's
  * authorizations; a filtered-out logic does nothing and returns no
  * results. Deployments use these to fan one composite query across
  * logics that only apply to certain user populations (by auth) or only
  * when the caller opted in (by parameter).
  *
  * Spark shape: the delegate is call-by-name — a filtered-out delegate
  * never runs a job; only its schema is resolved to produce the empty
  * response frame (the reference likewise skips initialize and returns
  * an empty iterator).
  */
object Filtered {

  /** FilteredQueryLogic.QueryLogicFilter (FilteredQueryLogic.java:47-49).
    * `authChain` is the proxied authorization chain: the user's auth set
    * first, then one entry per proxying entity. */
  trait QueryLogicFilter {
    def canRunQuery(params: Map[String, String], authChain: Seq[Set[String]]): Boolean
  }

  /** QueryLogicFilterByAuth.java:17-60 over ProxiedAuthorizationsPredicate
    * .java:40-53: the visibility expression must be satisfied by the auth
    * chain. matchFirst (MatchType.FIRST) accepts as soon as the first
    * entry — presumably the user — passes; the default (MatchType.ALL)
    * requires the user AND every proxy to pass. Any entry failing before
    * a FIRST short-circuit rejects. `negated` flips the decision. */
  final case class ByAuth(visibility: String, matchFirst: Boolean = false,
      negated: Boolean = false) extends QueryLogicFilter {
    def canRunQuery(params: Map[String, String], authChain: Seq[Set[String]]): Boolean = {
      var matched = true
      val it = authChain.iterator
      var done = false
      while (!done && it.hasNext) {
        if (Visibility.isVisible(visibility, it.next())) {
          if (matchFirst) done = true
        } else { matched = false; done = true }
      }
      if (negated) !matched else matched
    }
  }

  /** QueryLogicFilterByParameter.java:15-60 over QueryParameterPredicate
    * .java:31-43: pass when the named query parameter equals the
    * configured value; with no value configured the parameter is treated
    * as a boolean (Boolean.valueOf — case-insensitive "true", absent =
    * false). `negated` flips the decision. */
  final case class ByParameter(parameter: String, value: Option[String] = None,
      negated: Boolean = false) extends QueryLogicFilter {
    def canRunQuery(params: Map[String, String], authChain: Seq[Set[String]]): Boolean = {
      val pv = params.get(parameter)
      val matched = value match {
        case Some(v) => pv.contains(v)
        case None    => pv.exists(_.equalsIgnoreCase("true"))
      }
      if (negated) !matched else matched
    }
  }

  /** Run `delegate` if `filter` passes, else an empty frame of the
    * delegate's shape (FilteredQueryLogic.java:50-76: a filtered logic
    * "will do nothing and return no results"). */
  def query(filter: QueryLogicFilter, params: Map[String, String],
      authChain: Seq[Set[String]])(delegate: => DataFrame): DataFrame = {
    val df = delegate
    if (filter.canRunQuery(params, authChain)) df else df.limit(0)
  }
}
