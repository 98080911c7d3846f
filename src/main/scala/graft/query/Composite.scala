package graft.query

import org.apache.spark.sql.DataFrame

/** CompositeQueryLogic (core/query CompositeQueryLogic.java:7-13): one
  * query fanned out to multiple delegate logics whose result streams
  * merge into a single response. The reference requires every delegate
  * to produce the same response type, sorts delegates by configured
  * name, and — in sequential mode — terminates after the first delegate
  * that returns results.
  *
  * Spark shape: delegates are DataFrames (each its own declarative
  * plan); parallel mode is a `unionAll` — Catalyst schedules the legs
  * concurrently and nothing materializes on the driver. Sequential mode
  * is driver-side control flow by design (the reference's short-circuit
  * is inherently ordered), probing emptiness with a limit-1 job per leg
  * until the first hit.
  */
object Composite {

  /** Parallel mode: merge all delegates' results. Delegates are
    * name-sorted first (CompositeQueryLogic.java:10-11) so the composite
    * is deterministic regardless of registration order; a response-shape
    * mismatch fails fast like the reference's initialize. */
  def union(delegates: Seq[(String, DataFrame)]): DataFrame = {
    require(delegates.nonEmpty, "composite needs at least one delegate")
    val sorted = delegates.sortBy(_._1)
    val first = sorted.head._2
    for ((name, df) <- sorted.tail)
      require(df.schema == first.schema,
        s"delegate '$name' response shape differs from '${sorted.head._1}'")
    sorted.map(_._2).reduce(_ unionAll _)
  }

  /** Sequential mode: delegates run in name order; the FIRST one that
    * yields results ends execution (CompositeQueryLogic.java:10-11).
    * Later delegates are never planned into a job — the probe is a
    * limit-1 action per leg until a hit. Empty everywhere → an empty
    * frame of the shared shape. */
  def firstNonEmpty(delegates: Seq[(String, DataFrame)]): DataFrame = {
    require(delegates.nonEmpty, "composite needs at least one delegate")
    val sorted = delegates.sortBy(_._1)
    sorted.collectFirst { case (_, df) if !df.isEmpty => df }
      .getOrElse(sorted.head._2.limit(0))
  }
}
