package graft

/** Rot-guard for the Bench warm-up tag list: re-derives the set of taxed
  * expression combinations from every query's ACTUAL optimized plan and
  * fails if `SparkEntry.warmupQueries` stops covering one — e.g. a new
  * gate introduces a HOF/generator/UDF mix no tagged representative
  * carries. Detection runs here, at test time, so Bench never pays the
  * plan-all-117-queries cost. */
class WarmupSpec extends SparkSpec {

  test("tagged warm-up queries + kernels cover every taxed shape combination") {
    // kernels cover a combo only by reproducing it EXACTLY — same
    // shape-feature subset — so swapping a gate for a kernel cannot
    // silently lose a shape
    val kernelCombos = Warmup.kernelFrames(spark).flatMap { case (_, df) =>
      val shape = df.queryExecution.optimizedPlan.toString.toLowerCase
      if (SparkEntry.taxedMarkers.exists(shape.contains))
        Some(SparkEntry.shapeFeatures.filter(shape.contains).mkString("|"))
      else None
    }.toSet
    val combos = scala.collection.mutable.Map.empty[String, String]
    val covered = scala.collection.mutable.Set.empty[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val shape = fn(spark, sf001).queryExecution.optimizedPlan
          .toString.toLowerCase
        if (SparkEntry.taxedMarkers.exists(shape.contains)) {
          val combo = SparkEntry.shapeFeatures.filter(shape.contains)
            .mkString("|")
          combos.getOrElseUpdate(combo, name)
          if (SparkEntry.warmupQueries.contains(name)) covered += combo
        }
      } catch { case _: Throwable => () } // construction failures have their own specs
    }
    val missing = combos.keySet -- covered -- kernelCombos
    assert(missing.isEmpty,
      s"taxed combos with no tagged warm-up representative or kernel (add " +
        s"one to SparkEntry.warmupQueries or Warmup.kernelFrames): " +
        missing.map(c => s"'$c' (e.g. ${combos(c)})").mkString("; "))
    // and every tag must still name a real query
    val unknown = SparkEntry.warmupQueries.filterNot(SparkEntry.queries.contains)
    assert(unknown.isEmpty, s"warmupQueries names unknown queries: $unknown")
  }
}
