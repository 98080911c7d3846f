package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** k-NN JOIN: every vector's top-k neighbours — exact broadcast kernel
  * vs the single-probe exact search, and the cell-bucketed scale path's
  * contracts (dedupe across shared cells, rank bounds, recall floor). */
class KnnJoinSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = {
    val rows = (0L until 50L).map { i =>
      val lobe = if (i % 2 == 0) 1.0f else -1.0f
      val v = (0 until 8).map(dd =>
        lobe * (1.0f + 0.02f * ((i * 5 + dd * 3) % 7)) +
          (if (dd % 2 == 0) 0.15f else -0.15f) * ((i % 4).toFloat))
      (i, v.toArray)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("exact knn join row i equals the single-probe exact top-k for i") {
    val emb = corpus.cache()
    val joined = VectorOps.knnJoinExact(emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .groupBy(_._1)
    assert(joined.size == 50 && joined.values.forall(_.length == 5))
    Seq(0L, 7L, 23L).foreach { p =>
      val single = VectorOps.bruteForceTopK(emb, p, 5)
        .orderBy("rank").select("vec_id").collect().map(_.getLong(0)).toSeq
      val mine = joined(p).sortBy(_._3).map(_._2).toSeq
      assert(mine == single, s"probe $p: $mine vs $single")
    }
    // no self-pairs, ranks are 1..k
    joined.values.flatten.foreach { case (v, nb, r) =>
      assert(v != nb && r >= 1 && r <= 5)
    }
  }

  test("cell knn join: no duplicate pairs across shared cells, ranks bounded, recall floor") {
    val emb = corpus.cache()
    val cell = VectorOps.knnJoinCell(emb, k = 5, nCells = 4, nAssign = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val byVec = cell.groupBy(_._1)
    // at most k rows per vector, pair-distinct, ranks 1..count contiguous
    byVec.foreach { case (v, rows) =>
      assert(rows.length <= 5)
      assert(rows.map(_._2).distinct.length == rows.length, s"dup nb for $v")
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // the two-lobe corpus clusters hard: cell recall ≥ 0.6 vs exact
    val exact = VectorOps.knnJoinExact(emb, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val hits = cell.map(t => (t._1, t._2)).count(exact.contains)
    assert(hits.toDouble / exact.size >= 0.6,
      s"recall ${hits.toDouble / exact.size}")
  }
}
