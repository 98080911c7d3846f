package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Query prediction — the reference's `/{logicName}/predict` endpoint
  * (QueryExecutorBean.java:990-1054): validate the query, build a metric
  * for it, and ask a pluggable `QueryPredictor` for a set of named
  * predictions WITHOUT executing the query. The reference's predictor is
  * an SPI over its query-metric history (QueryPredictor.java:13-15,
  * NoOpQueryPredictor); this analog ships two predictors:
  *
  *  - [[PlanStatsPredictor]] — Spark-native: Catalyst's optimized-plan
  *    statistics (`df.queryExecution.optimizedPlan.stats`) give a size
  *    estimate (and a row estimate when the plan shape determines one)
  *    for free, with zero jobs run. This is the "what would this cost"
  *    answer a scheduler wants before admitting a query at 100 TB.
  *  - [[HistoryPredictor]] — the reference's shape: predict a new query's
  *    result count / latency from the recorded [[QueryMetrics]] of past
  *    non-error queries (mean over history, like a regression predictor
  *    with one feature). Deterministic given a deterministic history.
  *
  * A deployment with no predictor configured answers `hasResults=false`
  * (NoOpQueryPredictor) — [[predict]] with an empty predictor list.
  */
object Predict {

  /** One named prediction (the BaseQueryMetric.Prediction analog). */
  final case class Prediction(name: String, value: Double)

  trait QueryPredictor {
    /** Predict for a PLANNED but unexecuted query frame. */
    def predict(df: DataFrame): Seq[Prediction]
  }

  /** Catalyst plan-statistics predictor: `PLAN_SIZE_BYTES` always;
    * `PLAN_ROWS` when the optimized plan carries a row-count estimate
    * (exact-count stats, a LIMIT, or CBO column stats). */
  final class PlanStatsPredictor extends QueryPredictor {
    override def predict(df: DataFrame): Seq[Prediction] = {
      val st = df.queryExecution.optimizedPlan.stats
      Prediction("PLAN_SIZE_BYTES", st.sizeInBytes.toDouble) +:
        st.rowCount.toSeq.map(r => Prediction("PLAN_ROWS", r.toDouble))
    }
  }

  /** History predictor over the query-metric store: the mean result
    * count and elapsed time of past NON-ERROR queries, plus the sample
    * size the prediction rests on. Empty history → no predictions (the
    * reference's "hasResults false"). */
  final class HistoryPredictor(history: () => Seq[QueryMetric])
      extends QueryPredictor {
    override def predict(df: DataFrame): Seq[Prediction] = {
      val ok = history().filterNot(_.error)
      if (ok.isEmpty) Seq.empty
      else Seq(
        Prediction("PREDICTED_ROWS", ok.map(_.resultRows).sum.toDouble / ok.size),
        Prediction("PREDICTED_ELAPSED_MILLIS",
          ok.map(_.elapsedMillis).sum.toDouble / ok.size),
        Prediction("HISTORY_SAMPLES", ok.size.toDouble))
    }
  }

  /** Run every configured predictor over the planned frame; an empty
    * predictor list yields no predictions (NoOp deployment). */
  def predict(df: DataFrame, predictors: Seq[QueryPredictor]): Seq[Prediction] =
    predictors.flatMap(_.predict(df))

  /** Predictions as a DataFrame (for gates / the metrics-table shape). */
  def toDF(spark: SparkSession, preds: Seq[Prediction]): DataFrame = {
    import spark.implicits._
    preds.toDF()
  }
}
