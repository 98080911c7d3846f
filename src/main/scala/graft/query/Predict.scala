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
    /** Logic-aware variant — the reference's predictor receives the
      * query (and so its logic) being predicted (QueryPredictor.java:
      * 13-15 takes the BaseQueryMetric under prediction). Predictors
      * that don't condition on the logic inherit the plain form. */
    def predict(df: DataFrame, logicName: String): Seq[Prediction] =
      predict(df)
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
    * reference's "hasResults false").
    *
    * The logic-aware form CONDITIONS on the logic being predicted —
    * the reference's predictor receives the metric of the query under
    * prediction, so an edge query is never priced off event-query
    * history. A logic with no history of its own predicts nothing
    * (honest ignorance beats a cross-logic mean). */
  final class HistoryPredictor(history: () => Seq[QueryMetric])
      extends QueryPredictor {
    private def over(ok: Seq[QueryMetric]): Seq[Prediction] =
      if (ok.isEmpty) Seq.empty
      else Seq(
        Prediction("PREDICTED_ROWS", ok.map(_.resultRows).sum.toDouble / ok.size),
        Prediction("PREDICTED_ELAPSED_MILLIS",
          ok.map(_.elapsedMillis).sum.toDouble / ok.size),
        Prediction("HISTORY_SAMPLES", ok.size.toDouble))
    override def predict(df: DataFrame): Seq[Prediction] =
      over(history().filterNot(_.error))
    override def predict(df: DataFrame, logicName: String): Seq[Prediction] =
      if (logicName.isEmpty) predict(df)
      else over(history().filterNot(_.error).filter(_.logicName == logicName))
  }

  /** Run every configured predictor over the planned frame; an empty
    * predictor list yields no predictions (NoOp deployment). */
  def predict(df: DataFrame, predictors: Seq[QueryPredictor]): Seq[Prediction] =
    predictors.flatMap(_.predict(df))

  /** Logic-aware form: the logic name flows to every predictor. */
  def predict(df: DataFrame, logicName: String,
              predictors: Seq[QueryPredictor]): Seq[Prediction] =
    predictors.flatMap(_.predict(df, logicName))

  /** Predictions as a DataFrame (for gates / the metrics-table shape). */
  def toDF(spark: SparkSession, preds: Seq[Prediction]): DataFrame = {
    import spark.implicits._
    preds.toDF()
  }
}
