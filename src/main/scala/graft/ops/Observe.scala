package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Observation}
import org.apache.spark.sql.functions._

/** In-flight pipeline observability — the reference logs its record
  * counts around every stage (/root/reference/lambda.py's
  * processed-rows logging); at Spark scale the WRONG way to get those
  * numbers is extra `.count()` actions (each one re-runs the plan).
  * `observe` attaches a CollectMetrics node instead: the metrics
  * accumulate ON the rows the job was already computing — zero extra
  * pass, zero plan change for the data itself — and surface after the
  * action (batch: [[Observation]]) or per micro-batch (streaming:
  * `StreamingQueryProgress.observedMetrics`, exercised by the spec).
  *
  * Metrics must be aggregates Spark can merge per task (the
  * CollectMetrics contract); the counters here are sums/counts —
  * order-free, so the observed numbers are exact and deterministic,
  * not samples. */
object Observe {

  /** Row count + per-column null counts, the load-health staple:
    * `rows`, and `nulls_<col>` for each named column. Attach at any
    * pipeline seam; results are unchanged. */
  def withCounters(
      df: DataFrame,
      observation: Observation,
      cols: Seq[String] = Nil,
  ): DataFrame = {
    val metrics: Seq[Column] = count(lit(1)).as("rows") +:
      cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.observe(observation, metrics.head, metrics.tail: _*)
  }

  /** Named-expression form for streaming (an [[Observation]] cannot
    * be reused across restarts; a plain name can): metrics read from
    * each progress event. */
  def withCountersNamed(
      df: DataFrame,
      name: String,
      cols: Seq[String] = Nil,
  ): DataFrame = {
    val metrics: Seq[Column] = count(lit(1)).as("rows") +:
      cols.map(c =>
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    df.observe(name, metrics.head, metrics.tail: _*)
  }

  /** Run `action` on the observed frame and return (result, metrics).
    * The metrics map carries `rows` plus the requested null counters
    * — read them without a second job. */
  def counted[T](
      df: DataFrame,
      cols: Seq[String] = Nil,
  )(action: DataFrame => T): (T, Map[String, Any]) = {
    val obs = Observation()
    val out = action(withCounters(df, obs, cols))
    (out, obs.get)
  }

  /** [[withCountersNamed]] generalized with caller CONTRACT counters
    * (r14): any named mergeable aggregate rides along — e.g.
    * `"neg_qty" -> sum(when(col("qty") < 0, 1L).otherwise(0L))` — so
    * a validation pipeline observes its violation counts on the same
    * pass that emits the survivors. Extras are attached in sorted
    * name order (deterministic metric row schema). */
  def withQualityMetrics(
      df: DataFrame,
      name: String,
      nullCols: Seq[String] = Nil,
      extras: Map[String, Column] = Map.empty,
  ): DataFrame = {
    val reserved = Set("rows") ++ nullCols.map("nulls_" + _)
    val clash = extras.keySet.intersect(reserved)
    require(clash.isEmpty,
      s"extras keys collide with generated metric names: ${clash.toSeq.sorted.mkString(", ")} " +
        "(the observed row would carry duplicate fields and metrics() would drop one)")
    val nulls = nullCols.map(c =>
      sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"nulls_$c"))
    val ex = extras.toSeq.sortBy(_._1).map { case (n, c) => c.as(n) }
    val all = (count(lit(1)).as("rows") +: nulls) ++ ex
    df.observe(name, all.head, all.tail: _*)
  }

  /** Batch reader for the NAMED form (r14): the observed metric rows
    * of a completed action on `df` — metric-set name → (metric name →
    * value). The metrics belong to the EXECUTED frame: collect a
    * derived frame and its own QueryExecution carries them, not the
    * parent's (spec-pinned gotcha). Before any action the row is a
    * zero/null placeholder. */
  def metrics(df: DataFrame): Map[String, Map[String, Any]] =
    df.queryExecution.observedMetrics.map { case (name, row) =>
      name -> row.schema.fieldNames.zip(row.toSeq).toMap
    }
}
