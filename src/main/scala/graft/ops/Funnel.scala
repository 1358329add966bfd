package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-event analytics over the events stream: funnel conversion
  * (the earliest strictly-ordered walk through a stage sequence per
  * user) and cohort retention (activity offsets against each user's
  * first-seen period).
  *
  * Both reduce the event log to per-user aggregates BEFORE any join:
  * every shuffle is keyed on user_id (or the small cohort grid), no
  * window ever sorts the raw log, and event payloads (props, values)
  * are pruned at the scan. Timestamps stay in their raw epoch-ns
  * integer form end to end — exact arithmetic, no timezone surface.
  */
object Funnel {

  /** Earliest strictly-increasing walk through `stages` per user:
    * stage i+1 counts only when its event is strictly AFTER the
    * user's stage-i time (the funnel semantics — a purchase logged
    * before the first view is a different journey, not a conversion),
    * and — when `maxGap` is set — within `maxGap` time units of it
    * (the conversion-deadline variant: a purchase a month after the
    * click is organic, not attributed). The walk stays anchored at
    * the EARLIEST stage times (strict-funnel policy: a later
    * re-view does not open a fresh window — that's a new journey,
    * [[graft.streaming.EventStreams.funnelStream]]'s restart models
    * it). Output: (userCol, ts_<stage>... [null = never reached],
    * stage_reached). Nulls are monotone by construction: once a
    * stage is null every later stage is null.
    *
    * Shape: one conditional min-aggregate per stage over the
    * (user, ts, type) projection — stage i's aggregate filters on the
    * JOINED stage-(i−1) time, so each round is a groupBy + hash join
    * on user_id. The projection is hash-repartitioned on user ONCE
    * and every stage subtree hangs off that same exchange: N stages
    * replay one shuffle's files (ReusedExchange — the
    * [[graft.llm.Corpus]] `kept` pattern) instead of planning N full
    * scans of the event log, and each stage's groupBy/join is already
    * co-located on user so no further shuffle follows. No windows,
    * no ordering pass over raw events. */
  def funnel(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      stages: Seq[String],
      maxGap: Option[Long] = None,
  ): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    require(stages.distinct.size == stages.size, "stages must be distinct")
    require(maxGap.forall(_ > 0), s"maxGap must be positive, got $maxGap")
    val base = events.select(
        col(userCol).as("user"), col(tsCol).as("ts"), col(typeCol).as("et"))
      .repartition(col("user"))
    var acc = base.select(col("user")).distinct()
    var prevCol: Option[String] = None
    stages.foreach { s =>
      val c = s"ts_$s"
      val stageMin = prevCol match {
        case None =>
          base.filter(col("et") === s)
            .groupBy(col("user")).agg(min(col("ts")).as(c))
        case Some(p) =>
          val within = maxGap match {
            case Some(g) => col("ts") > col(p) && col("ts") <= col(p) + g
            case None => col("ts") > col(p)
          }
          base.filter(col("et") === s)
            .join(acc.select(col("user"), col(p)), Seq("user"))
            .filter(within)
            .groupBy(col("user")).agg(min(col("ts")).as(c))
      }
      acc = acc.join(stageMin, Seq("user"), "left")
      prevCol = Some(c)
    }
    val reached = stages
      .map(s => when(col(s"ts_$s").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    acc
      .withColumn("stage_reached", reached)
      .withColumnRenamed("user", userCol)
  }

  /** Event-type TRANSITION MATRIX (path analysis / first-order Markov
    * counts): for each user's event sequence in time order, count
    * every adjacent (from_type → to_type) step, aggregated over all
    * users. The "what do users do next" table that funnels are the
    * directed special case of.
    *
    * Shape: one `lead` window per user (partitioned — never global),
    * then a groupBy on the tiny type×type key space with map-side
    * partial agg. The caller supplies the tie column making
    * (tsCol, tieCol) a total order per user — same determinism rule
    * as every catalog query. */
  def transitionMatrix(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      typeCol: String,
      tieCol: String,
  ): DataFrame = {
    val w = Window.partitionBy(col("user")).orderBy(col("tsv"), col("tie"))
    events
      .select(col(userCol).as("user"), col(tsCol).as("tsv"),
        col(tieCol).as("tie"), col(typeCol).as("et"))
      .withColumn("next_et", lead(col("et"), 1).over(w))
      .filter(col("next_et").isNotNull)
      .groupBy(col("et").as("from_type"), col("next_et").as("to_type"))
      .agg(count(lit(1)).as("transitions"))
  }

  /** Cohort retention: users cohort by the PERIOD of their first
    * event (integer division of the epoch-ns timestamp by
    * `periodNs`); each later active period counts them at offset
    * (period − cohort). Output: (cohort_period, offset,
    * active_users) — the retention triangle. offset 0 row = cohort
    * size.
    *
    * Shape: first-seen is one min-aggregate on user; actives dedup
    * to (user, period) BEFORE the cohort join (the log may hold
    * thousands of events per user-day — the join input is bounded by
    * users × active periods); the final count groups the tiny
    * (cohort, offset) grid. All integer arithmetic. */
  def retentionCohorts(
      events: DataFrame,
      userCol: String,
      tsCol: String,
      periodNs: Long,
  ): DataFrame = {
    require(periodNs > 0, s"periodNs must be positive, got $periodNs")
    // integral `div`, NOT `/`: epoch-ns values sit far above 2^53, so
    // a double division would round the period for recent timestamps
    val pe = events
      .select(col(userCol).as("user"), col(tsCol).cast("long").as("tsl"))
      .select(col("user"), expr(s"tsl div ${periodNs}L").as("period"))
    val firsts = pe.groupBy(col("user"))
      .agg(min(col("period")).as("cohort_period"))
    val actives = pe.distinct()
    actives
      .join(firsts, Seq("user"))
      .select(col("user"), col("cohort_period"),
        (col("period") - col("cohort_period")).as("offset"))
      .groupBy(col("cohort_period"), col("offset"))
      .agg(countDistinct(col("user")).as("active_users"))
  }
}
