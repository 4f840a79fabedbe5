package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import Decimals._

/** Event-stream analytics in batch form — the same logical plans
  * `graft.streaming.EventStreams` runs incrementally with Structured
  * Streaming (tumbling windows + watermark, gap-based sessionization
  * with state). Keeping a batch twin gives the driver's oracle a way to
  * check the semantics.
  */
object EventOps {

  /** q50: tumbling 1-hour window aggregation (the reference's trace
    * time-series summaries). Window start as epoch-µs so output is
    * timezone-tag-free. */
  def hourlyWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum6(col("value")).as("sum_value"))
      .orderBy("hour_us", "event_type")

  /** q51: gap-based sessionization (30-min inactivity gap) per user:
    * lag → new-session flag → running session counter → per-session
    * aggregates. One shuffle on user_id shared by both window passes. */
  def sessionize(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val cum = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
      .withColumn("new_sess",
        when(col("prev_ts").isNull ||
          unix_seconds(col("ts")) - unix_seconds(col("prev_ts")) > gapSeconds, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum(col("new_sess")).over(cum))
      .groupBy("user_id", "session_id")
      .agg(
        count(lit(1)).as("n_events"),
        unix_seconds(min(col("ts"))).as("t_start_s"),
        unix_seconds(max(col("ts"))).as("t_end_s"),
        (unix_seconds(max(col("ts"))) - unix_seconds(min(col("ts")))).as("duration_s"),
        sum6(col("value")).as("sum_value"))
      .orderBy("user_id", "session_id")
  }

  /** q130 funnel horizon: each step must follow the previous within
    * this many seconds — shared with the oracle SQL. */
  val FunnelHorizonS: Long = 7L * 24 * 3600

  /** the q130 step sequence (first-touch semantics per step). */
  val FunnelSteps: Seq[String] = Seq("view", "click", "purchase")

  /** q130: ORDERED FUNNEL — the classic product-analytics view the
    * event surface lacked (q51 sessionizes, q50 windows; nothing
    * answered "how many users progress view → click → purchase, and
    * where do they fall out"): per step, the users whose FIRST
    * qualifying chain reaches it — step i's timestamp is the MINIMUM
    * ts of that type STRICTLY AFTER the user's step-i−1 time and
    * within [[FunnelHorizonS]] of it (first-touch attribution; the
    * deterministic min-chain makes the whole funnel hash-exact, no
    * floats, no sampling). Output: step index/name, users reaching
    * it, conversion from the previous step and from the top, in bp.
    *
    * Scale shape: ONE map-side conditional aggregate per step, each a
    * groupBy(user_id) with the predicate riding the aggregate
    * (min(CASE ...)), chained by user-keyed equi-joins — per-user
    * state is ONE timestamp per step, never a collected event list
    * (a bot user with 10⁹ events costs the aggregate combiner, not
    * memory); the final rollup is step-dimension-sized. Timestamps
    * never ship (the TIMESTAMP parity gotcha) — only counts do. */
  /** the per-step per-user reach frames the funnel family shares:
    * frame i holds (user_id, t(i+1)) for users whose first-touch chain
    * reaches step i+1 — one map-side min per step chained by user-keyed
    * equi-joins. */
  private def funnelDepthFrames(events: DataFrame,
                                steps: Seq[String] = FunnelSteps,
                                horizonS: Long = FunnelHorizonS): Seq[DataFrame] = {
    require(steps.nonEmpty, "a funnel needs at least one step")
    require(horizonS > 0, s"horizonS must be positive, got $horizonS")
    val horizonUs = horizonS * 1000000L
    // step 1: first step-type event per user; step i: the MIN step-i
    // timestamp strictly after t(i−1) and within the horizon — each
    // depth is the previous frame plus one user-keyed join + one
    // map-side min. The N-step generalization IS the implementation
    // shape: a deployment declares its own step list; the 3-step
    // [[FunnelSteps]] literal stays the inventory entry.
    // NOT checkpointed (r19 A/B): materializing each frame traded the
    // re-derived event scans for 3 eager checkpoint jobs and measured
    // ~0.15s SLOWER per funnel query at the bench SF (alternating A/B,
    // 3 rounds) — the re-derivation is cheaper than the materialization
    // at this frame count; revisit only if the step list grows deep
    val s1 = events.filter(col("event_type") === steps.head)
      .groupBy("user_id").agg(min(unix_micros(col("ts"))).as("t1"))
    steps.zipWithIndex.drop(1)
      .scanLeft(s1) { case (acc, (step, i)) =>
        events.filter(col("event_type") === step)
          .select(col("user_id"), unix_micros(col("ts")).as("__t"))
          .join(acc, Seq("user_id"))
          .filter(col("__t") > col(s"t$i") && col("__t") <= col(s"t$i") + horizonUs)
          .groupBy("user_id").agg(min(col("__t")).as(s"t${i + 1}"))
      }
  }

  /** q130b: FUNNEL USER MANIFEST — the per-user half of q130 (the card
    * says HOW MANY users stall at each step; this says WHICH users and
    * WHEN — the remarketing audience list / attribution input, and the
    * frame the streaming door ([[graft.streaming.EventStreams
    * .funnelMonitor]]) is spec-proven against): per user reaching step
    * 1, the first-touch chain timestamps t1/t2/t3 (µs, null past the
    * stall) and the depth reached. Same reach frames as q130 — the
    * card is exactly this manifest's histogram. Scale: the q130 chain
    * plus two user-keyed LEFT joins; per-user output is the contract
    * (audience lists are consumed per-user). */
  def funnelUsers(events: DataFrame, steps: Seq[String] = FunnelSteps,
                  horizonS: Long = FunnelHorizonS): DataFrame = {
    val frames = funnelDepthFrames(events, steps, horizonS)
    val joined = frames.drop(1)
      .foldLeft(frames.head)((acc, f) => acc.join(f, Seq("user_id"), "left"))
    val n = steps.length
    val depth =
      if (n == 1) lit(1)
      else (n - 1 to 2 by -1)
        .foldLeft(when(col(s"t$n").isNotNull, n)) { (acc, i) =>
          acc.when(col(s"t$i").isNotNull, i)
        }.otherwise(1)
    joined
      .select(col("user_id") +:
        (1 to n).map(i => col(s"t$i").as(s"t${i}_us")) :+
        depth.as("depth"): _*)
      .orderBy("user_id")
  }

  def funnel(events: DataFrame, steps: Seq[String] = FunnelSteps,
             horizonS: Long = FunnelHorizonS): DataFrame = {
    val depths = funnelDepthFrames(events, steps, horizonS)
    val reach = depths.zipWithIndex.map { case (frame, i) =>
      frame.agg(count(lit(1)).as("n"))
        .select(lit(i + 1).as("step_idx"),
          lit(steps(i)).as("step"), col("n").as("n_users"))
    }.reduce(_ unionByName _)
    val top = reach.filter(col("step_idx") === 1)
      .select(col("n_users").as("n_top"))
    reach
      // an unpartitioned Window, PROVABLY BOUNDED (the q103b
      // residual-window discipline): `reach` has exactly |steps| rows —
      // one per funnel step, each an agg of its depth frame — so the
      // single window task sees ≤4 rows at ANY corpus size. The
      // WindowExec "no partition defined" warning this emits is about
      // data-sized frames; this frame's size is fixed by the funnel
      // definition, not the data. (r17: the executed-plan inventory —
      // BenchPlans / PLANS_r17 flagged_window_unpartitioned — counts
      // FOUR such windows suite-wide, each on a fixed-bound frame:
      // this one, q111/q112's ≤32-row post-limit rank frames, and
      // q119b's ≤4096-row bucket-offset dimension; the earlier "exactly
      // one" claim was a single-line grep that missed line-wrapped
      // Window.orderBy sites — the inventory, not the grep, is now the
      // invariant's ruler)
      .withColumn("prev_users",
        lag(col("n_users"), 1).over(
          org.apache.spark.sql.expressions.Window.orderBy("step_idx")))
      .crossJoin(broadcast(top))
      .withColumn("conv_prev_bp",
        expr("coalesce((10000 * n_users) DIV nullif(prev_users, 0), 10000)"))
      .withColumn("conv_top_bp",
        expr("(10000 * n_users) DIV nullif(n_top, 0)"))
      .select("step_idx", "step", "n_users", "conv_prev_bp", "conv_top_bp")
      .orderBy("step_idx")
  }

  /** q132 burst bar: an hour is a burst when its count exceeds this
    * many per-mille of the type's mean hourly rate (2000 = 2×). */
  val BurstThresholdPm = 2000L

  /** q132: RATE-BURST REPORT — the operational rate monitor beside
    * q53's value-outlier fence (q53 asks "which VALUES are
    * implausible"; this asks "which HOURS are" — ingestion storms,
    * retry loops, scraper bursts): per (event_type, hour), the count
    * against the type's mean hourly rate over its OBSERVED hours, in
    * integer per-mille (ratio_pm = 1000·n·hours_observed ÷ total —
    * the mean never materializes as a fraction, the q116 multiply-
    * through rule), bursts = hours above [[BurstThresholdPm]]. Only
    * burst hours ship — the report is incident-sized.
    *
    * Scale shape: ONE map-side (type, hour) count; the per-type
    * baseline reduces the hour frame (timeline-sized, not
    * corpus-sized) and broadcasts back onto it; no window, no
    * corpus-sized join. */
  def rateBursts(events: DataFrame): DataFrame = {
    val hourly = events.groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n"))
    val base = hourly.groupBy("event_type")
      .agg(count(lit(1)).as("hours_observed"), sum(col("n")).as("total_n"))
    hourly.join(broadcast(base), Seq("event_type"))
      .withColumn("ratio_pm",
        expr("(1000 * n * hours_observed) DIV total_n"))
      .filter(col("ratio_pm") > BurstThresholdPm)
      .select("event_type", "hour_us", "n", "hours_observed", "total_n", "ratio_pm")
      .orderBy("event_type", "hour_us")
  }

  /** the q132 baseline as a FROZEN bounded model for the streaming
    * door ([[graft.streaming.EventStreams.rateBurstMonitor]]): per
    * event type its observed-hour count and total events over the
    * reference window. Collects — legal under the bounded-model
    * contract: the frame is event-type-dimension-sized at any corpus
    * scale (the hour frame it reduces never leaves the cluster). */
  def rateBaseline(events: DataFrame): Seq[(String, Long, Long)] =
    events.groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n"))
      .groupBy("event_type")
      .agg(count(lit(1)).as("hours_observed"), sum(col("n")).as("total_n"))
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq

  /** q134: EVENT COVERAGE / GAP REPORT — the completeness monitor
    * beside q132's burst monitor (q132 asks "which hours are too
    * LOUD"; this asks "which hours are MISSING" — a collector outage,
    * a dropped partition, a stalled backfill all read as holes in the
    * hourly timeline): per event type, the observed span (first/last
    * hour), hours observed vs expected over the span, missing hours,
    * coverage in bp, and the LONGEST consecutive outage in hours —
    * the number an on-call actually pages on.
    *
    * Scale shape: ONE map-side (type, hour) count first reduces the
    * corpus to the timeline-sized hour frame; the lag window that
    * measures gaps runs OVER THAT FRAME (rows = types × observed
    * hours — bounded by the calendar, not the corpus: a decade is
    * ~9×10⁴ hours/type), never over raw events; the final rollup is
    * type-dimension-sized. */
  def eventGaps(events: DataFrame): DataFrame = {
    val hourUs = 3600000000L
    val hourly = events.groupBy(col("event_type"),
        unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy("event_type").orderBy("hour_us")
    hourly
      .withColumn("prev_us", lag(col("hour_us"), 1).over(w))
      .withColumn("gap_h", expr(s"(hour_us - prev_us) DIV $hourUs - 1"))
      .groupBy("event_type")
      .agg(
        min(col("hour_us")).as("first_hour_us"),
        max(col("hour_us")).as("last_hour_us"),
        count(lit(1)).as("hours_observed"),
        coalesce(max(col("gap_h")), lit(0L)).as("max_gap_hours"))
      .withColumn("hours_expected",
        expr(s"(last_hour_us - first_hour_us) DIV $hourUs + 1"))
      .withColumn("hours_missing", col("hours_expected") - col("hours_observed"))
      .withColumn("coverage_bp", expr("(10000 * hours_observed) DIV hours_expected"))
      .select("event_type", "first_hour_us", "last_hour_us", "hours_expected",
        "hours_observed", "hours_missing", "coverage_bp", "max_gap_hours")
      .orderBy("event_type")
  }

  /** q134b: TYPE-OUTAGE MANIFEST — the per-incident half of q134 (the
    * card says HOW MUCH of each type's timeline is missing; this says
    * WHICH (hour, type) cells are — the page an on-call actually
    * opens, and the frame the streaming door ([[graft.streaming
    * .EventStreams.gapMonitor]]) is spec-proven against): for every
    * hour in the corpus's global observed timeline, the expected
    * types that did NOT fire. Expected = the corpus's own type
    * dimension (the inventory entry's freeze; a deployment passes its
    * SLA list to [[typeOutages]]). The frame is the OBSERVED global
    * timeline: an hour where NO type fired at all emits no cells
    * (spec-pinned vs q134, whose per-type spans do count such hours)
    * — the same no-data-no-window contract the streaming door states;
    * q134's span/coverage card is the instrument for global silence.
    *
    * Scale shape: the corpus reduces ONCE map-side to the (type, hour)
    * frame; the outage set is the timeline-sized hour frame × the
    * type dimension minus that frame — bounded by the calendar and
    * the type count, never the corpus. */
  def typeOutageReport(events: DataFrame): DataFrame = {
    val expected = events.select("event_type").distinct()
      .collect().map(_.getString(0)).toSeq.sorted
    typeOutages(events, expected)
  }

  /** [[typeOutageReport]] with a caller-declared SLA type list. */
  def typeOutages(events: DataFrame, expectedTypes: Seq[String]): DataFrame = {
    require(expectedTypes.nonEmpty, "typeOutages needs an expected-type list")
    events
      .groupBy(unix_micros(date_trunc("hour", col("ts"))).as("hour_us"))
      .agg(collect_set(col("event_type")).as("__obs"))
      .select(col("hour_us"),
        explode(array_except(
          array(expectedTypes.map(lit): _*), col("__obs"))).as("event_type"))
      .orderBy("hour_us", "event_type")
  }

  /** the q135 edge set as a FROZEN bounded model for the streaming
    * door ([[graft.streaming.EventStreams.transitionMonitor]]): every
    * (prev, next) transition observed in the reference window.
    * Collects — legal under the bounded-model contract: the frame is
    * types²-sized at any corpus scale. */
  def transitionBaseline(events: DataFrame): Seq[(String, String)] =
    eventTransitions(events).select("prev_type", "next_type")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** q135: EVENT-TYPE TRANSITION MATRIX — the Markov view of user
    * behaviour (q130 follows ONE declared step sequence; this measures
    * ALL observed consecutive steps — the matrix a product/analytics
    * review reads to DISCOVER the funnels worth declaring, and an
    * anomaly screen reads for impossible transitions): per (prev_type,
    * next_type) over each user's ts-ordered event sequence, the
    * transition count and its share of prev_type's outgoing edges in
    * bp. First events have no predecessor and contribute no edge.
    *
    * Scale shape (r13 de-skew — the last per-user sequence op without
    * a skew story): the lag is SEGMENTED, the bucketedRunningSum
    * discipline applied to lag. Each user's sequence splits into
    * [[TransitionBucketUs]]-wide time buckets; the lag window runs per
    * (user, bucket) — a bot user holding half the corpus spreads over
    * the timeline's buckets instead of serializing through one task
    * (BenchSkew measured the user-keyed window 1.65× slower at 50%-bot
    * skew; the q51 caveat this op no longer carries). Bucket-first
    * rows stitch to the previous non-empty bucket's last event through
    * a per-user window over the BUCKET-SUMMARY frame — calendar-
    * bounded rows per user, never event-sized. Spec pins equality
    * with the plain user-keyed lag window on arbitrary data. The
    * rollup combines map-side to a (types × types)-sized matrix, and
    * the outgoing totals reduce THAT matrix (dimension-sized).
    *
    * COST KNOB, priced honestly (SKEW_r13 bot_skew rows): segmentation
    * is a fixed overhead — two extra small joins and the bucket-summary
    * window — worth ~2.4× at ZERO skew on benchmark-sized corpora
    * (sf0.1 A/B: windowed 0.52 s vs segmented 1.27 s at pm0), with
    * crossover near a ~30% hot-user share and flat immunity beyond
    * (pm500: windowed 1.30 s and degrading 2.5×, segmented 1.18 s —
    * pm500/pm0 = 0.93). Segmented is the only shipped q135 form
    * because the constant vanishes at scale — it is per-row work that
    * rides the same scan, while the windowed arm's worst case grows
    * with the hottest user's share, which is exactly what a 100 TB
    * deployment cannot bound. Deployments that KNOW their corpus is
    * small and skew-free can call [[eventTransitionsWindowed]], the
    * cheaper plain-lag form kept as the spec baseline. */
  def eventTransitions(events: DataFrame): DataFrame = {
    // the edge matrix is type²-dimension-sized, but its LINEAGE is the
    // whole segmented-lag pass — materialize once so the outgoing
    // rollup and the share join don't re-run the event windows
    val edges = transitionEdgesLazy(events).localCheckpoint()
    val outgoing = edges.groupBy("prev_type")
      .agg(sum(col("n")).as("out_n"))
    edges.join(broadcast(outgoing), Seq("prev_type"))
      .withColumn("share_bp", expr("(10000 * n) DIV out_n"))
      .select("prev_type", "next_type", "n", "share_bp")
      .orderBy("prev_type", "next_type")
  }

  /** the LAZY segmented-lag edge frame (bucket-local struct lag +
    * stitch + the (prev, next) rollup) — exposed for the plan pin now
    * that [[eventTransitions]] materializes it. */
  private[graft] def transitionEdgesLazy(events: DataFrame): DataFrame = {
    val ev = events.select(col("user_id"), col("ts"), col("event_id"),
        col("event_type"))
      .withColumn("__bkt", expr(s"unix_micros(ts) DIV $TransitionBucketUs"))
    // local lag within the (user, bucket) segment. The lag carries a
    // STRUCT, not the bare type: a bare-column lag cannot distinguish
    // "no previous row in this bucket" from "previous row with a NULL
    // event_type", and coalescing into the stitch would fabricate an
    // edge across a null-typed event where the window form emits none
    val wLocal = Window.partitionBy("user_id", "__bkt").orderBy("ts", "event_id")
    val local = ev.withColumn("__prev_row",
      lag(struct(col("event_type").as("t")), 1).over(wLocal))
    // per-(user, bucket) last event type under the SAME (ts, event_id)
    // total order — a map-side-combined max-struct election
    val lasts = ev.groupBy("user_id", "__bkt")
      .agg(max(struct(col("ts"), col("event_id"), col("event_type"))).as("__last"))
    // stitch: each non-empty bucket's previous non-empty bucket's last
    // type — a window over calendar-bounded rows per user
    val wBkt = Window.partitionBy("user_id").orderBy("__bkt")
    val stitch = lasts
      .withColumn("__stitch_prev", lag(col("__last.event_type"), 1).over(wBkt))
      .select("user_id", "__bkt", "__stitch_prev")
    local
      .join(stitch, Seq("user_id", "__bkt"), "left")
      .withColumn("prev_type",
        when(col("__prev_row").isNull, col("__stitch_prev"))
          .otherwise(col("__prev_row.t")))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
  }

  /** q135's segment width: 15-minute lag buckets — wide enough that a
    * normal user's session rarely straddles (straddles are correct,
    * just stitched), narrow enough that a timeline-spanning bot splits
    * into thousands of tasks. */
  val TransitionBucketUs: Long = 900L * 1000000L

  /** the plain user-keyed lag form of [[eventTransitions]] — the spec
    * baseline the segmented plan must equal row-for-row (and the
    * BenchSkew comparison arm), exposed as the SMALL-DEPLOYMENT
    * opt-in: ~2.4× cheaper than the segmented form below ~30% hot-user
    * share on benchmark-sized corpora, but its worst case serializes
    * the hottest user through one task (2.5× degradation at a 50%-bot
    * user, SKEW_r13) — never the default at scale. */
  def eventTransitionsWindowed(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val edges = events
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("event_type").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val outgoing = edges.groupBy("prev_type")
      .agg(sum(col("n")).as("out_n"))
    edges.join(broadcast(outgoing), Seq("prev_type"))
      .withColumn("share_bp", expr("(10000 * n) DIV out_n"))
      .select("prev_type", "next_type", "n", "share_bp")
      .orderBy("prev_type", "next_type")
  }

  /** q131: RETENTION COHORTS — the second classic the event surface
    * lacked: users cohorted by the WEEK of their first event
    * (Monday-truncated, both engines' date_trunc('week') agree), and
    * for each week-offset since the cohort week, how many distinct
    * cohort members were active (any event). Output is the cohort ×
    * offset matrix with retention in bp of the cohort size — the
    * curve a growth/ops review reads.
    *
    * Scale shape: first-event election is ONE map-side groupBy(user);
    * the activity join is user-keyed (AQE-splittable); the (cohort,
    * offset, user) distinct combines map-side; the final matrix is
    * (weeks × offsets)-sized. Dates only (the TIMESTAMP gotcha). */
  def retentionCohorts(events: DataFrame): DataFrame = {
    // one row per user — materialized once, since both the cohort-size
    // rollup and the activity join consume it (left lazy, the
    // first-event election re-scans the event stream per use)
    val firsts = events.groupBy("user_id")
      .agg(date_trunc("week", min(col("ts"))).cast("date").as("cohort_week"))
      .localCheckpoint()
    val cohortSizes = firsts.groupBy("cohort_week")
      .agg(count(lit(1)).as("n_users"))
    val active = events
      .select(col("user_id"), date_trunc("week", col("ts")).cast("date").as("w"))
      .join(firsts, Seq("user_id"))
      .select(col("cohort_week"),
        expr("CAST(datediff(w, cohort_week) DIV 7 AS BIGINT)").as("week_offset"),
        col("user_id"))
      .distinct()
      .groupBy("cohort_week", "week_offset")
      .agg(count(lit(1)).as("n_active"))
    active.join(broadcast(cohortSizes), Seq("cohort_week"))
      .withColumn("retained_bp", expr("(10000 * n_active) DIV n_users"))
      .select("cohort_week", "week_offset", "n_users", "n_active", "retained_bp")
      .orderBy("cohort_week", "week_offset")
  }

  /** q15: interval join — each purchase joined to the clicks that
    * preceded it within `gapSeconds`, per user. A naive range join is
    * quadratic per user; binning both sides into gap-width buckets
    * turns it into an EQUALITY join on (user, bin) — a click can only
    * precede a purchase in the same or the next bin, so the click side
    * is exploded to 2 bins and the exact range predicate filters the
    * small candidate set. Linear shuffle, AQE-friendly. */
  def intervalJoin(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"))
      .withColumn("bin", expr(s"p_us DIV ${gapSeconds * 1000000L}"))
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id"), unix_micros(col("ts")).as("c_us"),
        dec6(col("value")).as("c_value"))
      .withColumn("bin", explode(array(
        expr(s"c_us DIV ${gapSeconds * 1000000L}"),
        expr(s"c_us DIV ${gapSeconds * 1000000L} + 1"))))
    val candidates = purchases.join(clicks, Seq("user_id", "bin"))
      .filter(col("c_us") >= col("p_us") - lit(gapSeconds * 1000000L) &&
        col("c_us") <= col("p_us"))
    val agg = candidates.groupBy("purchase_id")
      .agg(count(lit(1)).as("n_clicks_before"),
        asScaledLong(sum(col("c_value")), 6).as("click_value_before"))
    purchases.select("purchase_id", "user_id", "p_us")
      .join(agg, Seq("purchase_id"), "left")
      .select(col("purchase_id"), col("user_id"), col("p_us"),
        coalesce(col("n_clicks_before"), lit(0L)).as("n_clicks_before"),
        col("click_value_before"))
      .orderBy("purchase_id")
  }

  /** q16: as-of join — for each purchase, the latest click at or before
    * it (unbounded lookback), per user. No join at all: one sort per
    * user and a running MAX over the marked click timestamps (MAX
    * ignores the non-click nulls) — the canonical scale shape, one
    * shuffle on user_id. */
  def asofJoin(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    events
      .withColumn("last_click_us",
        max(when(col("event_type") === "click", unix_micros(col("ts")))).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        unix_micros(col("ts")).as("p_us"), col("last_click_us"),
        expr("(unix_micros(ts) - last_click_us) DIV 1000000").as("gap_s"))
      .orderBy("purchase_id")
  }

  /** q52: the built-in session_window operator (streaming-capable; see
    * graft.streaming.EventStreams.sessionWindows for the incremental
    * twin). window.end = last event + gap by definition. */
  def sessionWindowAgg(events: DataFrame): DataFrame =
    events
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum6(col("value")).as("sum_value"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy("user_id", "session_start_us")

  /** q53: robust (Tukey-fence) outlier listing per event type — the
    * reference's quality-screen shape (flag entities whose measured
    * value is implausible, reference
    * src/neuron_morphology/validation/quality_metric.py) as a
    * distribution-aware report. Per-type quartiles reduce to 5 fence
    * rows broadcast back onto the scan, row-local compare: one pass +
    * one broadcast join, no second shuffle. Caveat for 100 TB: EXACT
    * percentile state grows with the number of DISTINCT values per
    * group (a counts-map), so on a continuous column at extreme scale
    * swap in approx_percentile or a fixed-point bucketed quantile —
    * the plan shape stays identical; exact is used here because the
    * oracle hash-compares the fences. Values emitted as fixed-point
    * µ-units; the fence arithmetic (`p75 + (p75 - p25) * 1.5`) is
    * written identically in the oracle so the doubles agree bitwise. */
  def outlierReport(events: DataFrame): DataFrame = {
    val fences = events.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.25)).as("p25"),
        percentile(col("value"), lit(0.75)).as("p75"))
      .select(col("event_type"),
        (col("p75") + (col("p75") - col("p25")) * 1.5).as("fence"))
    events.join(broadcast(fences), Seq("event_type"))
      .filter(col("value") > col("fence"))
      .select(col("event_id"), col("event_type"),
        round(col("value") * 1000000).cast(LongType).as("value_us"),
        round(col("fence") * 1000000).cast(LongType).as("fence_us"))
      .orderBy("event_id")
  }
}
