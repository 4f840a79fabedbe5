package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Decimals._

/** Structured Streaming twins of the batch event operators: the same
  * logical plans run incrementally — windowed aggregation under a
  * watermark, built-in session windows, and a custom stateful
  * sessionizer on `flatMapGroupsWithState` for semantics the built-ins
  * can't express.
  *
  * The reference's trace pipelines recompute summaries batch-per-bucket
  * (reference src/trace/...); on a live 100 TB event firehose these
  * would run as continuous queries with state in RocksDB, which is
  * exactly what these plans compile to.
  */
object EventStreams {

  /** File-source stream over a directory of events parquet. The
    * file-stream source needs a declared schema; probe it from the
    * files already present (a stream dir is seeded with at least one
    * file before the query starts) so the ts encoding — nanos-long vs
    * TIMESTAMP_NTZ, which varies across testdata generations — is
    * whatever is actually on disk, then normalize exactly like the
    * batch loader (graft.Tables.normalizeEventsTs). */
  def readEventStream(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val fileSchema =
      // NonFatal only: wrapping an OutOfMemoryError / InterruptedException
      // in IllegalArgumentException with a 'seed the dir' message would
      // mislead — fatal errors propagate unwrapped
      try spark.read.parquet(dir).schema
      catch { case scala.util.control.NonFatal(e) => throw new IllegalArgumentException(
        s"readEventStream: cannot probe the ts encoding from '$dir' — the " +
          "stream dir must be seeded with at least one parquet file before " +
          "the query starts (the schema is then fixed for the stream's " +
          s"lifetime; files with a different encoding appended later will " +
          s"mismatch). Probe failure: ${e.getMessage}", e)
      }
    graft.Tables.normalizeEventsTs(
      spark.readStream.schema(fileSchema).parquet(dir))
  }

  /** Tumbling 1-hour windows with a 2-hour watermark — the streaming
    * form of EventOps.hourlyWindowAgg. */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum6(col("value")).as("sum_value"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        col("event_type"), col("n"), col("sum_value"))

  /** q132 at the door: the rate-burst monitor over a FROZEN per-type
    * baseline ([[graft.operators.EventOps.rateBaseline]], frozen from
    * a reference window — the door twin of the batch report, which
    * derives its baseline from the same frame it audits). Live events
    * aggregate into 1-hour tumbling windows; each finished (type,
    * hour) count is judged row-locally against the frozen baseline via
    * literal maps — no post-aggregation join, so every streaming
    * output mode stays legal — with the same multiply-through
    * per-mille ratio as the batch operator.
    *
    * UNKNOWN-TYPE CONTRACT (the temperatureLookup lesson, inverted
    * for a monitor): an event type ABSENT from the frozen baseline
    * always ships, with known_type=false and a null ratio — a
    * brand-new type firing at the door is itself the anomaly the
    * monitor exists to surface, so the conservative posture here is
    * alert, never silent drop. */
  def rateBurstMonitor(events: DataFrame,
                       baseline: Seq[(String, Long, Long)],
                       thresholdPm: Long = graft.operators.EventOps.BurstThresholdPm): DataFrame = {
    require(baseline.nonEmpty, "rateBurstMonitor needs a frozen baseline")
    val hoursMap = map(baseline.flatMap { case (t, h, _) => Seq(lit(t), lit(h)) }: _*)
    val totalMap = map(baseline.flatMap { case (t, _, n) => Seq(lit(t), lit(n)) }: _*)
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("event_type"),
        unix_micros(col("window.start")).as("hour_us"), col("n"))
      .withColumn("hours_observed", element_at(hoursMap, col("event_type")))
      .withColumn("total_n", element_at(totalMap, col("event_type")))
      .withColumn("known_type", col("hours_observed").isNotNull)
      .withColumn("ratio_pm",
        expr("(1000 * n * hours_observed) DIV total_n"))
      .filter(!col("known_type") || col("ratio_pm") > thresholdPm)
      .select("event_type", "hour_us", "n", "hours_observed", "total_n",
        "ratio_pm", "known_type")
  }

  /** q134 at the door: the TYPE-OUTAGE monitor — per watermark-closed
    * hour, the expected types that did NOT fire (the q134b manifest
    * shape, live). One streaming hour aggregate collects the hour's
    * observed type set; the outage rows fall out row-locally
    * (array_except against the frozen SLA list), so append mode stays
    * legal and output is incident-sized.
    *
    * STATED CONTRACT (why this is the q134 shape and not q134 itself):
    * gap detection needs a CLOSED window — the door judges an hour
    * only once the watermark passes it. And an hour with ZERO events
    * of ANY type produces no window at all in an event-time engine
    * (no data, no trigger): the door detects PARTIAL outages (a type
    * missing while others fire) exactly; TOTAL collector silence is
    * only visible when the next event advances the watermark, and the
    * skipped hours then ship retroactively is NOT provided — a
    * wall-clock ticker source is the deployment answer there. The
    * batch q134b over the same data is the exact reconciliation. */
  def gapMonitor(events: DataFrame, expectedTypes: Seq[String]): DataFrame = {
    require(expectedTypes.nonEmpty, "gapMonitor needs an expected-type list")
    events
      .withWatermark("ts", "2 hours")
      .groupBy(window(col("ts"), "1 hour"))
      .agg(collect_set(col("event_type")).as("__obs"))
      .select(unix_micros(col("window.start")).as("hour_us"),
        explode(array_except(
          array(expectedTypes.map(lit): _*), col("__obs"))).as("event_type"))
  }

  final case class TransSt(lastType: String, lastUs: Long)
  final case class TransOut(user_id: Long, prev_type: String,
                            next_type: String, ts_us: Long, known_edge: Boolean)

  /** q135 at the door: the TRANSITION monitor — every observed
    * consecutive user step, flagged against the frozen q135 edge set
    * ([[graft.operators.EventOps.transitionBaseline]]): a (prev, next)
    * edge never seen in the reference window ships with
    * known_edge=false — the impossible-transition screen (a purchase
    * with no preceding view-ish step, a state machine violated) run
    * live instead of in the nightly matrix.
    *
    * Exactness contract (the funnelMonitor discipline): events are
    * buffered and ts-sorted WITHIN each micro-batch and assumed
    * in-order per user ACROSS batches; under in-order delivery the
    * emitted edge stream equals the batch q135 lag edges exactly
    * (spec-pinned). State is ONE (type, µs) pair per user — bounded
    * regardless of volume. Edges ship as they happen (downstream
    * filters known_edge=false for the alert feed; the full stream is
    * the matrix's increment). */
  def transitionMonitor(events: Dataset[Ev],
                        knownEdges: Seq[(String, String)]): Dataset[TransOut] = {
    import events.sparkSession.implicits._
    val known = knownEdges.toSet
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[TransSt]) => {
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          var last = state.getOption
          val out = Seq.newBuilder[TransOut]
          sorted.foreach { e =>
            val t = us(e.ts)
            last.foreach { s =>
              out += TransOut(userId, s.lastType, e.event_type, t,
                known.contains((s.lastType, e.event_type)))
            }
            last = Some(TransSt(e.event_type, t))
          }
          last.foreach(state.update)
          out.result().iterator
        })
  }

  /** Built-in gap-based session windows (30 min), streaming-capable. */
  def sessionWindows(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("session_start_us"),
        unix_micros(col("session_window.end")).as("session_end_us"),
        col("n_events"))

  /** Stream-static enrichment: the live event stream joined to a
    * broadcastable static dimension (the reference's per-resource
    * cross-bucket lookups, incremental form). Static side re-reads per
    * micro-batch, so dimension updates are picked up. */
  def enrichWithUsers(events: DataFrame, customers: DataFrame): DataFrame =
    events.join(
      broadcast(customers.select(col("c_custkey"), col("c_mktsegment"))),
      events("user_id") === col("c_custkey"), "left")
      .select(col("event_id"), col("ts"), col("event_type"),
        col("c_mktsegment").as("segment"), col("value"))

  /** Stream-stream interval join: purchases matched to the clicks that
    * preceded them within `gapSeconds`, both sides watermarked so the
    * join state is bounded (the streaming twin of EventOps.intervalJoin).
    */
  def clickToPurchaseJoin(events: DataFrame, gapSeconds: Long = 1800): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("c_ts"))
      .withWatermark("c_ts", "2 hours")
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("p_ts"))
      .withWatermark("p_ts", "2 hours")
    purchases.join(clicks,
      expr(s"c_user = p_user AND c_ts >= p_ts - INTERVAL $gapSeconds SECONDS AND c_ts <= p_ts"))
  }

  /** Streaming dedup: drop events re-sent with the same event_id while
    * the watermark allows late arrivals (exactly the ingestion-dedup a
    * firehose needs — state for one watermark's worth of ids). */
  def dedupStream(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "2 hours")
      .dropDuplicatesWithinWatermark("event_id")

  /** Streaming upsert sink: every micro-batch is MERGEd into the
    * parquet table at `path` by key (insert-or-update, optional delete
    * flag) via [[graft.operators.MergeWriter]] — the streaming form of
    * the reference's push-back step, and the standard way to keep a
    * continuously-updated serving table from a changelog stream
    * (foreachBatch + keyed merge is what a Delta streaming MERGE
    * lowers to). The checkpoint makes delivery effectively-once per
    * batch; the merge itself is idempotent under batch replay. */
  def upsertSink(updates: DataFrame, path: String, checkpoint: String,
                 key: String, deleteFlag: Option[String] = None)
      : org.apache.spark.sql.streaming.StreamingQuery =
    updates.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], _: Long) =>
        graft.operators.MergeWriter.applyTo(
          batch.sparkSession, path, batch.toDF(), key, deleteFlag)
      }
      .start()

  final case class Ev(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                      event_type: String, value: Double)
  final case class SessionOut(user_id: Long, t_start_s: Long, t_end_s: Long,
                              n_events: Long, closed: Boolean)
  final case class SessState(lastTs: Long, startTs: Long, n: Long)

  final case class FunnelSt(t1: Long, t2: Long, t3: Long)
  final case class FunnelOut(user_id: Long, depth: Int, t1_us: Option[Long],
                             t2_us: Option[Long], t3_us: Option[Long])

  /** q130b at the door: the per-user funnel tracker — live first-touch
    * chain state (t1/t2/t3 + depth) per user on flatMapGroupsWithState,
    * emitting each touched user's current position every micro-batch
    * (the audience list stays continuously current; a deployment
    * `upsertSink`s it keyed on user_id).
    *
    * Exactness contract: events are buffered and ts-sorted WITHIN each
    * micro-batch (the statefulSessionize discipline) and assumed
    * in-order per user ACROSS batches (a per-key-ordered log at the
    * door). Under in-order delivery the greedy update is EXACT — the
    * first view seen is the min view, and the first qualifying
    * click/purchase after a frozen t(i−1) is that step's min — so the
    * door state equals the batch [[graft.operators.EventOps
    * .funnelUsers]] row for every user (spec-pinned). State is three
    * longs per user, bounded regardless of event volume — a bot with
    * 10⁹ events costs sort time in its batches, never state. */
  def funnelMonitor(events: Dataset[Ev],
                    horizonS: Long = graft.operators.EventOps.FunnelHorizonS)
      : Dataset[FunnelOut] = {
    import events.sparkSession.implicits._
    val hUs = horizonS * 1000000L
    def us(t: java.sql.Timestamp): Long =
      Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[FunnelSt]) => {
          val sorted = evs.toSeq.sortBy(e => (us(e.ts), e.event_id))
          // Long.MinValue = "step not reached" — NOT 0L, which is a
          // legitimate µs timestamp (epoch 0) and must advance the
          // chain like any other. MinValue is unreachable: floorDiv
          // keeps every real ts-µs far above it.
          val Unset = Long.MinValue
          var s = state.getOption.getOrElse(FunnelSt(Unset, Unset, Unset))
          sorted.foreach { e =>
            val t = us(e.ts)
            e.event_type match {
              case "view" if s.t1 == Unset => s = s.copy(t1 = t)
              case "click" if s.t1 != Unset && s.t2 == Unset &&
                t > s.t1 && t <= s.t1 + hUs => s = s.copy(t2 = t)
              case "purchase" if s.t2 != Unset && s.t3 == Unset &&
                t > s.t2 && t <= s.t2 + hUs => s = s.copy(t3 = t)
              case _ =>
            }
          }
          state.update(s)
          val depth = if (s.t3 != Unset) 3 else if (s.t2 != Unset) 2
            else if (s.t1 != Unset) 1 else 0
          // depth-0 rows (touched users with no 'view' yet) are a
          // deliberate contract DIFFERENCE from batch funnelUsers,
          // which only emits entered users — a door reports every
          // user it has seen; the parity law holds at depth >= 1.
          Iterator.single(FunnelOut(userId, depth,
            Option(s.t1).filter(_ != Unset), Option(s.t2).filter(_ != Unset),
            Option(s.t3).filter(_ != Unset)))
        })
  }

  /** Custom stateful sessionizer — per-user state machine on
    * flatMapGroupsWithState, for session semantics the built-in window
    * can't express (e.g. emitting still-open sessions each batch).
    * Emits closed sessions as they complete plus the open session
    * (closed=false) at each batch end. */
  def statefulSessionize(events: Dataset[Ev], gapSeconds: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout)(
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessState]) => {
          val sorted = evs.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          var cur = state.getOption
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            val t = e.ts.getTime / 1000
            cur match {
              case Some(s) if t - s.lastTs <= gapSeconds =>
                cur = Some(s.copy(lastTs = t, n = s.n + 1))
              case Some(s) =>
                out += SessionOut(userId, s.startTs, s.lastTs, s.n, closed = true)
                cur = Some(SessState(t, t, 1))
              case None =>
                cur = Some(SessState(t, t, 1))
            }
          }
          cur.foreach { s =>
            state.update(s)
            out += SessionOut(userId, s.startTs, s.lastTs, s.n, closed = false)
          }
          out.iterator
        })
  }
}
