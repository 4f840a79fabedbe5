package graft
import org.apache.spark.sql.SparkSession

/** Driver benchmark: ONE JSON line on stdout. `queries`/`value` are the
  * historical cold single-shot figures (first timed run of each query
  * in a warm JVM); `queries_warm_median`/`warm_median_total` ride along
  * in the same object — warm medians over SPARK_GRAFT_MEDIAN_REPS
  * repeat runs per query (default 3). Single-shot timings on a shared
  * box are load-noise-dominated (identical code has spread 1.3–2.1s on
  * one query across rounds); the medians are the signal to trust when
  * comparing rounds, and emitting both keeps old BENCH files
  * comparable. */
object Bench {
  /** locale-fixed 3-decimal format: the f-interpolator uses the default
    * JVM locale, so a decimal-comma locale (de_DE) would emit `0,123`
    * and break the one-line JSON contract. */
  def fmt3(v: Double): String =
    String.format(java.util.Locale.ROOT, "%.3f", Double.box(v))

  /** the 1/5/15-minute load triple from /proc/loadavg — the r14 verdict's
    * load-guard: every round since r12 has spent a paragraph adjudicating
    * box-load spread between rulers, because no artifact recorded what
    * the box was doing when its numbers were taken. Stamped at run start
    * AND end (a load burst mid-run shows as a start/end delta). "?" on
    * non-Linux hosts — the stamp is evidence, never a failure. */
  def loadavg(): String =
    try new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg"))).split(" ").take(3).mkString(" ")
    catch { case _: Exception => "?" }

  /** 1-minute load, or None where /proc/loadavg is unreadable. */
  def load1(): Option[Double] =
    loadavg().split(" ").headOption.flatMap(_.toDoubleOption)

  /** end-of-run RAMP label (r18 verdict item 3): the quiet guard
    * admits on load at START only, so a box that ramps mid-run ships a
    * hot artifact stamped `degraded:false` (BENCH_full.7 admitted at
    * 2.55 and ended at 10.21; SCALE_CURVE_r18 recorded 18.52 — both
    * read as quiet). Every artifact main now re-samples the 1-minute
    * load when its timed work ENDS and stamps `ramped=true` when that
    * end-load breaches the same admission threshold — a hot cell
    * self-labels instead of waiting for a judge to read the loadavg
    * string. No-evidence (None) stays unlabelled, like the guard. */
  def ramped(endLoad1: Option[Double], threshold: Double): Boolean =
    endLoad1.exists(_ >= threshold)

  /** LOAD-GUARD (r15 verdict item 2): the official gate artifact was
    * the one number still exposed to box noise — BENCH_r15 started at
    * loadavg 5.97 and read 25% above three quiet runs. Bench now
    * DEFERS its own start: poll the 1-minute load and sleep until it
    * drops under `threshold`, up to a bounded `maxWaitS`; if the box
    * never quiets, RUN ANYWAY but return degraded=true so the artifact
    * self-labels and no one compares it against quiet rulers. Returns
    * (degraded, secondsWaited). Non-Linux hosts (no readable loadavg)
    * skip the wait — absence of evidence is stamped as "?" either way.
    *
    * The non-degraded claim needs TWO consecutive quiet samples (r16
    * advice): the 1-minute load decays exponentially, so a single
    * sample can catch a momentary dip inside a sustained burst and
    * mislabel the run — a second quiet reading `confirmS` later makes
    * the dip-at-the-last-poll false negative require the burst to
    * genuinely recede. The wait is also CLAMPED to maxWaitS (the old
    * loop slept a full poll past the deadline).
    *
    * `sample`/`sleep` are injectable so the guard's decision logic is
    * DETERMINISTICALLY SPEC'D (HarnessSpec drives it with scripted
    * load sequences — a real-clock test of a 10-minute wait policy is
    * not a test); `sleep` returns the seconds it actually consumed and
    * `waited` accumulates those returns, so injected time and wall
    * time follow the same arithmetic. A sample that turns None
    * MID-WAIT (loadavg becomes unreadable) ends the wait the same way
    * the initial None does — no evidence, run unguarded/non-degraded —
    * rather than crashing the bench on a log line (r17 advice). */
  def awaitQuiet(threshold: Double, maxWaitS: Int, pollS: Int = 15,
                 confirmS: Int = 5,
                 sample: () => Option[Double] = () => load1(),
                 sleep: Double => Double =
                   s => { Thread.sleep((s * 1000).toLong.max(1L)); s })
      : (Boolean, Long) = {
    var waited = 0.0
    var l = sample()
    if (l.isEmpty) return (false, 0L) // no /proc/loadavg — no evidence either way
    var streak = if (l.exists(_ < threshold)) 1 else 0
    while (streak < 2 && waited < maxWaitS) {
      if (streak == 0)
        System.err.println(f"[bench] load ${l.fold("?")(v => f"$v%.2f")}%s >= $threshold%.1f — deferring start (${waited.toLong}s/${maxWaitS}s)")
      val gapS = (if (streak == 1) confirmS else pollS).toDouble.min(maxWaitS - waited)
      waited += sleep(gapS)
      l = sample()
      if (l.isEmpty) return (false, waited.toLong) // evidence vanished mid-wait
      streak = if (l.exists(_ < threshold)) streak + 1 else 0
    }
    (streak < 2, waited.toLong)
  }

  /** never-overwrite artifact claim, ATOMIC (r14 advice): CREATE_NEW
    * either creates the file or throws FileAlreadyExistsException —
    * the old exists-probe + writeString pair let two concurrent runs
    * both see a path free and one silently clobber the other. On a
    * taken path the claim probes stem.2.json, stem.3.json, … so every
    * invocation's artifact survives every later invocation. Shared by
    * every artifact-writing main (Bench, BenchPlans). */
  def writeNew(detail: String, requested: String): java.nio.file.Path = {
    val stem = if (requested.endsWith(".json")) requested.dropRight(5) else requested
    val candidates = Iterator(java.nio.file.Paths.get(requested)) ++
      Iterator.from(2).map(i => java.nio.file.Paths.get(s"$stem.$i.json"))
    candidates.flatMap { p =>
      try {
        java.nio.file.Files.writeString(p, detail + "\n",
          java.nio.file.StandardOpenOption.CREATE_NEW)
        Some(p)
      } catch { case _: java.nio.file.FileAlreadyExistsException => None }
    }.next()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val loadThreshold = sys.env.getOrElse("SPARK_GRAFT_LOAD_THRESHOLD", "3.0").toDouble
    val loadMaxWaitS = sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX_WAIT_S", "600").toInt
    val (degraded, loadWaitedS) = awaitQuiet(loadThreshold, loadMaxWaitS)
    if (degraded)
      System.err.println(s"[bench] load still >= $loadThreshold after ${loadWaitedS}s — running DEGRADED")
    val loadStart = loadavg()
    val startedUtc = java.time.Instant.now().toString
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    // clamped to >= 1: the median of zero reps is undefined, and dying
    // after timing every query would lose the whole run's output
    val medianReps = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_REPS", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warmup: JVM/codegen/parquet-footer costs land here, not
    // on whichever query happens to run first
    try SparkEntry.queries.headOption.foreach(_._2(spark, sfDir).count()) catch { case _: Throwable => }
    // ... and the parquet WRITE path (committer + FileFormatWriter init),
    // which otherwise lands entirely on the first writer query (q43)
    try {
      val wdir = java.nio.file.Files.createTempDirectory("graft_bench_warm_").toString + "/t"
      spark.range(2).write.mode("overwrite").parquet(wdir)
      spark.read.parquet(wdir).count()
    } catch { case _: Throwable => }
    // a failing query must surface as an error string, never as a fast
    // timing (a silently-broken query would otherwise read as a speedup)
    //
    // toRdd.count(), NOT df.count(): count() re-optimizes the plan for
    // a count aggregate, and on zero-filled card shapes (a literal
    // dimension frame LEFT-JOINed to unique-keyed heavy aggregates —
    // q133's shape) Catalyst eliminates the ENTIRE engine plan down to
    // the 3-row LocalRelation: measured 0.12s "warm" vs 1.2s real.
    // toRdd executes the query's own physical plan for its full output
    // schema (every operator incl. the final sort), rows never reach
    // the driver — the honest "a consumer read every row" cost.
    def time(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { fn(spark, sfDir).queryExecution.toRdd.count(); None } catch {
        case e: Throwable => Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }
    // the cold run doubles as the SHUFFLE-BYTE meter (r17): bytes
    // crossing exchanges are a property of the PLAN, not of box load,
    // so one passive listener-metered run per query stamps what a
    // cluster fabric would pay — the per-query extension of the media
    // cells' r16 `shuffle_mb` discipline, now a suite-wide inventory.
    // The listener only accumulates completed-stage metrics; the timed
    // section sits inside the measure() bus drains, so cold timings
    // stay comparable with prior rounds.
    def timeColdMetered(fn: (SparkSession, String) => org.apache.spark.sql.DataFrame)
        : (Double, Option[String], Long) = {
      var t = 0.0
      var err: Option[String] = None
      val (sw, _) = ShuffleBytes.measure(spark, () => {
        val r = time(fn); t = r._1; err = r._2
      })
      (t, err, sw)
    }
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val (cold, coldErr, shuffleW) = timeColdMetered(fn)
      val warmRuns = (1 to medianReps).map(_ => time(fn))
      val warm = warmRuns.map(_._1).sorted
      val err = (coldErr ++ warmRuns.flatMap(_._2)).headOption
      (name, cold, warm(warm.length / 2), warm.head, err, shuffleW / 1e6)
    }
    // timings rounded to ms: sub-ms digits are pure noise, and the full
    // double repr quadrupled the line length — long enough that tail
    // captures of this one-line contract truncated mid-JSON
    def obj(f: ((String, Double, Double, Double, Option[String], Double)) => (String, Double)): String =
      results.map { r => val (k, v) = f(r); "\"" + k + "\":" + fmt3(v) }
        .mkString("{", ",", "}")
    val cold = obj { case (k, c, _, _, _, _) => k -> c }
    val warm = obj { case (k, _, m, _, _, _) => k -> m }
    val shuffleMb = obj { case (k, _, _, _, _, sw) => k -> sw }
    // per-query warm MIN: the load-insensitive floor — box noise only
    // ever inflates timings, so min-over-reps is the number least
    // polluted by a busy driver host (r6's q43 "5.08s median" was pure
    // load; a min column makes the next phantom self-evident)
    val warmMin = obj { case (k, _, _, mn, _, _) => k -> mn }
    // full JSON string escape incl. control chars: Spark error messages
    // are routinely multi-line, and a raw newline inside the string
    // would break BOTH the one-line contract and the JSON — exactly
    // when a query fails and the error field matters most
    def jstr(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val errsJson = results.collect { case (k, _, _, _, Some(e), _) =>
      jstr(k) + ":" + jstr(e)
    }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val warmTotal = results.map(_._3).sum
    // field order is deliberate: the driver's artifact capture `tail`s
    // this line and has twice truncated it mid-JSON — the scalars, the
    // errors object and queries_warm_min (the trusted cross-round
    // number) come FIRST so a tail cut only ever costs the historical
    // cold figures at the end
    // PERSIST the full detail line to a repo file: the driver's tail
    // capture has truncated the stdout line to ~2.4 KB (r12 lost
    // per-query timings for two-thirds of the suite) — the file is the
    // durable full artifact regardless of what the capture keeps
    // warm_min_total rides the detail line too (r14): the gate quotes
    // it, and before this it existed only in the stdout summary — a
    // grep against the committed artifact could not find it
    val loadEnd = loadavg()
    val rampedFlag = ramped(
      loadEnd.split(" ").headOption.flatMap(_.toDoubleOption), loadThreshold)
    val detail = s"""{"metric":"total","value":${fmt3(total)},"unit":"sec",""" +
      s""""sf":"$sfDir","warm_reps":$medianReps,""" +
      s""""loadavg_start":"$loadStart","loadavg_end":"$loadEnd",""" +
      s""""degraded":$degraded,"ramped":$rampedFlag,"load_waited_s":$loadWaitedS,""" +
      s""""started_utc":"$startedUtc",""" +
      s""""warm_median_total":${fmt3(warmTotal)},""" +
      s""""warm_min_total":${fmt3(results.map(_._4).sum)},""" +
      s""""shuffle_write_mb_total":${fmt3(results.map(_._6).sum)},"errors":$errsJson,""" +
      s""""queries_warm_min":$warmMin,"queries_shuffle_mb":$shuffleMb,""" +
      s""""queries_warm_median":$warm,"queries":$cold}"""
    println(detail)
    // path override for launchers whose cwd is not the repo checkout;
    // a failed write must SAY so (silently losing the artifact is the
    // exact r12 failure this exists to fix), but never kill the run —
    // the stdout line above still carries the data.
    //
    // NEVER OVERWRITE an existing artifact (r13 judge disclosure: the
    // judge's verification run clobbered the driver's uncommitted
    // refresh because every invocation wrote the one unconditional
    // path). The default name is round-stamped when SPARK_GRAFT_ROUND
    // is set; either way, if the target exists the write probes
    // name.2.json, name.3.json, … — every invocation's artifact
    // survives every later invocation, and which path was written is
    // printed to stderr
    val requested = sys.env.get("SPARK_GRAFT_BENCH_FULL").getOrElse(
      sys.env.get("SPARK_GRAFT_ROUND")
        .map(r => s"BENCH_full_r$r.json").getOrElse("BENCH_full.json"))
    try {
      val target = writeNew(detail, requested)
      System.err.println(s"[bench] full artifact persisted to $target")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] could not persist $requested: $e") }
    // SECOND, short summary line printed LAST: the driver's artifact
    // capture keeps the END of output and has truncated the detail line
    // mid-JSON four rounds running (r9's front-loading moved the trusted
    // warm totals INTO the cut zone). A ≤200-byte complete JSON object
    // as the final line survives any tail cut; the detail line above
    // stays for full per-query history when the capture is whole.
    val warmMinTotal = results.map(_._4).sum
    val nErrors = results.count(_._5.isDefined)
    println(s"""{"metric":"warm_median_total","value":${fmt3(warmTotal)},"unit":"sec",""" +
      s""""sf":"$sfDir","n_queries":${results.length},"n_errors":$nErrors,"degraded":$degraded,"ramped":$rampedFlag,""" +
      s""""warm_min_total":${fmt3(warmMinTotal)},"cold_total":${fmt3(total)}}""")
    spark.stop()
  }
}
