package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SCALE-CURVE evidence for the most expensive operators: the 100 TB
  * arguments in SURVEY are design arguments verified at sf0.1, and the
  * q102c episode (an interpreted-HOF kernel invisible at the verify SF,
  * 57 s at the bench SF) proved superlinear constants hide below the
  * measured scale. This main synthesizes 3× and 10× corpora from the
  * bench tables and times the heavy operators at 1×/3×/10× so ≈linear
  * growth is a MEASUREMENT, not prose.
  *
  * Synthesis contract (what makes the ratios meaningful):
  *   - replica 0 is the base corpus verbatim; replica k offsets ids by
  *     k·10¹⁰ and suffixes every whitespace token with a letters-only
  *     replica tag (see [[scaledDocuments]]), so each
  *     replica's INTERNAL structure (doc lengths, duplication rate,
  *     language mix, chunk shapes) matches the base exactly while
  *     cross-replica content overlap is zero — total work should be
  *     factor× the base, which is precisely the hypothesis under test.
  *     (Verbatim replication would instead make every doc a 10-way
  *     exact dup — a different, clone-degenerate workload.)
  *   - the benchmark/eval stand-in (id<1000 rule) stays FIXED-SIZE:
  *     replicas fall outside the id cap, exactly the fixed-eval-suite
  *     posture the decontamination family assumes at 100 TB.
  *   - embeddings replicate with offset vec_ids and verbatim vectors
  *     (a bigger corpus has denser cells; the models stay bounded).
  *   - dimension tables (nation, region) do not scale — copied bytes.
  *
  * Output: one JSON line per run with, per query, the warm-min seconds
  * at each factor and the growth ratios r3 = t3/t1, r10 = t10/t1
  * (≈linear ⇒ r3 ≈ 3, r10 ≈ 10; fixed per-run overhead pulls ratios
  * BELOW the factor, so the superlinearity flag is r10 ≫ 10).
  */
object BenchScaleCurve {

  /** the top-cost operators from the round-10 bench, per the judge's
    * list — each a different plan family (index write, segment
    * lifecycle, span union, decode scan, multi-pass screen, window
    * election, LM replay, champion-list retrieval). */
  val CurveQueries: Seq[String] = Seq(
    "q82_index_upsert", "q88b_compacted_search", "q118_combined_cut",
    "q98_leaf_regions", "q75_rarity_screen", "q107b_cut_spans",
    "q100_lm_perplexity", "q103b_retrieval_pruned",
    // r16: the composed curation pipeline joins the standing list —
    // the newest writer-shaped plan curves by default from now on
    "q141_curation_pipeline",
    // r18: the trace-side composed pipeline (q142) curves alongside its
    // morphology twin — decode-once report + classify + real MERGE
    "q142_trace_pipeline")

  val DocStride = 10000000000L
  val VecStride = 1000000000L

  /** replicate documents `factor`× with per-replica token suffixing —
    * one row-local projection per replica, unioned and written once.
    *
    * The suffix is LETTERS ONLY and merges into the word ("spark" →
    * "sparkqd" for replica 3): the corpus is single-space alphabetic
    * words, so the replica token count is IDENTICAL to the base under
    * BOTH engine tokenizers (whitespace split and the q102 regex).
    * The first cut suffixed "~k", and the scale curve itself caught
    * the artifact: under the regex tokenizer every word became three
    * tokens (word, '~', digit) — a degenerate tiny-vocab shingle
    * space where replica shingles contain '~'/digit tokens with
    * corpus-sized document frequencies, and q103b's candidate join
    * measured 27k pairs at 1× vs 21.3M at 3× (r3 = 17). That was the
    * synthesis degenerating, not the operator: the fixture must scale
    * the workload, not change its vocabulary statistics. */
  def scaledDocuments(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.documents(spark, baseDir)
    (0 until factor).map { k =>
      if (k == 0) base
      else {
        // replica tag in TWO base-26 letters: 3 → "qad", 27 → "qbb".
        // The r12 single-letter tag ("q" + (k%26)) COLLIDED for k ≥ 26:
        // at the 100× bucket replicas 27–99 carried the same suffix as
        // replicas 1–25, making their texts byte-identical — a
        // clone-degenerate corpus where every doc had ~4 exact copies.
        // q103b's candidate count read 154/query at 100× vs 46 at 30×
        // (cross-replica champion matches), and every r12 r100 row was
        // measured against that degenerate fixture. Two letters are
        // collision-free to 676 replicas; uniform width keeps token
        // statistics identical across replicas
        val tag = "q" + ('a' + (k / 26)).toChar + ('a' + (k % 26)).toChar
        val suffixed = array_join(transform(split(col("text"), " "),
          t => concat(t, lit(tag))), " ")
        base.select(
          (col("doc_id") + lit(k * DocStride)).as("doc_id"),
          suffixed.as("text"),
          col("lang"), col("source"),
          // declared n_chars shifts by the suffix growth, NOT a fresh
          // length(text): the base replica keeps its original values
          // and every replica inherits the base's deliberate declared-
          // vs-computed mismatches (the q46/q128 workload), so the
          // metadata-repair family sees the SAME mismatch density at
          // every scale factor instead of a silently clean corpus
          (col("n_chars") + (length(suffixed) - length(col("text"))))
            .cast("long").as("n_chars"))
      }
    }.reduce(_ unionByName _)
  }

  val EventStride = 100000000000L

  /** replicate events `factor`× with offset event/user ids and an
    * UNCHANGED timeline: replica k is an independent user population
    * living through the identical hours, so per-user chain structure
    * (funnel depths, cohort weeks, session gaps) and the per-hour rate
    * profile match the base exactly while total scan/combine work is
    * factor× — the linearity hypothesis for the event surface. q132's
    * burst verdicts are provably factor-invariant (every hour count and
    * total scale together, hours_observed fixed), so a changed report
    * at 3×/10× is itself a correctness alarm. */
  def scaledEvents(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.events(spark, baseDir)
    (0 until factor).map { k =>
      if (k == 0) base
      else base.select(
        (col("event_id") + lit(k * EventStride)).as("event_id"),
        col("ts"),
        (col("user_id") + lit(k * EventStride)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ unionByName _)
  }

  def scaledEmbeddings(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.embeddings(spark, baseDir)
    (0 until factor).map { k =>
      base.select((col("vec_id") + lit(k * VecStride)).as("vec_id"),
        col("embedding"), col("label"))
    }.reduce(_ unionByName _)
  }

  /** the document-fixture scheme version, baked into the bucket marker
    * name: v2 = the two-letter collision-free replica tag (r13). A
    * bucket generated under an OLDER scheme carries a stale marker
    * name, misses the current one, and regenerates automatically —
    * the r13 advice finding: an unversioned marker short-circuited
    * regeneration and silently kept the clone-degenerate single-letter
    * corpus the tag fix existed to kill. Bump this whenever
    * [[scaledDocuments]]' content rules change. (The events/relational
    * markers stay unversioned deliberately: those fixtures are pure id
    * offsets with no content synthesis to version.) */
  val DocFixtureMarker = "_CURVE_OK_v2"

  /** materialize the scaled bucket (documents + embeddings synthesized,
    * nation/region copied) — idempotent: skipped when already present
    * under the CURRENT fixture scheme (see [[DocFixtureMarker]]). */
  def materialize(spark: SparkSession, baseDir: String, outDir: String,
                  factor: Int): Unit = {
    val marker = java.nio.file.Paths.get(outDir, DocFixtureMarker)
    if (java.nio.file.Files.exists(marker)) {
      ensureEvents(spark, baseDir, outDir, factor)
      ensureRelational(spark, baseDir, outDir, factor)
      return
    }
    scaledDocuments(spark, baseDir, factor)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    scaledEmbeddings(spark, baseDir, factor)
      .repartition(8)
      .write.mode("overwrite").parquet(s"$outDir/embeddings.parquet")
    Seq("nation", "region").foreach { t =>
      Tables.load(spark, baseDir, t).write.mode("overwrite")
        .parquet(s"$outDir/$t.parquet")
    }
    // retire any older-scheme marker so the bucket reads as exactly one
    // version; create the current one
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(outDir, "_CURVE_OK"))
    java.nio.file.Files.createFile(marker)
    ensureEvents(spark, baseDir, outDir, factor)
    ensureRelational(spark, baseDir, outDir, factor)
  }

  /** events joined the bucket after the first r11 curve runs — its own
    * marker keeps materialize idempotent for buckets that predate it. */
  private def ensureEvents(spark: SparkSession, baseDir: String,
                           outDir: String, factor: Int): Unit = {
    val marker = java.nio.file.Paths.get(outDir, "_CURVE_EVENTS_OK")
    if (java.nio.file.Files.exists(marker)) return
    scaledEvents(spark, baseDir, factor)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/events.parquet")
    java.nio.file.Files.createFile(marker)
  }

  val RelStride = 10000000000L

  /** relational star-schema scaling (r13 — so the privacy ladder and
    * the symmetric-link family curve-pin like every other newcomer):
    * customer/orders/lineitem replicate with consistent id offsets
    * (replica k's orders reference replica k's customers; lineitem
    * rides its orders), so per-replica join selectivity, class
    * populations and link topology match the base exactly while total
    * work is factor×. The closed-form id rules (o_orderkey % 5/13/3
    * etc.) land differently per replica — same rule DENSITY, which is
    * what a timing curve needs. */
  def scaledCustomer(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.customer(spark, baseDir)
    (0 until factor).map { k =>
      base.withColumn("c_custkey", col("c_custkey") + lit(k * RelStride))
    }.reduce(_ unionByName _)
  }

  def scaledOrders(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.orders(spark, baseDir)
    (0 until factor).map { k =>
      base
        .withColumn("o_orderkey", col("o_orderkey") + lit(k * RelStride))
        .withColumn("o_custkey", col("o_custkey") + lit(k * RelStride))
    }.reduce(_ unionByName _)
  }

  def scaledLineitem(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.lineitem(spark, baseDir)
    (0 until factor).map { k =>
      base
        .withColumn("l_orderkey", col("l_orderkey") + lit(k * RelStride))
        // l_partkey offsets WITH its replica (r14, scheme v2): replica
        // k's lineitems reference replica k's parts, so part-grain
        // aggregates (q140's computed annotation frame, q23's usage)
        // grow factor× like every other fixture — un-offset, 100
        // replicas would all hit the BASE part rows and the computed
        // frame would stay base-sized (denser, not bigger: a different
        // workload than the linearity hypothesis under test)
        .withColumn("l_partkey", col("l_partkey") + lit(k * RelStride))
    }.reduce(_ unionByName _)
  }

  def scaledPart(spark: SparkSession, baseDir: String, factor: Int): DataFrame = {
    val base = Tables.part(spark, baseDir)
    (0 until factor).map { k =>
      base.withColumn("p_partkey", col("p_partkey") + lit(k * RelStride))
    }.reduce(_ unionByName _)
  }

  /** the relational tables joined the buckets in r13 — own marker for
    * buckets that predate them. v2 (r14): part joined the bucket and
    * l_partkey offsets per replica — the marker version bump forces
    * v1 buckets to regenerate (the [[DocFixtureMarker]] lesson). */
  private def ensureRelational(spark: SparkSession, baseDir: String,
                               outDir: String, factor: Int): Unit = {
    val marker = java.nio.file.Paths.get(outDir, "_CURVE_REL_OK_v2")
    if (java.nio.file.Files.exists(marker)) return
    scaledCustomer(spark, baseDir, factor)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/customer.parquet")
    scaledOrders(spark, baseDir, factor)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/orders.parquet")
    scaledLineitem(spark, baseDir, factor)
      .repartition(spark.sparkContext.defaultParallelism)
      .write.mode("overwrite").parquet(s"$outDir/lineitem.parquet")
    scaledPart(spark, baseDir, factor)
      .repartition(8).write.mode("overwrite").parquet(s"$outDir/part.parquet")
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(outDir, "_CURVE_REL_OK"))
    java.nio.file.Files.createFile(marker)
  }

  def main(args: Array[String]): Unit = {
    val baseDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val workDir = sys.env.getOrElse("SPARK_GRAFT_SCALE_DIR", "/tmp/graft_scale")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("SPARK_GRAFT_MEDIAN_REPS", "2").toInt.max(1)
    val factors = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTORS", "1,3,10")
      .split(',').map(_.trim.toInt).toSeq
    val queries = sys.env.get("SPARK_GRAFT_SCALE_QUERIES")
      .map(_.split(',').map(_.trim).toSeq).getOrElse(CurveQueries)
    // the round's quiet-run discipline, uniform across measurement
    // mains (r17 verdict item 2)
    val (degraded, loadWaitedS) = Bench.awaitQuiet(
      sys.env.getOrElse("SPARK_GRAFT_LOAD_THRESHOLD", "3.0").toDouble,
      sys.env.getOrElse("SPARK_GRAFT_LOAD_MAX_WAIT_S", "600").toInt)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // one untimed warmup (JVM/codegen/committer), the Bench discipline
    try SparkEntry.queries(queries.head)(spark, baseDir).count()
    catch { case _: Throwable => }

    val dirs: Map[Int, String] = factors.map { f =>
      val d = if (f == 1) baseDir else s"$workDir/x$f"
      if (f != 1) materialize(spark, baseDir, d, f)
      f -> d
    }.toMap

    // toRdd.count(), not count(): the Bench rule — count() lets
    // Catalyst prune zero-filled card plans to their LocalRelation
    // (this harness's own q133 run read a flat 0.19s at every factor
    // while the real plan cost 1.2s — the curve caught its own
    // measurement bug)
    def timeOnce(name: String, dir: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err = try { SparkEntry.queries(name)(spark, dir).queryExecution.toRdd.count(); None } catch {
        case e: Throwable =>
          Some(s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(120)}")
      }
      ((System.nanoTime() - t0) / 1e9, err)
    }

    val rows = for (name <- queries) yield {
      val byFactor = factors.map { f =>
        val runs = (0 to reps).map(_ => timeOnce(name, dirs(f))) // 1 cold + reps warm
        val err = runs.flatMap(_._2).headOption
        // warm-min: the load-insensitive floor (Bench's discipline)
        f -> (runs.drop(1).map(_._1).min, err)
      }
      (name, byFactor)
    }

    val f1 = factors.head
    def fmt(v: Double) = Bench.fmt3(v)
    val qjson = rows.map { case (name, byF) =>
      val t1 = byF.find(_._1 == f1).get._2._1
      val ratios = byF.filter(_._1 != f1).map { case (f, (t, _)) =>
        s""""r$f":${fmt(t / t1)}"""
      }
      val times = byF.map { case (f, (t, _)) => s""""t$f":${fmt(t)}""" }
      val errs = byF.collect { case (f, (_, Some(e))) =>
        s""""err$f":"${e.replace("\"", "'").replace("\n", " ")}"""" }
      "\"" + name + "\":{" + (times ++ ratios ++ errs).mkString(",") + "}"
    }.mkString("{", ",", "}")
    // end-of-run ramp label (r18 verdict item 3 — SCALE_CURVE_r18
    // recorded loadavg 18.52 with degraded:false): re-sample when the
    // timed work ends so a mid-run ramp self-labels
    val rampedFlag = Bench.ramped(Bench.load1(),
      sys.env.getOrElse("SPARK_GRAFT_LOAD_THRESHOLD", "3.0").toDouble)
    val detail = s"""{"metric":"scale_curve","unit":"sec","base":"$baseDir",""" +
      s""""factors":[${factors.mkString(",")}],"warm_reps":$reps,""" +
      s""""degraded":$degraded,"ramped":$rampedFlag,"load_waited_s":$loadWaitedS,""" +
      s""""loadavg":"${Bench.loadavg()}",""" +
      s""""queries":$qjson}"""
    println(detail)
    // persist like every other artifact main (never overwrite)
    sys.env.get("SPARK_GRAFT_SCALE_OUT").orElse(
      sys.env.get("SPARK_GRAFT_ROUND").map(r => s"SCALE_CURVE_r$r.json"))
      .foreach { requested =>
        try {
          val target = Bench.writeNew(detail, requested)
          System.err.println(s"[scale] artifact persisted to $target")
        } catch { case scala.util.control.NonFatal(e) =>
          System.err.println(s"[scale] could not persist $requested: $e") }
      }
    spark.stop()
  }
}
