package graft

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming-door throughput harness (r17): the doors carry spec-level
  * equivalence proofs (door output ≡ batch operator) and restart
  * soaks, but — alone among the engine's surfaces — no measured cost.
  * This times four representative doors end-to-end (source file
  * discovery → micro-batches → sink) against their BATCH TWIN on the
  * SAME input and ruler, so the "door premium" (per-micro-batch
  * machinery: offset log, state store, per-batch planning) is a
  * number, not a guess.
  *
  * Protocol: input staged ONCE as K ordered slice files;
  * `maxFilesPerTrigger=1` under Trigger.AvailableNow forces K real
  * micro-batches (the steady-state shape — one file per arrival wave);
  * each rep gets a FRESH checkpoint so every rep replays the full
  * cycle. Sink is the Bench ruler applied at the door — foreachBatch
  * runs `toRdd.count()` (every row computed, none persisted) — except
  * the annotation-push door, whose sink IS the operator (real MERGE
  * per batch; its twin q140 prices the diff only, so the door−twin gap
  * is the writer by construction, stated in the cell). Timings are
  * wall-clock per full cycle, reps ≥3, min+median reported; pre-run
  * 1-min load stamped per cell (the round's quiet-run discipline). */
object BenchDoors {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val slices = 4
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def tmp(prefix: String): String =
      java.nio.file.Files.createTempDirectory(prefix).toString
    def timeIt(fn: () => Unit): Double = {
      val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
    }
    def stats(xs: Seq[Double]): (Double, Double) = {
      val s = xs.sorted; (s.head, s(s.length / 2))
    }
    val countSink = (b: Dataset[Row], _: Long) => { b.queryExecution.toRdd.count(); () }

    /** run one door rep: fresh checkpoint, AvailableNow to drain. */
    def doorRep(mk: String => org.apache.spark.sql.streaming.DataStreamWriter[Row]): Double = {
      val ckpt = tmp("graft_doors_ckpt")
      timeIt { () =>
        val q = mk(ckpt).trigger(Trigger.AvailableNow()).start()
        try q.processAllAvailable() finally q.stop()
      }
    }

    def cell(name: String, nRows: Long, nBatches: Int, twin: String,
             preLoad: Option[Double],
             doorTimes: Seq[Double], oneBatchTimes: Seq[Double],
             twinTimes: Seq[Double], note: String): String = {
      val (dMin, dMed) = stats(doorTimes)
      val (oMin, _) = stats(oneBatchTimes)
      val (tMin, tMed) = stats(twinTimes)
      // the fixed-vs-per-row split: same rows drained as ONE batch vs
      // nBatches — the delta over the extra batches is the per-batch
      // machinery (offset log, state store commit, per-batch planning),
      // which amortizes at production arrival volumes
      val perBatch = (dMin - oMin) / (nBatches - 1).max(1)
      s""""$name":{"n_rows":$nRows,"n_batches":$nBatches,""" +
        s""""door_s_min":${Bench.fmt3(dMin)},"door_s_median":${Bench.fmt3(dMed)},""" +
        s""""door_1batch_s_min":${Bench.fmt3(oMin)},""" +
        s""""per_batch_overhead_s":${Bench.fmt3(perBatch)},""" +
        s""""door_rows_per_s":${Bench.fmt3(nRows / dMin)},""" +
        s""""batch_twin":"$twin","twin_s_min":${Bench.fmt3(tMin)},"twin_s_median":${Bench.fmt3(tMed)},""" +
        s""""door_over_twin":${Bench.fmt3(dMin / tMin)},""" +
        s""""pre_run_load1":"${preLoad.getOrElse(-1.0)}","note":"$note"}"""
    }

    // ---- cell 1: corpus screen (stateless row-local verdicts +
    // within-watermark dedup — the highest-volume ingest door)
    val screenCell = {
      val docs = Tables.documents(spark, sfDir)
      val nRows = docs.count()
      val dir = tmp("graft_doors_screen")
      (0 until slices).foreach(i => docs
        .filter(pmod(col("doc_id"), lit(slices.toLong)) === i.toLong)
        .coalesce(1).write.mode("append").parquet(dir))
      val rates = Seq("en" -> 1000, "zh" -> 5000)
      def door(mfpt: Option[Int]) = doorRep { ckpt =>
        val rs = spark.readStream.schema(graft.streaming.DocStreams.docsSchema)
        graft.streaming.DocStreams.corpusScreen(
          mfpt.fold(rs)(n => rs.option("maxFilesPerTrigger", n)).parquet(dir),
          rates, 2500)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt).foreachBatch(countSink)
      }
      def twin() = timeIt { () =>
        graft.operators.Corpus.withScreenColumns(docs, rates, 2500)
          .filter(col("is_quality") && col("sampled"))
          .dropDuplicates("fingerprint")
          .select("doc_id", "lang", "fingerprint", "alpha_bp")
          .queryExecution.toRdd.count(); ()
      }
      val preLoad = Bench.load1()
      door(Some(1)); twin() // untimed warmup pair
      cell("screen_door", nRows, slices, "withScreenColumns+dedup (the door's own verdict block)",
        preLoad,
        (1 to reps).map(_ => door(Some(1))), (1 to reps).map(_ => door(None)),
        (1 to reps).map(_ => twin()),
        "stateless verdicts + dropDuplicatesWithinWatermark; door pays source discovery + " +
          s"$slices micro-batch plans + state store for the dedup")
    }
    System.err.println(s"[doors] screen done")

    // ---- cell 2: retrieval percolation (frozen query model, row-local
    // scoring at the door — q103's corpus side arriving incrementally)
    val retrievalCell = {
      val docs = Tables.documents(spark, sfDir)
      val corpusSide = docs.filter(
        pmod(col("doc_id"), lit(graft.operators.Corpus.RetMod.toLong)) =!= 0L)
      val nRows = corpusSide.count()
      val dir = tmp("graft_doors_ret")
      (0 until slices).foreach(i => corpusSide
        .filter(pmod(col("doc_id"), lit(slices.toLong)) === i.toLong)
        .coalesce(1).write.mode("append").parquet(dir))
      val model = graft.operators.Corpus.retrievalModel(docs)
      def door(mfpt: Option[Int]) = doorRep { ckpt =>
        val rs = spark.readStream.schema(graft.streaming.DocStreams.docsSchema)
        graft.streaming.DocStreams.retrievalLookup(
          mfpt.fold(rs)(n => rs.option("maxFilesPerTrigger", n)).parquet(dir),
          model, 0L)
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt).foreachBatch(countSink)
      }
      def twin() = timeIt { () =>
        SparkEntry.queries("q103_chunk_retrieval")(spark, sfDir)
          .queryExecution.toRdd.count(); ()
      }
      val preLoad = Bench.load1()
      door(Some(1)); twin()
      cell("retrieval_lookup_door", nRows, slices, "q103_chunk_retrieval",
        preLoad,
        (1 to reps).map(_ => door(Some(1))), (1 to reps).map(_ => door(None)),
        (1 to reps).map(_ => twin()),
        "percolation vs frozen query model, row-local scoring; twin additionally " +
          "ELECTS global top-k (the door alerts, the batch ranks) — stated asymmetry")
    }
    System.err.println(s"[doors] retrieval done")

    // ---- cell 3: stateful sessionize (flatMapGroupsWithState +
    // event-time timers — the stateful door), at 1× and 10× volume.
    // The ×10 arm MEASURES the amortization claim instead of arguing
    // it: per-batch machinery is fixed, so rows/s must rise toward the
    // kernel rate as arrival waves carry more rows (10 disjoint
    // user-id universes replicate the corpus without changing any
    // session's shape).
    def sessionizeCellAt(mult: Int, name: String): String = {
      val ev0 = Tables.events(spark, sfDir)
        .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      val ev = if (mult == 1) ev0 else (0 until mult).map(i => ev0
          .withColumn("event_id", col("event_id") + lit(i * 1000000000L))
          .withColumn("user_id", col("user_id") + lit(i * 1000000000L)))
        .reduce(_ unionByName _)
      val nRows = ev.count()
      // contiguous event-time waves so the watermark advances per batch
      // (the steady-state arrival shape for a time-ordered event log)
      val withTs = ev.withColumn("ts_us", unix_micros(col("ts")))
      val qs = withTs.stat.approxQuantile("ts_us", Array(0.25, 0.5, 0.75), 0.001)
        .map(_.toLong)
      val dir = tmp("graft_doors_sess")
      val bounds = (Long.MinValue +: qs :+ Long.MaxValue).sliding(2).toSeq
      bounds.foreach { b =>
        withTs.filter(col("ts_us") >= b(0) && col("ts_us") < b(1)).drop("ts_us")
          .coalesce(1).write.mode("append").parquet(dir)
      }
      def door(mfpt: Option[Int]) = doorRep { ckpt =>
        val stream = graft.streaming.EventStreams.readEventStream(spark, dir,
            maxFilesPerTrigger = mfpt)
          .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
          .as[graft.streaming.EventStreams.Ev]
        graft.streaming.EventStreams.statefulSessionize(stream)
          .toDF().writeStream.outputMode("update")
          .option("checkpointLocation", ckpt).foreachBatch(countSink)
      }
      // twin = the same batch operator over the SAME (replicated)
      // input; at mult=1 this is exactly the q51 plan
      def twin() = timeIt { () =>
        graft.operators.EventOps.sessionize(ev)
          .queryExecution.toRdd.count(); ()
      }
      val preLoad = Bench.load1()
      door(Some(1)); twin()
      cell(name, nRows, slices, s"EventOps.sessionize x$mult (q51's operator)",
        preLoad,
        (1 to reps).map(_ => door(Some(1))), (1 to reps).map(_ => door(None)),
        (1 to reps).map(_ => twin()),
        "flatMapGroupsWithState + event-time eviction timers over 4 time-ordered waves; " +
          "state = open sessions only" +
          (if (mult > 1) s"; x$mult disjoint user universes — same waves, ${mult}x rows per batch" else ""))
    }
    val sessionizeCell = sessionizeCellAt(1, "sessionize_door")
    System.err.println(s"[doors] sessionize done")
    val sessionizeCellX10 = sessionizeCellAt(10, "sessionize_door_x10")
    System.err.println(s"[doors] sessionize x10 done")

    // ---- cell 4: annotation push (this round's guarded writer door —
    // diff + keylog guard + real MERGE per batch)
    val annPushCell = {
      val part = Tables.part(spark, sfDir)
      val lineitem = Tables.lineitem(spark, sfDir)
      val computed = graft.operators.Curation.computedCompartmentAnnotations(lineitem)
      val nRows = computed.count()
      val dir = tmp("graft_doors_annpush_src")
      val kSlices = 3 // hash-disjoint keys per slice — the replay contract
      (0 until kSlices).foreach(i => computed
        .filter(pmod(hash(col("entity_id"), col("compartment")), lit(kSlices)) === i)
        .coalesce(1).write.mode("append").parquet(dir))
      def door(mfpt: Option[Int]) = {
        // writer door mutates its store: fresh store + actions per rep
        val storeDir = tmp("graft_doors_annpush_store") + "/store"
        val actDir = tmp("graft_doors_annpush_act")
        graft.operators.Curation.annotationStoreSeed(part).write.parquet(storeDir)
        val ckpt = tmp("graft_doors_annpush_ckpt") + "/ckpt"
        timeIt { () =>
          val rs = spark.readStream.schema(computed.schema)
          val q = graft.streaming.EventStreams.annotationPushSink(
            mfpt.fold(rs)(n => rs.option("maxFilesPerTrigger", n)).parquet(dir),
            part, storeDir, actDir, ckpt)
          try q.processAllAvailable() finally q.stop()
        }
      }
      def twin() = timeIt { () =>
        SparkEntry.queries("q140_annotation_push")(spark, sfDir)
          .queryExecution.toRdd.count(); ()
      }
      val preLoad = Bench.load1()
      door(Some(1)); twin()
      cell("annotation_push_door", nRows, kSlices, "q140_annotation_push",
        preLoad,
        (1 to reps).map(_ => door(Some(1))), (1 to reps).map(_ => door(None)),
        (1 to reps).map(_ => twin()),
        "guarded writer door: keylog disjointness check + diff + REAL copy-on-write MERGE " +
          "per batch; twin is the diff only, so door-twin = 3 writer cycles + guard by construction")
    }
    System.err.println(s"[doors] annotation push done")

    val detail = s"""{"metric":"door_throughput","sf":"$sfDir","reps":$reps,""" +
      s""""loadavg":"${Bench.loadavg()}",""" +
      s""""note":"each door drained with Trigger.AvailableNow over maxFilesPerTrigger=1 slice files (real micro-batches); fresh checkpoint per rep; sink = per-batch toRdd.count (the Bench ruler at the door) except annotation_push whose sink IS the MERGE writer; twins run on the same session and input; door_1batch drains the SAME rows as ONE micro-batch, so (door-door_1batch)/(n_batches-1) = per-batch machinery cost, which amortizes at production arrival volumes — at this test scale the premium is batch-count, not per-row",""" +
      s"""$screenCell,$retrievalCell,$sessionizeCell,$sessionizeCellX10,$annPushCell}"""
    println(detail)
    val requested = sys.env.get("SPARK_GRAFT_DOORS").getOrElse(
      sys.env.get("SPARK_GRAFT_ROUND")
        .map(r => s"DOORS_r$r.json").getOrElse("DOORS.json"))
    try {
      val target = Bench.writeNew(detail, requested)
      System.err.println(s"[doors] artifact persisted to $target")
    } catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[doors] could not persist $requested: $e") }
    spark.stop()
  }
}
