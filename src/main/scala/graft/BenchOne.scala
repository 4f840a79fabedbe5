package graft
/** Dev helper: time a subset of queries (args = names). */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32)
    args.foreach { name =>
      val t0 = System.nanoTime()
      // toRdd.count(): the Bench rule — count() lets Catalyst prune
      // zero-filled card plans down to their LocalRelation
      val n = SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      println(s"[benchone] $name rows=$n t=${Bench.fmt3((System.nanoTime() - t0) / 1e9)} s")
    }
    spark.stop()
  }
}

/** Shuffle-byte meter (r15 verdict item 6): the multimodal exchange's
  * cluster cost was argued in single-box SECONDS with the network
  * caveat stated; what a cluster fabric actually pays is shuffle
  * BYTES. A SparkListener accumulates per-stage shuffle write/read
  * bytes over one run of a plan — deterministic for a fixed plan, so
  * one untimed run measures it without perturbing the timed reps. */
object ShuffleBytes {
  private final class Acc extends org.apache.spark.scheduler.SparkListener {
    val written = new java.util.concurrent.atomic.AtomicLong
    val read = new java.util.concurrent.atomic.AtomicLong
    override def onStageCompleted(
        sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
      val m = sc.stageInfo.taskMetrics
      if (m != null) {
        written.addAndGet(m.shuffleWriteMetrics.bytesWritten)
        read.addAndGet(m.shuffleReadMetrics.totalBytesRead)
      }
    }
  }

  /** (shuffleWriteBytes, shuffleReadBytes) across every stage `fn`
    * runs. The bus is drained BEFORE attaching too: a backlogged
    * AsyncEventQueue would otherwise deliver the preceding timed
    * runs' queued stage events into the fresh listener and inflate
    * the counts (review finding, r16). */
  def measure(spark: org.apache.spark.sql.SparkSession, fn: () => Unit): (Long, Long) = {
    org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
    val acc = new Acc
    spark.sparkContext.addSparkListener(acc)
    try {
      fn()
      org.apache.spark.graft.ListenerBridge.waitUntilEmpty(spark.sparkContext)
      (acc.written.get(), acc.read.get())
    } finally spark.sparkContext.removeSparkListener(acc)
  }
}

/** PQ-family cost split: model-training constant vs scan/search work.
  * The q76-q78/q81 bench figures are dominated by the per-query model
  * training (bounded sample + small Lloyd jobs) that a deployment pays
  * ONCE per index build — this prints the split so optimization effort
  * targets the right half. Warm medians over SPARK_GRAFT_REPS. */
object BenchPqSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val emb = Tables.embeddings(spark, sfDir)
    // med returns the warmup run's value too, so callers that need the
    // trained artifact don't pay one more untimed training for it
    def med[A](fn: () => A): (Double, A) = {
      val warm = fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      (ts(ts.length / 2), warm)
    }
    val (tIvf, _) = med(() => Similarity.ivfCentroids(emb, 16))
    val (tBooks, books) = med(() => Similarity.pqCodebooks(emb))
    val (tEncode, _) = med(() => Similarity.pqEncodeWithModel(emb, books).queryExecution.toRdd.count())
    val (tFull, _) = med(() => Similarity.pqEncode(emb).queryExecution.toRdd.count())
    val (tAdc, _) = med(() => Similarity.pqAdcSearch(emb).queryExecution.toRdd.count())
    val (tIvfPq, _) = med(() => Similarity.knnIvfPq(emb).queryExecution.toRdd.count())
    val (tRpq, _) = med(() => Similarity.knnIvfRpq(emb).queryExecution.toRdd.count())
    import Bench.fmt3
    println(s"""{"ivf_train_s":${fmt3(tIvf)},"pq_train_s":${fmt3(tBooks)},""" +
      s""""encode_scan_s":${fmt3(tEncode)},"encode_full_s":${fmt3(tFull)},""" +
      s""""adc_search_s":${fmt3(tAdc)},"ivfpq_search_s":${fmt3(tIvfPq)},""" +
      s""""ivf_rpq_search_s":${fmt3(tRpq)},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** q103b stage split (the r12/r13 100×-knee hunt): times each stage of
  * the champion-list retrieval pipeline in isolation — chunk features,
  * posting rows, champion election, candidate join, full query — so a
  * knee attributes to a stage, not the whole plan. Arg = corpus dir
  * (defaults to the bench SF). */
object BenchRetrievalSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Corpus
    val dir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, dir)
    def t(label: String)(df: => org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(s"[retsplit] $label rows=$n t=${Bench.fmt3((System.nanoTime() - t0) / 1e9)} s")
    }
    t("warmup")(Corpus.probeCrows(docs.limit(1000)))
    t("cf")(Corpus.probeCf(docs))
    t("crows")(Corpus.probeCrows(docs))
    t("champs")(Corpus.probeChamps(docs))
    t("cands")(Corpus.probeCands(docs))
    t("full_q103b")(Corpus.chunkRetrievalPruned(docs))
    spark.stop()
  }
}

/** BOILERPLATE skew stress for the DEDUP elections (r12 item 9): the
  * q83/q31/q40/q42 winner elections are plan-pinned onto the
  * groupBy+join keyAggJoin shape (no hot-key window), but never
  * skew-MEASURED the way the event family is. Reassigns botPermille of
  * all documents to ONE shared text — one fingerprint/shingle class
  * duplicated across up to half the corpus — and times the dedup
  * family at 0/100/300/500‰. A map-side-combined election should be
  * near-flat; a serialized hot class would blow up linearly in the
  * class size. */
object BenchSkewDocs {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(32)
    val base = Tables.documents(spark, sfDir)
    val boiler = "the quick brown fox jumped over the lazy dog and then " +
      "jumped over the lazy dog once more for good measure"
    def skewView(permille: Int) =
      if (permille == 0) base
      else base.withColumn("text",
        when(pmod(col("doc_id"), lit(1000)) < permille, lit(boiler))
          .otherwise(col("text")))
    def med(fn: () => Unit): Double = {
      fn()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    import Bench.fmt3
    val rows = Seq(0, 100, 300, 500).map { pm =>
      val d = skewView(pm)
      val tFp = med(() =>
        { TextAnalysis.fingerprint(d).queryExecution.toRdd.count(); () })
      val tBlock = med(() =>
        { Dedup.blockDedup(d).queryExecution.toRdd.count(); () })
      val tMinhash = med(() =>
        { Dedup.minhashProfile(d).queryExecution.toRdd.count(); () })
      val tApply = med(() =>
        { TextAnalysis.dedupedCorpus(d).queryExecution.toRdd.count(); () })
      s""""pm$pm":{"q40_fingerprint_s":${fmt3(tFp)},"q83_block_s":${fmt3(tBlock)},""" +
        s""""q31_minhash_s":${fmt3(tMinhash)},"q42_apply_s":${fmt3(tApply)}}"""
    }
    println(s"""{"metric":"boilerplate_skew","reps":$reps,"sf":"$sfDir",""" +
      rows.mkString(",") + "}")
    spark.stop()
  }
}

/** Statistical microbench: WARM medians over SPARK_GRAFT_REPS runs per
  * query (args = names; no args = full inventory). Single-shot
  * timings on a shared box are load-noise-dominated — medians are what
  * to trust when comparing operator variants. Prints one JSON line per
  * query. */
object BenchStats {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, sfDir).queryExecution.toRdd.count() // untimed warmup (plan+codegen)
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).queryExecution.toRdd.count() // the Bench toRdd rule
        (System.nanoTime() - t0) / 1e9
      }.sorted
      val med = ts(ts.length / 2)
      println(s"""{"query":"$name","median_s":${Bench.fmt3(med)},"min_s":${Bench.fmt3(ts.head)},""" +
        s""""max_s":${Bench.fmt3(ts.last)},"reps":$reps}""")
    }
    spark.stop()
  }
}

/** Segment-lifecycle cost split for q88b: the inventory bench prices
  * the FULL lifecycle per rep (segment writes + compaction + catalog
  * search) because it must create what it searches — a deployment pays
  * segment writes per micro-batch, compaction amortized on a schedule,
  * and the bucket-pruned search per query. This prints the three
  * phases separately so the search-only number is the one a scale
  * review grades (the BenchIdxSplit discipline applied to the Lucene
  * segment model). Warm medians over SPARK_GRAFT_REPS. */
object BenchSegSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Search
    import org.apache.spark.sql.functions.{col, lit, pmod}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val base = java.nio.file.Files.createTempDirectory("graft_seg_split_").toString
    def writeSegments(): Unit = Seq(0, 1).foreach { par =>
      val b = docs.filter(pmod(col("doc_id"), lit(2)) === par)
      Search.postingIndex(b).write.mode("overwrite").parquet(s"$base/index/seg=$par")
      Search.docCount(b).write.mode("overwrite").parquet(s"$base/meta/seg=$par")
    }
    val tSegs = med(() => writeSegments())
    var gen = 0
    val tCompact = med { () =>
      // fresh table name per rep: compaction overwrites a managed
      // table, and re-creating is the operation being priced
      gen += 1
      graft.sources.IndexCatalog.compactSegments(
        spark, s"$base/index", s"$base/meta", s"graft_segsplit_$gen")
    }
    val table = s"graft_segsplit_$gen"
    val tSearch = med(() =>
      graft.sources.IndexCatalog.searchPostings(spark, table).queryExecution.toRdd.count())
    import Bench.fmt3
    println(s"""{"segment_writes_s":${fmt3(tSegs)},"compact_s":${fmt3(tCompact)},""" +
      s""""search_s":${fmt3(tSearch)},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Index-maintenance cost split: BUILD (train models + full base
  * encode/write) vs MAINTAIN (delta encode + partition-scoped merge).
  * The q82 inventory bench necessarily prices a full build + a merge
  * per rep (it must create the index it maintains); a deployment pays
  * the build once and the maintain delta per batch — this prints the
  * split so the maintain-only number is the one a scale review grades.
  * The merge rep re-applies the same delta (idempotent by vec_id key),
  * which performs the same touched-cell read+union+rewrite each time.
  * Warm medians over SPARK_GRAFT_REPS. */
object BenchIdxSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.{MergeWriter, Similarity}
    import org.apache.spark.sql.functions.{col, reverse}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val (m, dim, nCells) = (8, 64, 16)
    val spark = GraftSession.local(32)
    val emb = Tables.embeddings(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val cents = Similarity.ivfCentroids(emb, nCells)
    val (_, books) = Similarity.rpqModels(emb, cents, m, dim)
    val tTrain = med { () =>
      val c = Similarity.ivfCentroids(emb, nCells)
      Similarity.rpqModels(emb, c, m, dim); ()
    }
    val dir = java.nio.file.Files.createTempDirectory("graft_idx_split_").toString + "/index"
    val tBuild = med { () =>
      Similarity.pqResidualEncodeWithModel(emb, cents, books, m, dim)
        .hint("rebalance", "cell")
        .write.mode("overwrite").partitionBy("cell").parquet(dir)
    }
    val delta = emb.filter(col("vec_id") < 500)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val tMaintain = med { () =>
      MergeWriter.applyToPartitioned(spark, dir,
        Similarity.pqResidualEncodeWithModel(delta, cents, books, m, dim),
        "vec_id", "cell")
    }
    // deployment-shaped case: at the q82 constants (16 cells) ANY
    // uniform delta touches every cell, so partition scoping can't
    // prune and maintain necessarily costs ≥ a rebuild at this SF. With
    // a realistic cell count and a small batch, the merge reads and
    // rewrites only the touched fraction — this pair shows the
    // crossover the 100 TB story rests on.
    val nCellsBig = 256
    val centsBig = Similarity.ivfCentroids(emb, nCellsBig)
    val (_, booksBig) = Similarity.rpqModels(emb, centsBig, m, dim)
    val dirBig = java.nio.file.Files.createTempDirectory("graft_idx_split_").toString + "/index"
    val tBuildBig = med { () =>
      Similarity.pqResidualEncodeWithModel(emb, centsBig, booksBig, m, dim)
        .hint("rebalance", "cell")
        .write.mode("overwrite").partitionBy("cell").parquet(dirBig)
    }
    val deltaSmall = emb.filter(col("vec_id") < 50)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        reverse(col("embedding")).as("embedding"))
    val tMaintainBig = med { () =>
      MergeWriter.applyToPartitioned(spark, dirBig,
        Similarity.pqResidualEncodeWithModel(deltaSmall, centsBig, booksBig, m, dim),
        "vec_id", "cell")
    }
    import Bench.fmt3
    println(s"""{"train_s":${fmt3(tTrain)},"base_build_s":${fmt3(tBuild)},""" +
      s""""maintain_s":${fmt3(tMaintain)},"cells":$nCells,""" +
      s""""base_build_${nCellsBig}c_s":${fmt3(tBuildBig)},""" +
      s""""maintain_50row_${nCellsBig}c_s":${fmt3(tMaintainBig)},""" +
      s""""reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Decode-once report-frame cost split: what the text family costs as
  * 14 standalone corpus scans vs ONE frame build + 14 views over the
  * persisted narrow parquet. Model training (rarity/LM/DSIR — paid
  * once per release, the frozen-model contract) is timed separately.
  * Warm medians over SPARK_GRAFT_REPS. */
object BenchReportSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.{Corpus, Dsir, Frequency, LmScreen, TextAnalysis}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val rates = Seq("en" -> 8000, "de" -> 6000)
    // model training — once per release
    var rar: (Map[String, Long], Long) = null
    var lm: LmScreen.LmModel = null
    var ds: Dsir.DsirModel = null
    val tModels = med { () =>
      rar = Frequency.rarityModel(docs); lm = LmScreen.lmModel(docs)
      ds = Dsir.dsirModel(docs)
    }
    // the 14 standalone operators, each its own corpus scan
    val standalone: Seq[() => Long] = Seq(
      () => TextAnalysis.langId(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.contentMetadataCheck(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.qualityScore(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.tokenCounts(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.repetitionScreen(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.fingerprint(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.exactDedup(docs).queryExecution.toRdd.count(),
      () => TextAnalysis.dedupedCorpus(docs).queryExecution.toRdd.count(),
      () => Corpus.datasetSplit(docs, 1000, 1000).queryExecution.toRdd.count(),
      () => Frequency.rarityScreen(docs).queryExecution.toRdd.count(),
      () => LmScreen.lmScreen(docs).queryExecution.toRdd.count(),
      () => Dsir.dsirWeights(docs).queryExecution.toRdd.count(),
      () => Corpus.corpusPipeline(docs, rates, 5000, 4000L).queryExecution.toRdd.count(),
      () => Corpus.corpusCard(docs, rates, 5000).queryExecution.toRdd.count())
    val tStandalone = med(() => standalone.foreach(_.apply()))
    // ONE frame build + persist
    val dir = java.nio.file.Files.createTempDirectory("graft_report_").toString + "/frame"
    val tBuild = med { () =>
      TextAnalysis.docReport(docs, rar, lm, ds)
        .write.mode("overwrite").parquet(dir)
    }
    val frame = spark.read.parquet(dir)
    // the same 14 results as views over the persisted frame
    val views: Seq[() => Long] = Seq(
      () => TextAnalysis.reportLangId(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportContentCheck(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportQuality(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportTokenCounts(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportRepetition(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportFingerprint(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportExactDedup(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportDedupApply(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportDatasetSplit(frame, 1000, 1000).queryExecution.toRdd.count(),
      () => TextAnalysis.reportRarity(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportLmScreen(frame).queryExecution.toRdd.count(),
      () => TextAnalysis.reportDsir(frame).queryExecution.toRdd.count(),
      () => Corpus.reportCorpusPipeline(frame, rates, 5000, 4000L).queryExecution.toRdd.count(),
      () => Corpus.reportCorpusCard(frame, rates, 5000).queryExecution.toRdd.count())
    val tViews = med(() => views.foreach(_.apply()))
    import Bench.fmt3
    println(s"""{"model_train_s":${fmt3(tModels)},""" +
      s""""standalone_14ops_s":${fmt3(tStandalone)},""" +
      s""""frame_build_persist_s":${fmt3(tBuild)},""" +
      s""""views_14ops_s":${fmt3(tViews)},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** Cluster-curation cost split: the k-means TRAINING constant vs each
  * q104-family operator under the frozen model, plus the vecReport
  * frame build. The inventory entries re-train per query by contract
  * (self-contained oracles); a deployment trains once per release and
  * pays only the frozen-model half per refresh — this prints the
  * split so the per-operation number is the one a scale review
  * grades. Warm medians over SPARK_GRAFT_REPS. */
/** q108 cost split: the inventory entry prices store collapse + probe
  * per rep (the self-contained oracle contract); a deployment builds
  * the collapsed stores once per release, persists them, and pays ONLY
  * the probe per ingest batch. Prints both numbers — the probe side
  * reads the persisted store parquet, the frozen-artifact shape. */
object BenchRelSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Dedup
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    val inc = Dedup.ingestView(docs)
    def med(fn: () => Unit): Double = {
      fn()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_relstore")
    val (fpS, bandS) = Dedup.releaseStores(docs)
    fpS.write.mode("overwrite").parquet(s"$tmp/fp")
    bandS.write.mode("overwrite").parquet(s"$tmp/band")
    val fpP = spark.read.parquet(s"$tmp/fp")
    val bandP = spark.read.parquet(s"$tmp/band")
    val tBuild = med(() => {
      val (a, b) = Dedup.releaseStores(docs)
      a.queryExecution.toRdd.count(); b.queryExecution.toRdd.count(); ()
    })
    val tProbe = med(() =>
      { Dedup.releaseDedupWithStores(fpP, bandP, inc).queryExecution.toRdd.count(); () })
    import Bench.fmt3
    println(s"""{"store_build_s":${fmt3(tBuild)},"probe_s":${fmt3(tProbe)},""" +
      s""""reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** q118 cost split: the inventory entry prices BOTH upstream span
  * scans (q107b duplication + q113 contamination) per rep because the
  * oracle contract is self-contained; a deployment persists each
  * screen's cut list when it runs and pays only the cut-sized
  * union+fold to combine them. Prints the upstream-scan and
  * combine-only numbers so the compose cost is the one a scale review
  * grades (the BenchSegSplit/BenchRelSplit accounting discipline). */
object BenchCutSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Dedup
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val tmp = java.nio.file.Files.createTempDirectory("graft_cutsplit")
    Dedup.spanCutSpans(docs).write.mode("overwrite").parquet(s"$tmp/dup")
    Dedup.contaminationSpans(docs).write.mode("overwrite").parquet(s"$tmp/contam")
    val dupP = spark.read.parquet(s"$tmp/dup")
    val contamP = spark.read.parquet(s"$tmp/contam")
    // toRdd.count(): the Bench rule — Dataset.count() lets Catalyst
    // prune the real plan (drop final sort/projection), which would
    // price these legs inconsistently with the BENCH numbers
    val tUpstream = med(() => {
      Dedup.spanCutSpans(docs).queryExecution.toRdd.count()
      Dedup.contaminationSpans(docs).queryExecution.toRdd.count(); ()
    })
    val tCombine = med(() => {
      Dedup.combineCutLists(dupP, contamP).queryExecution.toRdd.count(); () })
    import Bench.fmt3
    println(s"""{"upstream_scans_s":${fmt3(tUpstream)},"combine_s":${fmt3(tCombine)},""" +
      s""""reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

object BenchClusterSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Similarity
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    val emb = Tables.embeddings(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    val cents = Similarity.ivfCentroids(emb, 16)
    val books = Similarity.pqCodebooks(emb)
    val tTrain = med(() => { Similarity.ivfCentroids(emb, 16); () })
    val tCards = med(() =>
      { Similarity.clusterCardsWithModel(docs, emb, cents).queryExecution.toRdd.count(); () })
    val tSample = med(() =>
      { Similarity.clusterSampleWithModel(emb, cents).queryExecution.toRdd.count(); () })
    val tSemDedup = med(() =>
      { Similarity.semanticDedupCellsWithModel(emb, cents).queryExecution.toRdd.count(); () })
    val tReport = med(() =>
      { Similarity.vecReportWithModels(emb, cents, books).queryExecution.toRdd.count(); () })
    import Bench.fmt3
    println(s"""{"ivf_train_s":${fmt3(tTrain)},"cards_frozen_s":${fmt3(tCards)},""" +
      s""""sample_frozen_s":${fmt3(tSample)},"semdedup_frozen_s":${fmt3(tSemDedup)},""" +
      s""""vecreport_frozen_s":${fmt3(tReport)},"reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** q125/q125b cost split: self-contained derivation vs the audit over
  * PERSISTED frames. The inventory entries re-derive candidates +
  * labels per rep because the oracle contract is self-contained; a
  * deployment persists the scored edges and the cluster labels when
  * the dedup pass computes them and pays only the edge-sized rollup /
  * CC re-label — the BenchSegSplit/BenchRelSplit/BenchCutSplit
  * accounting discipline applied to the cluster-trust family. */
object BenchAuditSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Dedup
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    // persist the frames a deployment would have on disk already
    val tmp = java.nio.file.Files.createTempDirectory("graft_auditsplit")
    val edges = Dedup.minhashCandidatePairs(docs)
    val sets = docs.select(col("doc_id"),
      Dedup.shingleSet(col("text"), 3).as("sh"))
    edges
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("(10000 * CAST(size(array_intersect(sh_a, sh_b)) AS BIGINT)) DIV " +
          "nullif(CAST(size(array_union(sh_a, sh_b)) AS BIGINT), 0)")
          .as("jaccard_bp"))
      .write.mode("overwrite").parquet(s"$tmp/scored")
    val scoredP = spark.read.parquet(s"$tmp/scored")
    Dedup.propagateLabels(docs, edges)
      .write.mode("overwrite").parquet(s"$tmp/labels")
    val labelsP = spark.read.parquet(s"$tmp/labels")
    val tFull125 = med(() =>
      { Dedup.clusterQualityAudit(docs).queryExecution.toRdd.count(); () })
    val tFrames125 = med(() => {
      Dedup.clusterQualityFromFrames(
        scoredP.select("doc_a", "jaccard_bp"), labelsP)
        .queryExecution.toRdd.count(); () })
    val tFull125b = med(() =>
      { Dedup.verifiedClusters(docs).queryExecution.toRdd.count(); () })
    val tEdges125b = med(() => {
      Dedup.verifiedClustersFromEdges(docs,
        scoredP.filter(col("jaccard_bp") >= Dedup.VerifiedEdgeBp)
          .select("doc_a", "doc_b"))
        .queryExecution.toRdd.count(); () })
    import Bench.fmt3
    println(s"""{"q125_full_s":${fmt3(tFull125)},"q125_frames_s":${fmt3(tFrames125)},""" +
      s""""q125b_full_s":${fmt3(tFull125b)},"q125b_edges_s":${fmt3(tEdges125b)},""" +
      s""""reps":$reps,"sf":"$sfDir"}""")
    spark.stop()
  }
}

/** BOT-USER skew stress: the one stated-but-unmeasured hot-key caveat
  * left (q135's user-keyed lag window and q130's per-user min chain
  * concentrate one user's events in one task). Reassigns botPermille
  * of all events to ONE user id and times the per-user-sequence
  * operators at 0/100/300/500‰ — the honest measurement of what a
  * crawler/bot account costs these plans at a fixed corpus size. */
object BenchSkew {
  def main(args: Array[String]): Unit = {
    import graft.operators.EventOps
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(32)
    val base = Tables.events(spark, sfDir)
    val BotUser = 424242424242L
    def botView(permille: Int) =
      if (permille == 0) base
      else base.withColumn("user_id",
        when(pmod(col("event_id"), lit(1000)) < permille, lit(BotUser))
          .otherwise(col("user_id")))
    def med(fn: () => Unit): Double = {
      fn()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    import Bench.fmt3
    val rows = Seq(0, 100, 300, 500).map { pm =>
      val ev = botView(pm)
      val tTrans = med(() =>
        { EventOps.eventTransitions(ev).queryExecution.toRdd.count(); () })
      val tTransWin = med(() =>
        { EventOps.eventTransitionsWindowed(ev).queryExecution.toRdd.count(); () })
      val tFunnel = med(() =>
        { EventOps.funnel(ev).queryExecution.toRdd.count(); () })
      val tUsers = med(() =>
        { EventOps.funnelUsers(ev).queryExecution.toRdd.count(); () })
      s""""pm$pm":{"transitions_s":${fmt3(tTrans)},""" +
        s""""transitions_windowed_s":${fmt3(tTransWin)},""" +
        s""""funnel_s":${fmt3(tFunnel)},"funnel_users_s":${fmt3(tUsers)}}"""
    }
    println(s"""{"metric":"bot_skew","bot_user":$BotUser,"reps":$reps,""" +
      s""""sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}

/** HOT-PART skew stress for the annotation push (r14): q140's computed
  * frame is a (partkey, compartment) groupBy — the keyAggJoin family
  * whose map-side combine absorbed a half-corpus hot key in the
  * BenchSkewDocs rows. Reassigns botPermille of all lineitem rows to
  * ONE part key and times annotationPush at 0/100/300/500‰: a
  * map-side-combined aggregate should be near-flat; a serialized hot
  * (part, compartment) class would grow linearly in the class size. */
object BenchSkewPush {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.functions._
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val spark = GraftSession.local(32)
    val part = Tables.part(spark, sfDir)
    val base = Tables.lineitem(spark, sfDir)
    val HotPart = 1L
    def hotView(permille: Int) =
      if (permille == 0) base
      else base.withColumn("l_partkey",
        when(pmod(col("l_orderkey") * 10 + col("l_linenumber"), lit(1000)) < permille,
          lit(HotPart)).otherwise(col("l_partkey")))
    def med(fn: () => Unit): Double = {
      fn()
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    import Bench.fmt3
    val rows = Seq(0, 100, 300, 500).map { pm =>
      val li = hotView(pm)
      val t = med(() =>
        { graft.operators.Curation.annotationPush(part, li).queryExecution.toRdd.count(); () })
      s""""pm$pm":{"q140_push_s":${fmt3(t)}}"""
    }
    println(s"""{"metric":"hot_part_skew","hot_part":$HotPart,"reps":$reps,""" +
      s""""sf":"$sfDir",${rows.mkString(",")}}""")
    spark.stop()
  }
}

/** Multimodal cost split (r15, verdict items 1/8): (a) the three
  * standalone q41-family operators, each its own payload decode scan,
  * vs ONE mediaReport build + the three views over the persisted
  * narrow frame — the decode-once deployment number; (b) the
  * skew-evening repartition PRICED: q41 with the payload-sized
  * exchange vs the on-read-partitioning form (identical result, the
  * exchange placement is the only difference) — the one plan in the
  * engine that shuffles blobs, measured instead of argued. Warm
  * medians over SPARK_GRAFT_REPS. */
object BenchMediaSplit {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "5").toInt
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    // the three standalone operators — three payload scans
    val tStandalone = med { () =>
      Multimodal.extractFeatures(docs).queryExecution.toRdd.count()
      Multimodal.frameSampleManifest(docs).queryExecution.toRdd.count()
      Multimodal.resizedFeatures(docs).queryExecution.toRdd.count(); ()
    }
    // ONE decode-once frame build + persist
    val dir = java.nio.file.Files.createTempDirectory("graft_media_").toString + "/frame"
    val tBuild = med { () =>
      Multimodal.mediaReport(docs).write.mode("overwrite").parquet(dir)
    }
    val frame = spark.read.parquet(dir)
    // the same three results as views over the persisted narrow frame
    val tViews = med { () =>
      Multimodal.reportFeatures(frame).queryExecution.toRdd.count()
      Multimodal.reportFrameSamples(frame).orderBy("doc_id", "frame_idx")
        .queryExecution.toRdd.count()
      Multimodal.reportResizedFeatures(frame).queryExecution.toRdd.count(); ()
    }
    // the payload-sized exchange, priced: with vs without
    val tWith = med(() =>
      { Multimodal.extractFeatures(docs).queryExecution.toRdd.count(); () })
    val tWithout = med(() =>
      { Multimodal.extractFeaturesNoShuffle(docs).queryExecution.toRdd.count(); () })
    import Bench.fmt3
    println(s"""{"standalone_3ops_s":${fmt3(tStandalone)},""" +
      s""""frame_build_persist_s":${fmt3(tBuild)},""" +
      s""""views_3ops_s":${fmt3(tViews)},""" +
      s""""q41_with_repartition_s":${fmt3(tWith)},""" +
      s""""q41_no_shuffle_s":${fmt3(tWithout)},""" +
      s""""reps":$reps,"sf":"$sfDir","loadavg":"${Bench.loadavg()}"}""")
    spark.stop()
  }
}

/** Multimodal PAYLOAD-SIZE decade (r15, verdict item 1): the 100 TB
  * multimodal cost is payload BYTES (the fixture's ~700 B payloads
  * leave even a 100× ROW decade overhead-dominated — measured flat in
  * SCALE_CURVE_r15), so this sweeps the payload-size multiplier at
  * fixed row count (image/video bytes grow ≈ scale²) and prices the
  * blob-shuffling repartition at each point: with vs without, plus
  * the decode-only floor. Linear-in-bytes growth of both forms and a
  * stable with/without ratio = the exchange scales; a knee in the
  * ratio = replace it with on-read partitioning. Warm medians over
  * SPARK_GRAFT_REPS. */
object BenchMediaScale {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.{col, length, sum}
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val scales = sys.env.getOrElse("SPARK_GRAFT_MEDIA_SCALES", "1,4,16")
      .split(',').map(_.trim.toInt).toSeq
    val spark = GraftSession.local(32)
    val docs = Tables.documents(spark, sfDir)
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    import Bench.fmt3
    val rows = scales.map { s =>
      val bytes = Multimodal.mediaFrame(docs, s)
        .agg(sum(length(col("content")))).collect()(0).getLong(0)
      val tWith = med(() => { Multimodal.extractFeaturesScaled(docs, s, withRepartition = true)
        .queryExecution.toRdd.count(); () })
      val tWithout = med(() => { Multimodal.extractFeaturesScaled(docs, s, withRepartition = false)
        .queryExecution.toRdd.count(); () })
      // r16 (verdict item 6): the fabric's actual price — shuffle
      // WRITE bytes per form, one untimed metered run each (plan-
      // deterministic). with−without ≈ the blob exchange's payload.
      val (swWith, _) = ShuffleBytes.measure(spark, () =>
        { Multimodal.extractFeaturesScaled(docs, s, withRepartition = true)
          .queryExecution.toRdd.count(); () })
      val (swWithout, _) = ShuffleBytes.measure(spark, () =>
        { Multimodal.extractFeaturesScaled(docs, s, withRepartition = false)
          .queryExecution.toRdd.count(); () })
      s""""x$s":{"payload_mb":${fmt3(bytes / 1048576.0)},""" +
        s""""with_repartition_s":${fmt3(tWith)},"no_shuffle_s":${fmt3(tWithout)},""" +
        s""""shuffle_mb_with":${fmt3(swWith / 1048576.0)},""" +
        s""""shuffle_mb_without":${fmt3(swWithout / 1048576.0)}}"""
    }
    println(s"""{"metric":"media_payload_decade","reps":$reps,"sf":"$sfDir",""" +
      s""""loadavg":"${Bench.loadavg()}",${rows.mkString(",")}}""")
    spark.stop()
  }
}

/** HOT-BLOB skew arm for the multimodal exchange (r15): BenchMediaScale
  * prices the repartition under UNIFORM payloads (~11% premium when
  * byte-dominated); this measures the scenario the exchange EXISTS
  * for — 1% of documents carrying ~1000×-sized payloads, either
  * SPREAD through the id space or CLUSTERED at its head (adjacent ids
  * share input splits, so without the exchange one scan task decodes
  * nearly all oversized payloads and the job waits on its tail).
  * The synthesis leg stands in for the scan and cannot be evened (you
  * read bytes where they live); the exchange evens the DECODE — the
  * measured delta is that benefit. Warm medians over
  * SPARK_GRAFT_REPS. */
object BenchMediaSkew {
  def main(args: Array[String]): Unit = {
    import graft.operators.Multimodal
    import org.apache.spark.sql.functions.col
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "3").toInt
    val permille = sys.env.getOrElse("SPARK_GRAFT_HOT_PERMILLE", "10").toInt
    val hotScale = sys.env.getOrElse("SPARK_GRAFT_HOT_SCALE", "32").toInt
    val decodeReps = sys.env.getOrElse("SPARK_GRAFT_DECODE_REPS", "8").toInt
    val spark = GraftSession.local(32)
    // a REALISTIC input layout: the bench parquet is one 0.6 MB file =
    // ONE input split, which degenerates every clustering question
    // (everything is "clustered" in the only split). Re-write it as 32
    // range-partitioned files and size maxPartitionBytes so each file
    // is its own split — now doc_id < 1% genuinely means "all hot
    // blobs live in input split 0", the layout a crawler's
    // newest-first dump produces at 100 TB.
    // ONE-FILE-PER-SPLIT forced by the packing rule itself, not by
    // defaultParallelism's bytesPerCore arithmetic: write the ranged
    // layout, then set BOTH maxPartitionBytes AND openCostInBytes to
    // exactly the largest file size. maxSplitBytes =
    // min(maxPartitionBytes, max(openCost, bytesPerCore)) is then
    // maxFile unconditionally (bytesPerCore can no longer shrink it),
    // no file splits (every file ≤ maxFile), and no two files pack
    // (any second file costs size + openCost > maxFile) — review
    // finding r16: the earlier openCost = maxFile/2+1 left
    // maxSplitBytes hostage to bytesPerCore on skewed layouts. The
    // loud 32-split assert stays as the backstop.
    val ranged = java.nio.file.Files.createTempDirectory("graft_media_skew_").toString + "/docs"
    Tables.documents(spark, sfDir).repartitionByRange(32, col("doc_id"))
      .write.mode("overwrite").parquet(ranged)
    val rp = new org.apache.hadoop.fs.Path(ranged)
    val maxFile = rp.getFileSystem(spark.sparkContext.hadoopConfiguration)
      .listStatus(rp).filter(_.getPath.getName.endsWith(".parquet"))
      .map(_.getLen).max
    spark.conf.set("spark.sql.files.maxPartitionBytes", maxFile.toString)
    spark.conf.set("spark.sql.files.openCostInBytes", maxFile.toString)
    val docs = spark.read.parquet(ranged)
    require(docs.rdd.getNumPartitions == 32,
      s"BenchMediaSkew needs the 32-file ranged layout to scan as 32 input " +
        s"splits, got ${docs.rdd.getNumPartitions} (maxPartitionBytes=$maxFile)")
    def med(fn: () => Unit): Double = {
      fn() // untimed warmup
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime(); fn(); (System.nanoTime() - t0) / 1e9
      }.sorted
      ts(ts.length / 2)
    }
    import Bench.fmt3
    val cells = for (clustered <- Seq(false, true); withRep <- Seq(true, false)) yield {
      val t = med(() => { Multimodal.extractFeaturesHotBlobs(
        docs, permille, hotScale, clustered, withRep, decodeReps)
        .queryExecution.toRdd.count(); () })
      // one untimed metered run: the fabric bytes this cell's plan ships
      val (sw, _) = ShuffleBytes.measure(spark, () =>
        { Multimodal.extractFeaturesHotBlobs(
          docs, permille, hotScale, clustered, withRep, decodeReps)
          .queryExecution.toRdd.count(); () })
      val name = (if (clustered) "clustered" else "spread") +
        (if (withRep) "_with_repartition" else "_no_shuffle")
      s""""$name":{"s":${fmt3(t)},"shuffle_mb":${fmt3(sw / 1048576.0)}}"""
    }
    println(s"""{"metric":"media_hot_blob_skew","hot_permille":$permille,""" +
      s""""hot_scale":$hotScale,"decode_reps":$decodeReps,""" +
      s""""input_splits":${docs.rdd.getNumPartitions},"reps":$reps,"sf":"$sfDir",""" +
      s""""loadavg":"${Bench.loadavg()}",${cells.mkString(",")}}""")
    spark.stop()
  }
}

/** dev: print a query's executed plan (args: queryName [sfDir]). */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args.head
    val dir = args.lift(1).getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.local(8)
    val df = SparkEntry.queries(name)(spark, dir)
    df.queryExecution.toRdd.count()
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
