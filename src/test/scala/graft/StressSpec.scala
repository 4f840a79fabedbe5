package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Larger-SF stress of the iterative operators: invariant checks at
  * sf0.1 (the largest local testdata), where the duplicate-component
  * structure is richer than the unit fixtures. These are the
  * oracle-free guards: properties that must hold for ANY corpus, so
  * they keep holding at scales where no oracle can be computed.
  */
class StressSpec extends AnyFunSuite {
  import TestSpark._

  test("near-dup clusters at sf0.1 satisfy the component invariants") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val out = Dedup.nearDupClusters(docs).cache()
    try {
      assert(out.count() == docs.count(), "every doc labeled exactly once")
      // every candidate edge's endpoints agree on the cluster — the
      // defining connected-component property the fixpoint guarantees
      val lab = out.select(col("doc_id"), col("cluster_id"))
      val split = Dedup.minhashCandidatePairs(docs)
        .join(lab.select(col("doc_id").as("doc_a"), col("cluster_id").as("ca")), Seq("doc_a"))
        .join(lab.select(col("doc_id").as("doc_b"), col("cluster_id").as("cb")), Seq("doc_b"))
        .filter(col("ca") =!= col("cb"))
      assert(split.isEmpty, "no candidate edge may straddle two clusters")
      // each cluster is named by its minimum member, which is the one
      // self-labeled canonical
      val bad = out.groupBy("cluster_id")
        .agg(min(col("doc_id")).as("min_id"),
          sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canon"))
        .filter(col("min_id") =!= col("cluster_id") || col("n_canon") =!= 1L)
      assert(bad.isEmpty, "cluster id = min member with exactly one canonical")
    } finally out.unpersist()
  }

  test("decontamination at sf0.1 covers the corpus split exactly once") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val out = Dedup.decontaminate(docs)
    val nBench = docs.filter(
      col("doc_id") % Dedup.BenchmarkMod === 0 && col("doc_id") < Dedup.BenchmarkMaxId).count()
    assert(out.count() == docs.count() - nBench,
      "one verdict row per corpus (non-benchmark) doc")
    // contamination shares are well-formed
    assert(out.filter(col("contam_bp") < 0 || col("contam_bp") > 10000).isEmpty)
    assert(out.filter(col("is_contaminated") =!= (col("n_shared") > 0)).isEmpty)
  }

  test("pack manifest at sf0.1 satisfies the packing invariants") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val ctx = 512L
    val m = graft.operators.Corpus.packManifest(docs, ctx).cache()
    try {
      assert(m.count() == docs.count(), "one manifest row per document")
      // offsets live inside a sequence; ids are non-negative
      assert(m.filter(col("seq_offset") < 0 || col("seq_offset") >= ctx).isEmpty)
      assert(m.filter(col("seq_id") < 0).isEmpty)
      // per language, the highest sequence id is exactly the one the
      // total token stream length dictates — no gaps at the top, no
      // overflow: (total - 1) DIV ctx when every doc starts in-range
      val bad = m.groupBy("lang")
        .agg(max(col("seq_id")).as("max_seq"),
          sum(col("n_tokens")).as("total_tokens"),
          max(col("seq_id") * ctx + col("seq_offset")).as("max_start"))
        .filter(col("max_start") >= col("total_tokens")
          || col("max_seq") > expr(s"(total_tokens - 1) DIV $ctx"))
      assert(bad.isEmpty, "sequence ids must track the cumulative token stream")
      // straddle flag consistency: a doc straddles iff its tokens cross
      // the next cut
      val inconsistent = m.filter(
        col("straddles") =!= (col("seq_offset") + greatest(col("n_tokens"), lit(1L)) > ctx))
      assert(inconsistent.isEmpty, "straddle flag must match offset+len vs ctx")
    } finally m.unpersist()
  }

  test("event-time corpus screen soak at sf0.1 on RocksDB: bounded state across restarts") {
    // the state-store soak at the largest local SF (no sf1 testdata
    // exists): 5000 docs streamed in three staged runs with TWO real
    // checkpoint restarts between them, on the production state-store
    // configuration (RocksDB + changelog checkpointing). Event time is
    // spread at 10s/doc so the 1-hour dedup watermark covers only ~360
    // docs — the run exercises real eviction, and the final state must
    // be bounded by the WATERMARK HORIZON, not the corpus size.
    import spark.implicits._
    import org.apache.spark.sql.streaming.Trigger
    val confs = Seq(
      "spark.sql.streaming.stateStore.providerClass" ->
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
      "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled" -> "true")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    val base = java.nio.file.Files.createTempDirectory("graft_soak")
    val srcDir = base.resolve("src").toString
    val outDir = base.resolve("out").toString
    val ckpt = base.resolve("ckpt").toString
    val epochUs = 1600000000000000L
    def ts(idCol: org.apache.spark.sql.Column) =
      timestamp_micros(idCol * 10000000L + epochUs)
    try {
      val docs = Tables.documents(spark, "/root/testdata/sf0.1").cache()
      // picks must be corpus-unique by fingerprint AND screen-passing,
      // so their dedup outcome is decided ONLY by the injected copies
      val uniq = graft.operators.TextAnalysis.fingerprint(docs)
        .filter(col("n_same_fingerprint") === 1)
        .select("doc_id").as[Long].collect().toSet
      val ok = graft.operators.Corpus.withScreenColumns(docs, Seq("en" -> 10000), 10000)
        .filter(col("is_quality") && col("sampled"))
        .select("doc_id").as[Long].collect().toSet
      val earlyIds = (100L to 999L).filter(i => uniq(i) && ok(i)).take(10)
      val tailIds = (1700L to 1999L).filter(i => uniq(i) && ok(i)).takeRight(10)
      assert(earlyIds.size == 10 && tailIds.size == 10, "fixture picks must exist")

      def stageRange(lo: Long, hi: Long): Unit =
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi)
          .withColumn("ingest_ts", ts(col("doc_id")))
          .coalesce(2).write.mode("append").parquet(srcDir)
      // duplicate CONTENT under fresh ids, arriving at the stream head
      def stageCopies(ids: Seq[Long], newBase: Long, atSec: Long): Unit =
        docs.filter(col("doc_id").isin(ids: _*))
          .withColumn("doc_id", col("doc_id") + newBase)
          .withColumn("ingest_ts", timestamp_micros(lit(atSec * 1000000L + epochUs)))
          .coalesce(1).write.mode("append").parquet(srcDir)

      var lastState: (Long, Long) = (0L, 0L) // (numRowsTotal, memoryUsedBytes)
      def run(): Set[Long] = {
        val q = graft.streaming.DocStreams.corpusScreenEventTime(
            graft.streaming.DocStreams.readDocStreamWithTs(spark, srcDir),
            Seq("en" -> 10000), 10000)
          .writeStream.outputMode("append")
          .format("parquet").option("path", outDir)
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow())
          .start()
        q.processAllAvailable(); q.stop()
        q.recentProgress.reverseIterator
          .find(_.stateOperators.nonEmpty)
          .foreach { p =>
            val so = p.stateOperators.head
            lastState = (so.numRowsTotal, so.memoryUsedBytes)
          }
        spark.read.parquet(outDir).select("doc_id").as[Long].collect().toSet
      }

      stageRange(0L, 2000L) // ts 0 .. 20000s
      val afterA = run()
      assert(afterA.size > 1500, s"stage A must pass most docs, got ${afterA.size}")
      val stateA = lastState
      // restart 1: watermark resumes at ~19990s-1h, so tail-of-A
      // fingerprints are IN state, early-A fingerprints are EVICTED
      stageRange(2000L, 3500L)
      stageCopies(tailIds, 90000L, atSec = 20000L)
      stageCopies(earlyIds, 91000L, atSec = 20000L)
      val afterB = run()
      assert(tailIds.forall(i => !afterB.contains(i + 90000L)),
        "in-horizon duplicate content must be dropped by RESTORED RocksDB state")
      assert(earlyIds.forall(i => afterB.contains(i + 91000L)),
        "content older than the watermark horizon re-enters — state eviction is real")
      // restart 2: the rest of the corpus
      stageRange(3500L, 5000L)
      val afterC = run()
      val outRows = spark.read.parquet(outDir).count()
      assert(outRows == afterC.size.toLong,
        "clean resume: no input file may be reprocessed into duplicate output rows")
      // bounded state: the horizon holds ~360 docs (1h / 10s-per-doc);
      // assert an order-of-magnitude bound, far below the 5020 processed
      assert(lastState._1 < 1500L,
        s"state rows ${lastState._1} must be bounded by the watermark horizon, not the corpus")
      info(s"soak state: after A rows=${stateA._1} mem=${stateA._2}B; " +
        s"final rows=${lastState._1} mem=${lastState._2}B; output=$outRows of 5020 staged")
    } finally {
      saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }
  }

  test("hot-key election: one fingerprint class holding most of the corpus still elects correctly") {
    // the r8 de-window scenario made concrete: a boilerplate page
    // duplicated across most of the corpus (the C4/RefinedWeb finding).
    // The election must stay correct — and its plan must partial-
    // aggregate the hot class map-side rather than move every copy
    // into one window task (the shape AQE cannot rescue).
    import spark.implicits._
    val n = 200000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      // 90% of rows share ONE text (modulo punctuation — exercising the
      // canonicalization too); the rest are unique
      when(pmod(col("id"), lit(10)) =!= 0, concat(lit("the same boilerplate page"),
          when(pmod(col("id"), lit(2)) === 0, lit("!")).otherwise(lit("?"))))
        .otherwise(concat(lit("unique document "), col("id"))).as("text"))
    val out = graft.operators.TextAnalysis.dedupedCorpus(docs)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window") && plan.contains("partial_min"),
      "election must be the map-side-combined groupBy+join shape")
    val agg = out.agg(
      sum(when(col("keep"), 1L).otherwise(0L)),
      count(lit(1))).collect().head
    // survivors: every unique doc (n/10) plus exactly ONE of the hot class
    assert(agg.getLong(1) == n, "every doc gets a verdict row")
    assert(agg.getLong(0) == n / 10 + 1,
      s"expected ${n / 10 + 1} survivors, got ${agg.getLong(0)}")
    // the hot class's sole survivor is its minimum doc_id (1 — the
    // first row not ≡0 mod 10; '!' and '?' variants share a fingerprint
    // because canonicalization strips punctuation)
    val winner = out.join(docs, "doc_id")
      .filter(col("keep") && col("text").contains("boilerplate")
        && col("text").endsWith("?"))
      .agg(min(col("doc_id"))).collect().head.getLong(0)
    assert(winner == 1L, s"hot-class ('?' variant) winner must be doc 1, got $winner")
  }

  test("attribution family at sf0.1 conserves points, sections and length across views") {
    // q98 (region rollup), q98b (type features), q98c (distributions)
    // and q79 (global metrics) are four views of the SAME decomposition
    // — at the full 5000-morphology corpus their totals must agree
    // exactly, or one view lost/duplicated entities somewhere in the
    // decode → broadcast → aggregate pipeline
    import org.apache.spark.sql.functions.sum
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val dir = "/root/testdata/sf0.1"
    val (nat, reg) = (Tables.nation(spark, dir), Tables.region(spark, dir))
    val q79 = graft.operators.Morphology.morphMetrics(docs)
      .agg(sum("n_points"), sum("n_sections"), sum("total_len_um")).head()
    val q98 = graft.operators.NeuriteAtlas.leafRegionAttribution(docs, nat, reg)
      .agg(sum("n_points")).head()
    val q98b = graft.operators.NeuriteAtlas.neuriteFeatures(docs)
      .agg(sum("n_points"), sum("n_sections"), sum("cum_len_um")).head()
    val q98c = graft.operators.NeuriteAtlas.sectionStats(docs)
      .agg(sum("n_sections")).head()
    val nDocs = docs.count()
    // every non-soma node attributed exactly once, in both paths
    assert(q98.getLong(0) == q79.getLong(0) - nDocs)
    assert(q98b.getLong(0) == q79.getLong(0) - nDocs)
    // sections partition across types identically in both kernels
    assert(q98b.getLong(1) == q79.getLong(1) && q98c.getLong(0) == q79.getLong(1))
    // world length = local total × the registration scale
    assert(q98b.getLong(2) ==
      q79.getLong(2) * graft.operators.NeuriteAtlas.ScaleUm)
  }

  test("DSIR survives a hot bucket: one token class holding most of the corpus") {
    // the hashing-trick failure mode made concrete: a boilerplate token
    // repeated across 90% of a 200k-doc corpus lands every occurrence
    // in ONE of the 64 buckets. The model aggregate must collapse the
    // hot bucket map-side (partial aggregation — ≤ 64 rows leave each
    // task) rather than serialize the bucket through one task; weights
    // must stay exact.
    import spark.implicits._
    val n = 200000L
    val docs = spark.range(n).select(col("id").as("doc_id"),
      when(pmod(col("id"), lit(10)) =!= 0, lit("boilerplate boilerplate boilerplate"))
        .otherwise(concat(lit("unique"), pmod(col("id"), lit(997)).cast("string"))).as("text"),
      lit("en").as("lang"), lit("s0").as("source"), lit(35L).as("n_chars"))
    val out = graft.operators.Dsir.dsirWeights(docs)
    val plan = out.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window") && !plan.contains("SortMergeJoin"),
      "hot bucket must ride partial aggregation, never a window or shuffle join")
    val agg = out.agg(count(lit(1)), sum(when(col("keep"), 1L).otherwise(0L))).head()
    assert(agg.getLong(0) == n, "every doc gets a weight row")
    // the hot class docs all share one exact weight (3 identical tokens
    // → 3 × the boilerplate bucket's delta); spot-check group equality
    val hot = out.join(docs.select("doc_id", "text"), "doc_id")
      .filter(col("text").startsWith("boilerplate"))
      .agg(countDistinct(col("weight_mb")), count(lit(1))).head()
    assert(hot.getLong(0) == 1L && hot.getLong(1) == n - n / 10,
      "identical docs must score identically")
  }

  test("doc report frame at sf0.1: the full pipeline view equals standalone q55") {
    // the most composite view (dedup election + per-language budget
    // cut) checked at the 5000-doc corpus — frame and text paths must
    // agree row-for-row at a scale where bucket boundaries, hot
    // fingerprints and per-language budgets all genuinely bind
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val frame = graft.operators.TextAnalysis.docReport(docs,
      graft.operators.Frequency.rarityModel(docs),
      graft.operators.LmScreen.lmModel(docs),
      graft.operators.Dsir.dsirModel(docs))
    val rates = Seq("en" -> 8000, "de" -> 6000)
    val want = graft.operators.Corpus.corpusPipeline(docs, rates, 5000, 40000L)
      .collect().map(_.toSeq).toSet
    val got = graft.operators.Corpus.reportCorpusPipeline(frame, rates, 5000, 40000L)
      .collect().map(_.toSeq).toSet
    assert(got == want, "frame-side q55 must equal the text-side q55 at sf0.1")
  }

  test("mixture rebalance at sf0.1 satisfies the composition invariants") {
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val rows = graft.operators.Corpus
      .mixtureBalance(docs, Seq("src0" -> 2000, "src1" -> 1000), 500)
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val rate = r.getAs[Long]("rate_bp")
      assert(rate >= 0 && rate <= 10000, s"rate out of range: $r")
      assert(r.getAs[Long]("kept_docs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("kept_tokens") <= r.getAs[Long]("avail_tokens"))
    }
    // at least one source binds (keeps everything) and, with these
    // skewed weights on a near-uniform corpus, someone is down-sampled
    assert(rows.exists(_.getAs[Long]("rate_bp") == 10000L), "a binding source must exist")
    assert(rows.exists(_.getAs[Long]("rate_bp") < 10000L), "non-binding sources are cut")
  }

  test("cluster-curation family at sf0.1 satisfies its conservation laws") {
    import graft.operators.Similarity
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.1")
    // cards partition the embedded corpus exactly
    val cards = Similarity.clusterCards(docs, emb).collect()
    val nEmbedded = docs.join(emb, docs("doc_id") === emb("vec_id")).count()
    assert(cards.map(_.getAs[Long]("n_docs")).sum == nEmbedded)
    // the sample respects the assignment and the per-cell cap
    val assign = Similarity.clusterAssign(emb).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val sample = Similarity.clusterSample(emb).collect()
    assert(sample.groupBy(_.getAs[Long]("cell")).values.forall(_.length <= 20))
    sample.foreach { r =>
      val (cell, cos) = assign(r.getAs[Long]("vec_id"))
      assert(cell == r.getAs[Long]("cell") && cos == r.getAs[Long]("cos_bp"),
        "sample rows must carry the q104 assignment verbatim")
    }
    // semdedup verdicts: one per vector, kept set closed under min-id
    val sd = Similarity.semanticDedupCells(emb).collect()
    assert(sd.length == emb.count() && sd.length == assign.size)
    sd.foreach { r =>
      if (!r.getAs[Boolean]("keep")) {
        assert(r.getAs[Long]("dup_of") < r.getAs[Long]("vec_id"))
        assert(r.getAs[Long]("max_cos_bp") >= 4500L, "dropped ⇒ an in-cell match above τ")
        assert(assign(r.getAs[Long]("dup_of"))._1 == r.getAs[Long]("cell"),
          "dup_of must live in the same cell")
      }
    }
  }

  test("r10 span/ingest family at sf0.1 satisfies its cross-operator laws") {
    import graft.operators.Dedup
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // q107 ⊆ q91: a doc only cuts where the diagnostic sees duplication,
    // and the cut can never exceed the duplicated-window evidence
    val diag = Dedup.spanDedup(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("n_dup_windows")).toMap
    val cut = Dedup.spanCut(docs).collect()
    assert(cut.exists(_.getAs[Long]("tokens_cut") > 0), "real cuts at sf0.1")
    cut.foreach { r =>
      val dup = diag(r.getLong(0))
      if (r.getAs[Long]("tokens_cut") > 0)
        assert(dup > 0, s"doc ${r.getLong(0)} cuts without diagnosed duplication")
      assert(r.getAs[Long]("tokens_cut") <= r.getAs[Long]("n_tokens"))
    }
    // q108 verdicts are prefix-stable: the verdict of a doc is a pure
    // function of (doc, store) — probing a SUBSET of the batch cannot
    // change any verdict (the door can micro-batch arbitrarily)
    val incoming = Dedup.ingestView(docs)
    val full = Dedup.releaseDedup(docs, incoming).collect()
      .map(r => r.getLong(0) -> (r.getAs[String]("verdict"), r.get(3))).toMap
    val subset = Dedup.releaseDedup(docs, incoming.filter(col("doc_id") % 7 === 0))
      .collect()
    assert(subset.nonEmpty)
    subset.foreach { r =>
      assert(full(r.getLong(0)) == ((r.getAs[String]("verdict"), r.get(3))),
        "micro-batching must not move verdicts")
    }
    // exact verdicts really are exact: the store holds the fingerprint
    val fps = docs.select(
        graft.operators.TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .distinct().collect().map(_.getString(0)).toSet
    val incFp = incoming.select(col("doc_id"),
        graft.operators.TextAnalysis.fingerprintCol(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    full.foreach { case (id, (verdict, _)) =>
      assert((verdict == "exact") == fps.contains(incFp(id)),
        s"doc $id verdict $verdict disagrees with store fingerprint membership")
    }
  }

  test("r10 apply/mix family at sf0.1 satisfies its conservation laws") {
    import graft.operators.{Corpus, Dedup}
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    // q114 conserves tokens against q113's plan, doc for doc
    val apply = Dedup.decontamApply(docs).collect()
    assert(apply.exists(_.getAs[Long]("tokens_cut") > 0), "real cuts at sf0.1")
    apply.foreach { r =>
      assert(r.getAs[Long]("clean_n_tokens")
        == r.getAs[Long]("n_tokens") - r.getAs[Long]("tokens_cut"))
    }
    // q115 totals equal q113's span evidence read from the other side:
    // total corpus occurrences of leaked windows ≥ distinct leaked wins
    val leak = Dedup.leakAttribution(docs).collect()
    leak.foreach { r =>
      assert(r.getAs[Long]("n_leaked_windows") <= r.getAs[Long]("n_windows"))
      assert(r.getAs[Long]("n_occurrences") >= r.getAs[Long]("n_leaked_windows")
        || r.getAs[Long]("n_leaked_windows") == 0L)
    }
    // q117/q117b: the sample realises the plan under the half budget
    val plan = Corpus.temperatureMix(docs).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("target_tokens")).toMap
    val kept = Corpus.temperatureSample(docs).collect()
      .filter(_.getAs[Boolean]("keep"))
      .groupBy(_.getString(0)).view.mapValues(_.map(_.getAs[Long]("n_tokens")).sum)
    kept.foreach { case (l, t) => assert(t <= plan(l), s"$l overfills at sf0.1") }
    // q119 stages partition the corpus and conserve language tokens
    val cur = Corpus.curriculumStages(docs).collect()
    val curByLang = cur.groupBy(_.getString(0))
    curByLang.foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("cum_tokens")).max
        == rows.map(_.getAs[Long]("n_tokens")).sum)
    }
  }

  test("bot-user skew at sf0.1: per-user sequence operators stay correct under a 50% hot key") {
    // the BenchSkew fixture as a CORRECTNESS stress (the measurement
    // lives in SCALE_CURVE_r12/SURVEY): one user absorbing half of all
    // events is the adversarial shape for user-keyed plans — the laws
    // must hold unchanged, and the funnel family must agree with
    // itself at every depth
    import org.apache.spark.sql.functions._
    val base = Tables.events(spark, "/root/testdata/sf0.1")
    val BotUser = 424242424242L
    val ev = base.withColumn("user_id",
      when(pmod(col("event_id"), lit(1000)) < 500, lit(BotUser))
        .otherwise(col("user_id")))
    // q135: the matrix conserves the per-user edge total exactly
    val edges = graft.operators.EventOps.eventTransitions(ev).collect()
    val expectEdges = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(1) - 1).sum
    assert(edges.map(_.getAs[Long]("n")).sum == expectEdges,
      "edge conservation must survive the hot key")
    val botN = ev.filter(col("user_id") === BotUser).count()
    assert(botN * 3 > ev.count(),
      s"the fixture must be a real hot key: bot holds $botN events")
    // q130/q130b: reach is monotone non-increasing and the manifest
    // histogram IS the card, bot or no bot
    val reach = graft.operators.EventOps.funnel(ev).collect()
      .map(r => r.getInt(0) -> r.getAs[Long]("n_users")).toMap
    assert(reach(1) >= reach(2) && reach(2) >= reach(3))
    val users = graft.operators.EventOps.funnelUsers(ev).collect()
    assert(users.length.toLong == reach(1))
    (1 to 3).foreach { d =>
      assert(users.count(_.getAs[Int]("depth") >= d).toLong == reach(d),
        s"manifest depth histogram must equal the card at depth $d")
    }
    // the bot user itself funnels exactly once (first-touch semantics:
    // one chain regardless of how many million events it owns)
    assert(users.count(_.getLong(0) == BotUser) <= 1)
  }
}
