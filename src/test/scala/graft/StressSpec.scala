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
}
