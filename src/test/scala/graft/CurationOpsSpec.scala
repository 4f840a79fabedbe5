package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Corpus, Curation, Frequency, Privacy, Similarity}

/** Per-operator specs for the corpus-hygiene family (q66–q70): PII
  * scrub, fuzzy name linkage, per-source top terms, semantic outliers
  * and the leakage-safe dataset split. These pin the operators'
  * SEMANTIC invariants; PlanShapeSpec pins their physical shapes. */
class CurationOpsSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def messages(t: Throwable): String = {
    Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
      .map(e => Option(e.getMessage).getOrElse("")).mkString(" | ")
  }

  // ---------------------------------------------------------------- q66

  test("pii scrub: null text neither crashes nor reports") {
    val docs = Seq(
      (1L, null.asInstanceOf[String]),
      (2L, "clean text with no identifiers at all")
    ).toDF("doc_id", "text")
    assert(Privacy.piiScrub(docs).isEmpty,
      "null and clean docs must both stay out of the report")
  }

  test("pii scrub: an all-PII doc counts every detector, including 19+ digit runs") {
    val docs = Seq(
      // a 19-digit PAN-shaped run — the bounded {9,18} regex silently
      // missed these (ADVICE r5); the unbounded pattern must not
      (1L, "mail me a.user@example.com from 10.1.2.3 card 1234567890123456789")
    ).toDF("doc_id", "text")
    val r = Privacy.piiScrub(docs).collect().head
    assert(r.getAs[Long]("n_email") == 1L)
    assert(r.getAs[Long]("n_ipv4") == 1L)
    assert(r.getAs[Long]("n_idnum") == 1L, "19-digit run must be caught")
    assert(r.getAs[Long]("pii_total") == 3L)
  }

  test("pii scrub: digit runs glued to letters are a documented non-match") {
    // \b boundaries: matching mid-token runs would shred hex ids and
    // hashes — the posture is precision here, recall via the boundary
    val docs = Seq((1L, "ref acct123456789x stays, bare 987654321 is caught"))
      .toDF("doc_id", "text")
    val r = Privacy.piiScrub(docs).collect().head
    assert(r.getAs[Long]("n_idnum") == 1L, "only the bare run matches")
  }

  test("pii scrub: docs equal modulo PII share one redacted fingerprint") {
    val docs = Seq(
      (1L, "mail a.user@example.com from 10.0.0.1 acct 900000001"),
      (2L, "mail other.person@foo.org from 192.168.7.13 acct 123456789123")
    ).toDF("doc_id", "text")
    val fps = Privacy.piiScrub(docs).collect().map(_.getAs[String]("redacted_fp"))
    assert(fps.length == 2 && fps.distinct.length == 1,
      "email→IP→ID redaction must canonicalize both docs to the same text")
  }

  test("pii scrub: a digit-bearing email is counted once, not double-counted") {
    // 'u123456789@' has no word boundary between 'u' and the digits, so
    // the ID detector cannot fire inside the address
    val docs = Seq((1L, "contact u123456789@example.com today")).toDF("doc_id", "text")
    val r = Privacy.piiScrub(docs).collect().head
    assert(r.getAs[Long]("n_email") == 1L && r.getAs[Long]("n_idnum") == 0L)
  }

  // ---------------------------------------------------------------- q67

  private def fuzzy(df: org.apache.spark.sql.DataFrame, maxDist: Int,
                    maxBlock: Int = 10000) =
    Curation.fuzzyNameMatches(df, "name", maxDist,
      Seq(substring(col("name"), 1, 1)), maxBlock)

  test("fuzzy names: maxDist is an inclusive boundary, duplicates collapse first") {
    // block 's': smith, smyth, smythe; dists: smith~smyth 1,
    // smyth~smythe 1, smith~smythe 2. 'smith' appears twice in the
    // input — the distinct() universe must not emit a self-pair.
    val df = Seq("smith", "smith", "smyth", "smythe", "zeta").toDF("name")
    val pairs = fuzzy(df, maxDist = 1).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs == Set(("smith", "smyth", 1L), ("smyth", "smythe", 1L)))
    val pairs2 = fuzzy(df, maxDist = 2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    assert(pairs2.contains(("smith", "smythe", 2L)), "dist == maxDist is included")
  }

  test("fuzzy names: the block guard fails fast on a degenerate one-block universe") {
    // every name shares the blocking key → one 40-name block; with
    // maxBlock below that the plan must throw, not run the 40² product
    val df = (1 to 40).map(i => f"aname$i%03d").toDF("name")
    val e = intercept[Throwable] { fuzzy(df, maxDist = 2, maxBlock = 10).collect() }
    assert(messages(e).contains("maxBlock"),
      s"expected the guard message, got: ${messages(e)}")
  }

  test("fuzzy names: guard is a pass-through when every block fits") {
    val df = Seq("alpha", "alphb", "beta", "betb", "gamma").toDF("name")
    val tight = fuzzy(df, maxDist = 1, maxBlock = 3).collect().toSet
    val loose = fuzzy(df, maxDist = 1, maxBlock = 10000).collect().toSet
    assert(tight == loose, "the guard must never change the result, only bound cost")
    assert(tight.nonEmpty)
  }

  test("fuzzy names: inventory blocking key reproduces q67 on real part names") {
    val out = Curation.fuzzyNameMatches(
      Tables.part(spark, sf), "p_name", maxDist = 2,
      Seq(split_part(col("name"), lit(" "), lit(2)), expr("length(name) DIV 4")))
      .collect()
    out.foreach { r =>
      assert(r.getAs[Long]("edit_dist") <= 2L)
      assert(r.getString(0) < r.getString(1), "pairs are ordered, no self-pairs")
    }
  }

  // ---------------------------------------------------------------- q68

  test("grouped heavy hitters: per-group exactness against a plain groupBy") {
    // group A: 'x' at 30% plus singletons; group B: 'y' at 40% — each
    // group's threshold uses its OWN total (the per-group no-miss bound)
    val rows = (Seq.fill(300)(("A", "x")) ++ (1 to 700).map(i => ("A", s"a$i")) ++
      Seq.fill(200)(("B", "y")) ++ (1 to 300).map(i => ("B", s"b$i")))
    val df = rows.toDF("grp", "k").repartition(8)
    val got = Frequency.groupedHeavyHitters(df, col("grp"), col("k"),
      phiBp = 200, capacity = 64)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val expected = rows.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case ((g, _), c) =>
        c * 10000L > rows.count(_._1 == g).toLong * 200L }
    assert(got.keySet == expected.keySet, s"got ${got.keySet}")
    got.foreach { case (gk, c) => assert(c == expected(gk), s"$gk count must be exact") }
  }

  test("source top terms matches a manual exact share computation") {
    val docs = Seq(
      (1L, "the the the cat", "en", "src0", 0L),
      (2L, "the dog runs", "en", "src0", 0L),
      (3L, "unique words only here", "en", "src1", 0L)
    ).toDF("doc_id", "text", "lang", "source", "n_chars")
    val out = Frequency.sourceTopTerms(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    // src0 has 7 tokens; 'the' appears 4× (share 5714bp > 200bp)
    assert(out(("src0", "the")) == 4L)
    // every src1 token has share 2500bp — all above the 2% threshold
    assert(out.keys.count(_._1 == "src1") == 4)
    out.foreach { case ((s, _), _) => assert(Set("src0", "src1")(s)) }
  }

  // ---------------------------------------------------------------- q69

  test("semantic outliers: a singleton label scores its own centroid at ~1") {
    val df = Seq((1L, Array(0.5f, 0.5f, 0f, 0f), 7L))
      .toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(df, k = 5).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("cos_bp") >= 9990L,
      "cosine with its own (quantized) centroid must be ≈ 10000 bp")
  }

  test("semantic outliers: all-zero vectors are excluded, never NaN") {
    val df = Seq(
      (1L, Array(1f, 0f), 3L),
      (2L, Array(0f, 1f), 3L),
      (3L, Array(0f, 0f), 3L) // zero norm — cosine undefined
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.labelCentroidOutliers(df, k = 5).collect()
    assert(out.map(_.getLong(0)).toSet == Set(1L, 2L), "zero vector dropped")
    out.foreach(r => assert(!r.isNullAt(r.fieldIndex("cos_bp"))))
  }

  test("semantic outliers: the bottom-k election surfaces the planted outlier") {
    val near = Seq(Array(1f, 0.01f), Array(1f, -0.01f), Array(0.99f, 0f),
      Array(1f, 0.02f), Array(0.98f, -0.01f))
    val rows = near.zipWithIndex.map { case (v, i) => (i.toLong, v, 1L) } :+
      (99L, Array(-1f, 0f), 1L) // opposite direction: the mislabeled vector
    val out = Similarity.labelCentroidOutliers(rows.toDF("vec_id", "embedding", "label"),
      k = 2).collect()
    assert(out.length == 2, "k bounds the per-label report")
    val worst = out.minBy(_.getAs[Long]("cos_bp"))
    assert(worst.getLong(0) == 99L, "the planted outlier has the lowest cosine")
    assert(worst.getAs[Long]("cos_bp") < 0L, "opposite vector scores negative")
  }

  // ---------------------------------------------------------------- q76

  test("pq encode: codes are valid 4-bit packs, deterministic under repartitioning") {
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.pqEncode(emb).collect()
    val b = Similarity.pqEncode(emb.repartition(7)).collect()
    assert(a.sameElements(b), "model + codes must not depend on partitioning")
    a.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      assert(code >= 0L && code < (1L << 32), s"8 nibbles must fit 32 bits: $code")
      assert(r.getAs[Long]("err_bp") >= 0L)
    }
    assert(a.length == emb.count())
  }

  test("pq encode: identical vectors share a code; exact-point corpora reconstruct exactly") {
    // 24 copies of 4 distinct vectors whose components are exact
    // multiples of 1e-6: Lloyd means land exactly on the points, so
    // every vector reconstructs with zero error
    val patterns = Seq(0.5f, -0.25f, 1.0f, 0.125f)
      .map(v => Array.fill(64)(v))
    val rows = (0 until 24).map(i => (i.toLong, patterns(i % 4), 0L))
    val out = Similarity.pqEncode(rows.toDF("vec_id", "embedding", "label")).collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    (0 until 24).foreach { i =>
      assert(byId(i.toLong).getAs[Long]("pq_code") ==
        byId((i % 4).toLong).getAs[Long]("pq_code"),
        "identical vectors must share their code")
      assert(byId(i.toLong).getAs[Long]("err_bp") == 0L,
        s"exact-point corpus must reconstruct exactly: ${byId(i.toLong)}")
    }
    assert(out.map(_.getAs[Long]("pq_code")).distinct.length == 4,
      "distinct points get distinct codes")
  }

  test("pq adc + exact re-rank recover most true neighbors from 4-bit codes") {
    val emb = Tables.embeddings(spark, sf)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val exact = (0L until 20L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(10).toSet
    }.toMap
    val got = Similarity.pqSearchReranked(emb).collect()
      .groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
    assert(got.keySet == (0L until 20L).toSet)
    got.values.foreach(s => assert(s.size == 10))
    val recalls = (0L until 20L).map(q => got(q).intersect(exact(q)).size / 10.0)
    val mean = recalls.sum / recalls.size
    // random vectors are quantization's WORST case; measured 0.83 here
    assert(mean >= 0.65, f"re-ranked recall@10 $mean%.2f below floor")
    // the re-rank can only surface candidates ADC proposed — every hit
    // must carry the exact distance, ascending per query
    val perQuery = Similarity.pqSearchReranked(emb).collect().groupBy(_.getLong(0))
    perQuery.values.foreach { rs =>
      val ds = rs.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("d2_micro"))
      assert(ds.sameElements(ds.sorted), "exact distances must ascend with rank")
    }
  }

  test("ivf-pq: probing every cell degenerates to the plain ADC scan exactly") {
    // with nProbe = nCells the cell restriction is vacuous, so the
    // composed index must reproduce the flat ADC ranking bit-for-bit —
    // pins that the IVF layer only FILTERS candidates, never perturbs
    // the ADC distances
    val emb = Tables.embeddings(spark, sf)
    val full = Similarity.pqAdcSearch(emb).collect().toSeq
    val viaIvf = Similarity.knnIvfPq(emb, nCells = 16, nProbe = 16).collect().toSeq
    assert(viaIvf == full, "all-cells IVF-PQ must equal the flat ADC scan")
  }

  test("ivf-pq: restricted probing returns valid ranks and is deterministic") {
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.knnIvfPq(emb).collect()
    val b = Similarity.knnIvfPq(emb.repartition(5)).collect()
    assert(a.sameElements(b), "both models and the probe walk are reproducible")
    val byQuery = a.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.length <= 10)
      val ranks = rs.map(_.getAs[Long]("rank")).sorted
      assert(ranks.sameElements(1L to rs.length), "ranks are dense from 1")
    }
    // the flat ADC scan can only improve on the restricted index: any
    // pair both return must carry the same distance
    val flat = Similarity.pqAdcSearch(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("adc_d2_micro")).toMap
    a.foreach { r =>
      flat.get((r.getLong(0), r.getLong(1))).foreach(d =>
        assert(d == r.getAs[Long]("adc_d2_micro"), "distances agree across index layouts"))
    }
  }

  test("pq encode: zero vectors and bad k fail safe") {
    val mix = Seq(
      (1L, Array.fill(64)(0f), 0L),
      (2L, Array.fill(64)(0.5f), 0L)
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.pqEncode(mix).collect().map(r => r.getLong(0) -> r).toMap
    assert(out(1L).getAs[Long]("err_bp") == 0L, "zero vector: err_bp is 0 by definition")
    assert(out.size == 2)
    // k>16 would silently overflow the 4-bit packing — EVERY pq entry
    // point must refuse, not just pqEncode
    intercept[IllegalArgumentException] { Similarity.pqEncode(mix, k = 17) }
    intercept[IllegalArgumentException] { Similarity.pqEncode(mix, m = 7) }
    intercept[IllegalArgumentException] { Similarity.pqAdcSearch(mix, k = 17) }
    intercept[IllegalArgumentException] { Similarity.pqSearchReranked(mix, k = 17) }
    intercept[IllegalArgumentException] { Similarity.knnIvfPq(mix, k = 17) }
  }

  // ---------------------------------------------------------------- q81

  test("residual pq: tighter reconstruction than flat pq at the same bit budget") {
    val emb = Tables.embeddings(spark, sf)
    val flat = Similarity.pqEncode(emb).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("err_bp")).toMap
    val res = Similarity.pqResidualEncode(emb).collect()
    assert(res.length == flat.size)
    res.foreach { r =>
      val code = r.getAs[Long]("pq_code")
      assert(code >= 0L && code < (1L << 32), s"8 nibbles must fit 32 bits: $code")
      assert(r.getAs[Long]("err_bp") >= 0L)
      assert(r.getAs[Long]("cell") >= 0L && r.getAs[Long]("cell") < 16L)
    }
    // the point of residual coding: after the coarse quantizer soaks up
    // the cell mean, the SAME 32-bit budget spends its codes on the
    // smaller residual distribution — mean err_bp must drop
    val meanFlat = flat.values.sum.toDouble / flat.size
    val meanRes = res.map(_.getAs[Long]("err_bp")).sum.toDouble / res.length
    assert(meanRes < meanFlat,
      f"residual mean err_bp $meanRes%.0f must beat flat $meanFlat%.0f")
    // determinism under repartitioning, like every other model here
    val b = Similarity.pqResidualEncode(emb.repartition(7)).collect()
    assert(res.sameElements(b), "ivf + residual codebooks must be reproducible")
    intercept[IllegalArgumentException] { Similarity.pqResidualEncode(emb, k = 17) }
  }

  test("residual ivf search: valid ranks, deterministic, no recall loss vs flat ivf-pq") {
    val emb = Tables.embeddings(spark, sf)
    val a = Similarity.knnIvfRpq(emb).collect()
    assert(a.sameElements(Similarity.knnIvfRpq(emb.repartition(5)).collect()))
    val byQuery = a.groupBy(_.getLong(0))
    byQuery.values.foreach { rs =>
      assert(rs.length <= 10)
      assert(rs.map(_.getAs[Long]("rank")).sorted.sameElements(1L to rs.length))
    }
    // recall@10 vs exact L2, compared against q78 at the SAME probe
    // budget: both indexes probe the same 6 of 16 cells (identical IVF
    // model), so probe misses hit both equally — the residual codes'
    // tighter distances must not LOSE recall, and a small floor guards
    // against degenerate models. (Measured at sf0.001: flat 0.28,
    // residual 0.32 — probe misses dominate on this tiny corpus; the
    // per-candidate distance quality is what q81's err_bp drop proves.)
    val vecs = emb.collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def l2(x: Array[Double], y: Array[Double]) =
      x.zip(y).map { case (p, q) => (p - q) * (p - q) }.sum
    val exact = (0L until 20L).map { q =>
      q -> vecs.keys.filter(_ != q).toSeq
        .sortBy(n => (l2(vecs(q), vecs(n)), n)).take(10).toSet
    }.toMap
    def recall(rows: Array[org.apache.spark.sql.Row]): Double = {
      val got = rows.groupBy(_.getLong(0)).map { case (q, rs) => q -> rs.map(_.getLong(1)).toSet }
      val rs = got.map { case (q, s) => s.intersect(exact(q)).size / 10.0 }
      rs.sum / rs.size
    }
    val meanRes = recall(a)
    val meanFlat = recall(Similarity.knnIvfPq(emb).collect())
    assert(meanRes >= meanFlat - 0.05,
      f"residual recall@10 $meanRes%.2f must not lose to flat $meanFlat%.2f at equal probes")
    assert(meanRes >= 0.2, f"residual recall@10 $meanRes%.2f below sanity floor")
  }

  test("pq family survives a single-vector corpus (one-code degenerate model)") {
    // one vector -> one centroid per subspace: the argmin has a single
    // candidate, which must encode (code 0, exact reconstruction)
    // rather than fail analysis
    val one = Seq((7L, Array.tabulate(64)(i => (i * 0.125f) - 4f), 0L))
      .toDF("vec_id", "embedding", "label")
    val enc = Similarity.pqEncode(one).collect()
    assert(enc.length == 1 && enc.head.getAs[Long]("pq_code") == 0L)
    assert(enc.head.getAs[Long]("err_bp") == 0L,
      "a vector that IS the centroid reconstructs exactly")
    assert(Similarity.pqAdcSearch(one).isEmpty, "no neighbors exist for the only vector")
    assert(Similarity.knnIvfPq(one).isEmpty)
  }

  // ---------------------------------------------------------------- q70

  test("k-anonymity ladder: each row releases at its first rung with k peers") {
    val nation = Seq((0, "GERMANY", 0), (1, "FRANCE", 0), (2, "JAPAN", 1))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "EUROPE"), (1, "ASIA")).toDF("r_regionkey", "r_name")
    // 5 Germans in AUTO → rung 0; 1 German + 4 French in STEEL → the
    // region pools to 5 at rung 1; 2 Japanese split across segments →
    // ASIA totals 2 < 5 → suppressed; a null nation key suppresses
    val customers = (
      (1L to 5L).map(i => (i, Some(0), "AUTO"))
        ++ Seq((6L, Some(0), "STEEL"))
        ++ (7L to 10L).map(i => (i, Some(1), "STEEL"))
        ++ Seq((11L, Some(2), "AUTO"), (12L, Some(2), "STEEL"),
          (13L, None: Option[Int], "AUTO"))
      ).toDF("c_custkey", "c_nationkey", "c_mktsegment")
    val out = Privacy.kAnonymize(customers, nation, region).collect()
      .map(r => r.getLong(0) -> r).toMap
    (1L to 5L).foreach { i =>
      assert(out(i).getAs[Long]("anon_level") == 0L
        && out(i).getAs[String]("geo") == "GERMANY"
        && out(i).getAs[String]("segment") == "AUTO")
    }
    (6L to 10L).foreach { i =>
      assert(out(i).getAs[Long]("anon_level") == 1L
        && out(i).getAs[String]("geo") == "EUROPE"
        && out(i).getAs[String]("segment") == "STEEL", s"${out(i)}")
    }
    Seq(11L, 12L).foreach { i =>
      assert(out(i).getAs[Long]("anon_level") == 3L
        && out(i).getAs[String]("geo") == "*"
        && out(i).getAs[String]("segment") == "*", s"${out(i)}")
    }
    assert(out(13L).getAs[Long]("anon_level") == 3L,
      "a null quasi-identifier must suppress, never leak through a rung")
    // an UNKNOWN nation key suppresses even with >= k peers: the rungs
    // key on the resolved name, so the unresolvable group has no count
    val ghosts = ((20L to 24L).map(i => (i, Some(99), "AUTO")))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment")
    Privacy.kAnonymize(customers.unionByName(ghosts), nation, region)
      .collect().filter(r => r.getLong(0) >= 20L && r.getLong(0) <= 24L)
      .foreach { r =>
        assert(r.getAs[Long]("anon_level") == 3L
          && r.getAs[String]("geo") == "*" && r.getAs[String]("segment") == "*",
          s"unknown nation must suppress: $r")
      }
    // released equivalence classes at rungs 0-2 genuinely have >= k members
    val released = out.values.filter(_.getAs[Long]("anon_level") < 3L)
      .groupBy(r => (r.getAs[String]("geo"), r.getAs[String]("segment")))
    released.values.foreach(g => assert(g.size >= 5))
  }

  test("l-diversity audit: a k-anonymous class with one sensitive value is flagged") {
    val nation = Seq((0, "GERMANY", 0), (1, "FRANCE", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")
    // class A: 5 Germans/AUTO, ALL the same balance band — k-anonymous
    // at rung 0 yet the release discloses every member's band (the
    // homogeneity attack l-diversity exists to catch); class B: 5
    // French/STEEL across four bands — diverse
    val customers = (
      (1L to 5L).map(i => (i, 0, "AUTO", 5000.0))
        ++ Seq((6L, 1, "STEEL", -10.0), (7L, 1, "STEEL", 100.0),
          (8L, 1, "STEEL", 5000.0), (9L, 1, "STEEL", 8000.0),
          (10L, 1, "STEEL", 200.0))
      ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Privacy.lDiversityAudit(customers, nation, region)
      .collect().map(r => (r.getAs[String]("geo"), r.getAs[String]("segment")) -> r).toMap
    val a = out(("GERMANY", "AUTO"))
    assert(a.getAs[Long]("n_rows") == 5L
      && a.getAs[Long]("n_sensitive_distinct") == 1L
      && !a.getAs[Boolean]("is_l_diverse"),
      s"the homogeneous class must fail the audit: $a")
    val b = out(("FRANCE", "STEEL"))
    assert(b.getAs[Long]("n_sensitive_distinct") == 4L
      && b.getAs[Boolean]("is_l_diverse"), s"$b")
    // the card is class-level: one row per released equivalence class
    assert(out.size == 2)
  }

  test("l-diversity apply: failing classes coarsen, the release re-audits clean") {
    val nation = Seq((0, "GERMANY", 0), (1, "FRANCE", 0))
      .toDF("n_nationkey", "n_name", "n_regionkey")
    val region = Seq((0, "EUROPE")).toDF("r_regionkey", "r_name")
    // class A (5 Germans/AUTO, one band) and class C (5 French/AUTO,
    // two bands) BOTH fail the l=3 audit at rung 0 and coarsen into
    // the SAME rung-1 class (EUROPE, AUTO): pooled n=10 across 3 bands
    // — the coarsen-and-pool fixpoint. class B (5 French/STEEL, 4
    // bands) passes rung 0 untouched.
    val customers = (
      (1L to 5L).map(i => (i, 0, "AUTO", 5000.0))
        ++ Seq((6L, 1, "STEEL", -10.0), (7L, 1, "STEEL", 100.0),
          (8L, 1, "STEEL", 5000.0), (9L, 1, "STEEL", 8000.0),
          (10L, 1, "STEEL", 200.0))
        ++ Seq((11L, 1, "AUTO", -5.0), (12L, 1, "AUTO", 100.0),
          (13L, 1, "AUTO", -10.0), (14L, 1, "AUTO", 120.0),
          (15L, 1, "AUTO", 130.0))
      ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val out = Privacy.lDiversityApply(customers, nation, region)
      .collect().map(r => r.getLong(0) ->
        (r.getAs[Long]("anon_level"), r.getAs[String]("geo"),
          r.getAs[String]("segment"))).toMap
    // both failing AUTO classes stepped one rung and pooled diversely
    ((1L to 5L) ++ (11L to 15L)).foreach { i =>
      assert(out(i) == ((1L, "EUROPE", "AUTO")), s"c$i: ${out(i)}") }
    // the diverse STEEL class kept its q120 assignment untouched
    (6L to 10L).foreach { i =>
      assert(out(i) == ((0L, "FRANCE", "STEEL")), s"c$i: ${out(i)}") }
    // a stubbornly homogeneous class that can never pool diversely must
    // end fully suppressed — coarsening cannot invent diversity
    val lone = ((1L to 5L).map(i => (i, 0, "AUTO", 5000.0))
      ).toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    Privacy.lDiversityApply(lone, nation, region).collect().foreach { r =>
      assert(r.getAs[Long]("anon_level") == 3L &&
        r.getAs[String]("geo") == "*" && r.getAs[String]("segment") == "*",
        s"homogeneous-only corpus must suppress: $r") }
    // null-quasi-identifier guard (the null-unsafe failing-class join
    // is SAFE by construction and this pins why): unknown-nation rows
    // suppress to the literal ('*','*') at level 3 BEFORE round 1 —
    // geo/segment are never null below level 3, so a failing class key
    // can never be null and every failing class genuinely coarsens
    val ghosts = (90L to 94L).map(i => (i, 99, "AUTO", 5000.0))
      .toDF("c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal")
    val withGhosts = Privacy.lDiversityApply(
      customers.unionByName(ghosts), nation, region).collect()
    withGhosts.filter(r => r.getLong(0) >= 90L).foreach { r =>
      assert(r.getAs[Long]("anon_level") == 3L &&
        r.getAs[String]("geo") == "*" && r.getAs[String]("segment") == "*",
        s"unknown nation must suppress, never stall un-coarsened: $r") }
    withGhosts.filter(_.getAs[Long]("anon_level") < 3L).foreach { r =>
      assert(r.getAs[String]("geo") != null && r.getAs[String]("segment") != null) }
    // RE-AUDIT CLEAN (the operator's contract): every non-suppressed
    // class of the RELEASED table has >= k members and >= l bands
    val bands = customers.select(col("c_custkey"),
      Privacy.sensitiveBand.as("b")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val classes = out.toSeq.filter(_._2._1 < 3L)
      .groupBy(_._2).map { case (cls, members) =>
        cls -> (members.size, members.map(m => bands(m._1)).distinct.size) }
    classes.foreach { case (cls, (n, d)) =>
      assert(n >= 5 && d >= 3, s"released class $cls fails re-audit: n=$n l=$d") }
    // and on the REAL tables: the released classes re-audit clean too
    val (c, nn, rr) = (Tables.customer(spark, TestSpark.sf),
      Tables.nation(spark, TestSpark.sf), Tables.region(spark, TestSpark.sf))
    val real = Privacy.lDiversityApply(c, nn, rr)
    val realBands = c.select(col("c_custkey"), Privacy.sensitiveBand.as("b"))
    val audit = real.filter(col("anon_level") < 3L)
      .join(realBands, Seq("c_custkey"))
      .groupBy("anon_level", "geo", "segment")
      .agg(count(lit(1)).as("n"), countDistinct(col("b")).as("d"))
      .filter(col("n") < 5L || col("d") < 3L)
    assert(audit.isEmpty, s"real-table release must re-audit clean")
  }

  test("dataset split: assignment is stable under corpus growth") {
    // the documented invariant: adding documents never reassigns an
    // existing one (split is a pure function of content — no
    // row_number / modulo scheme can promise this)
    def mk(ids: Range) = ids.map(i => (i.toLong, s"document body number $i", "s"))
      .toDF("doc_id", "text", "source")
    val before = Corpus.datasetSplit(mk(1 to 300), 500, 500)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    val after = Corpus.datasetSplit(mk(1 to 600), 500, 500)
      .collect().map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    before.foreach { case (id, s) => assert(after(id) == s, s"doc $id reassigned") }
  }

  test("dataset split: duplicate content always lands in one split (leakage safety)") {
    val docs = Seq(
      (1L, "The  Quick  Brown Fox!", "a"),
      (2L, "the quick brown fox", "b"), // same q40 canonical form as 1
      (3L, "an entirely different document", "a")
    ).toDF("doc_id", "text", "source")
    val by = Corpus.datasetSplit(docs, 3000, 3000).collect()
      .map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(by(1L) == by(2L),
      "near-identical docs must share a split or eval text leaks into train")
  }

  test("dataset split: null text falls through to train; fractions track the bp targets") {
    val docs = ((1 to 2000).map(i => (i.toLong, s"synthetic doc text $i", "s")) :+
      (9999L, null.asInstanceOf[String], "s"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.datasetSplit(docs, valBp = 1000, testBp = 1000).collect()
    assert(out.length == 2001, "every doc gets a split row")
    val byId = out.map(r => r.getLong(0) -> r.getAs[String]("split")).toMap
    assert(byId(9999L) == "train", "null fingerprint hashes to null → train")
    val frac = out.groupBy(_.getAs[String]("split")).view.mapValues(_.length).toMap
    assert(frac("val") > 120 && frac("val") < 280, s"~10% val, got $frac")
    assert(frac("test") > 120 && frac("test") < 280, s"~10% test, got $frac")
    intercept[IllegalArgumentException] { Corpus.datasetSplit(docs, 6000, 4000) }
  }

  test("vec report frame: views derive exactly from the persisted frame") {
    val emb = Tables.embeddings(spark, sf)
    val frame0 = Similarity.vecReport(emb)
    assert(!frame0.columns.contains("embedding"),
      "persisting the payload would defeat the narrow-frame design")
    val dir = java.nio.file.Files.createTempDirectory("graft_vecreport").toString
    frame0.write.mode("overwrite").parquet(dir)
    val frame = spark.read.parquet(dir)
    assert(frame.count() == emb.count(), "one row per vector")
    // q104 assignment: same (vec_id, cell, cos_bp) triples
    val wantAssign = Similarity.clusterAssign(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val gotAssign = Similarity.reportClusterAssign(frame).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(gotAssign == wantAssign, "frame assignment must equal the standalone q104 assignment")
    // q104b sample: identical ordered rows
    assert(Similarity.reportClusterSample(frame).collect()
      .sameElements(Similarity.clusterSample(emb).collect()),
      "frame sample must equal the standalone q104b election")
    // q76 codes: identical ordered rows
    assert(Similarity.reportPqCodes(frame).collect()
      .sameElements(Similarity.pqEncode(emb).collect()),
      "frame codes must equal the standalone q76 encode")
  }

  // ---------------------------------------------------------------- q140

  test("annotation push: create/update split by compartment, identity kept, never deletes") {
    // update_create_one on a hand-built universe. Existing rule:
    // (p + len(comp)) % 3 == 0 with len axon=4 soma=4 dendrite=8
    // neurite=7 -> p=1 owns {dendrite}, p=2 {axon,soma,neurite},
    // p=5 {axon,soma,neurite}
    val part = Seq((1L, "B1"), (2L, "B2"), (5L, "B5"))
      .toDF("p_partkey", "p_brand")
    val lineitem = Seq(
      (1L, 1, 2.5),  // 1%4=1 -> soma
      (1L, 5, 3.0),  // 5%4=1 -> soma (same compartment aggregates)
      (1L, 8, 1.0),  // 8%4=0 -> axon
      (2L, 4, 2.0),  // axon
      (5L, 3, 4.25)  // 3%4=3 -> neurite
    ).toDF("l_partkey", "l_linenumber", "l_quantity")
    val got = Curation.annotationPush(part, lineitem).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3), r.getLong(4),
        if (r.isNullAt(5)) -1L else r.getLong(5), r.getString(6))).toSet
    val want = Set(
      // computed-but-not-existing compartments CREATE (no prev_rev)
      (1L, "axon", "create", 1L, 100L, -1L, "B1"),
      (1L, "soma", "create", 2L, 550L, -1L, "B1"),
      // computed-and-existing compartments UPDATE, keeping the
      // existing resource identity (prev_rev = p%5+1)
      (2L, "axon", "update", 1L, 200L, 3L, "B2"),
      (5L, "neurite", "update", 1L, 425L, 1L, "B5"))
    assert(got == want, s"push manifest mismatch:\n got $got\nwant $want")
    // the never-delete asymmetry: p=5's existing axon/soma have no
    // computed body this run and must be UNTOUCHED (no row at all)
    assert(!got.exists(r => r._1 == 5L && r._2 != "neurite"))
    // plan shape: one grouped aggregate + equi-joins, no window, no
    // cartesian on anything data-sized
    val df = Curation.annotationPush(part, lineitem)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("Window ["), "no per-entity window")
    assert(!plan.contains("CartesianProduct"), "no cartesian product")
  }
}
