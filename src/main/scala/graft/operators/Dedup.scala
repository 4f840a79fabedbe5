package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Near-duplicate detection for LLM-training corpora (SURVEY.md §2C):
  * MinHash+LSH banding, SimHash, and an exact n-gram-Jaccard verify
  * pass over candidate pairs.
  *
  * Scale design: no all-pairs comparison anywhere — candidates come
  * from equality joins on band keys (MinHash bands / SimHash chunks),
  * which shuffle on the band hash and scale linearly with corpus size.
  * Signatures are computed row-local with higher-order functions (no
  * explode, no shuffle); only the tiny (band_hash → doc) frame moves.
  */
object Dedup {

  /** deterministic per-permutation seeds, fixed so results are
    * reproducible across runs/partitionings. */
  private def permSeeds(n: Int): Seq[Long] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(n)(rnd.nextLong())
  }

  /** lowercased whitespace tokens. */
  def tokens(text: Column): Column = split(trim(lower(text)), " +")

  /** hashed k-word shingles (k-gram hashes); a doc shorter than k words
    * contributes its whole text as one shingle. */
  def shingleHashes(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = greatest(size(toks) - (k - 1), lit(1))
    transform(sequence(lit(0), n - 1),
      i => xxhash64(concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** string k-word shingles, distinct — for the exact Jaccard pass. */
  def shingleSet(text: Column, k: Int): Column = {
    val toks = tokens(text)
    val n = greatest(size(toks) - (k - 1), lit(1))
    array_distinct(transform(sequence(lit(0), n - 1),
      i => concat_ws(" ", slice(toks, i + 1, lit(k)))))
  }

  /** MinHash signature: array of numHashes permuted minima over the
    * shingle hashes. The permutation family is xxhash64 re-keyed by a
    * per-permutation seed — min-wise independent across permutations,
    * no modular arithmetic to overflow under ANSI mode. Row-local;
    * used for tests/ad-hoc. The batch pipeline below uses the
    * explode+min-agg form instead: building the signature array inline
    * duplicates the whole shingle expression tree per permutation, and
    * higher-order lambdas evaluate interpreted — ~30× slower. */
  def minhashSignature(text: Column, numHashes: Int, k: Int): Column = {
    val sh = shingleHashes(text, k)
    array(permSeeds(numHashes).map { seed =>
      array_min(transform(sh, h => xxhash64(lit(seed), h)))
    }: _*)
  }

  /** per-doc signature columns m0..m{n-1} via explode + grouped min —
    * shingles are materialized once, the 32 permuted hashes run in
    * whole-stage codegen, and partial aggregation means the shuffle
    * carries one 32-long row per doc. */
  private def signatureCols(docs: DataFrame, numHashes: Int, k: Int): DataFrame = {
    val exploded = docs.select(col("doc_id"),
      explode(shingleHashes(col("text"), k)).as("h"))
    val minCols = permSeeds(numHashes).zipWithIndex.map { case (s, i) =>
      min(xxhash64(lit(s), col("h"))).as(s"m$i")
    }
    exploded.groupBy("doc_id").agg(minCols.head, minCols.tail: _*)
  }

  /** (doc_id, band_idx, band_hash) — one row per band; equal band_hash
    * within a band ⇒ candidate duplicates. */
  def minhashBands(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                   k: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sigs = signatureCols(docs, numHashes, k)
    val bandCols = (0 until bands).map { j =>
      hash(lit(j) +: (j * r until (j + 1) * r).map(i => col(s"m$i")): _*)
    }
    sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** q31: per-doc MinHash profile — is the doc a banding candidate
    * duplicate, and how many band-mates does it have. */
  def minhashProfile(docs: DataFrame): DataFrame = {
    val bandsDf = minhashBands(docs)
    val buckets = bandsDf.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
    bandsDf.join(buckets, Seq("band_idx", "band_hash"))
      .groupBy("doc_id")
      .agg(
        sum(col("bucket_n") - 1).as("n_band_mates"),
        max(col("bucket_n") > 1).as("is_candidate_dup"))
      .orderBy("doc_id")
  }

  /** candidate pairs (doc_a < doc_b) from MinHash band buckets — the
    * scale-safe alternative to all-pairs. */
  def minhashCandidatePairs(docs: DataFrame): DataFrame = {
    val b = minhashBands(docs)
    val left = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_a"))
    val right = b.select(col("band_idx"), col("band_hash"), col("doc_id").as("doc_b"))
    left.join(right, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
  }

  /** q33: exact word-shingle Jaccard on candidate pairs (the verify
    * pass after LSH). Candidates = band pairs ∪ a deterministic control
    * sample of adjacent ids (so the calibration output is never empty
    * on a dup-free corpus). jaccard_bp is integer basis points —
    * hash-stable. */
  def jaccardVerify(docs: DataFrame, k: Int = 3, topN: Int = 200): DataFrame = {
    val control = docs.select(col("doc_id").as("doc_a"), (col("doc_id") + 1).as("doc_b"))
      .join(docs.select(col("doc_id").as("doc_b")), Seq("doc_b"), "left_semi")
      .withColumn("pair_source", lit("control"))
    val cands = minhashCandidatePairs(docs).withColumn("pair_source", lit("lsh"))
    val pairs = cands.unionByName(control)
      .groupBy("doc_a", "doc_b").agg(min(col("pair_source")).as("pair_source"))
    val sets = docs.select(col("doc_id"), shingleSet(col("text"), k).as("sh"))
    pairs
      .join(sets.select(col("doc_id").as("doc_a"), col("sh").as("sh_a")), Seq("doc_a"))
      .join(sets.select(col("doc_id").as("doc_b"), col("sh").as("sh_b")), Seq("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("pair_source"),
        size(array_intersect(col("sh_a"), col("sh_b"))).as("n_common"),
        size(array_union(col("sh_a"), col("sh_b"))).as("n_union"))
      .withColumn("jaccard_bp", expr("(10000 * n_common) DIV nullif(n_union, 0)"))
      .orderBy(col("jaccard_bp").desc, col("doc_a"), col("doc_b"))
      .limit(topN)
  }

  /** SimHash: 64-bit signature from per-token hash bit votes, computed
    * row-local with a codegen'd native expression (the nested
    * higher-order formulation evaluated interpreted, one 64-array per
    * token). */
  def simhash(text: Column): Column =
    graft.functions.HashExpressions.simhash64(
      transform(tokens(text), t => xxhash64(t)))

  /** q32: per-doc SimHash profile with 16-bit chunk banding — docs
    * sharing any of the 4 chunks are hamming-near candidates. */
  def simhashProfile(docs: DataFrame): DataFrame = {
    val withSig = docs.select(col("doc_id"), simhash(col("text")).as("simhash"))
    val chunkCols = (0 until 4).map(j =>
      struct(lit(j).as("band_idx"),
        shiftright(col("simhash"), 16 * j).bitwiseAND(lit(0xFFFFL)).as("band_hash")))
    val bandsDf = withSig
      .select(col("doc_id"), col("simhash"), explode(array(chunkCols: _*)).as("b"))
      .select(col("doc_id"), col("simhash"), col("b.band_idx"), col("b.band_hash"))
    val buckets = bandsDf.groupBy("band_idx", "band_hash")
      .agg(count(lit(1)).as("bucket_n"))
    bandsDf.join(buckets, Seq("band_idx", "band_hash"))
      .groupBy("doc_id")
      .agg(max(col("simhash")).as("simhash"),
        sum(col("bucket_n") - 1).as("n_band_mates"))
      .orderBy("doc_id")
  }
}
