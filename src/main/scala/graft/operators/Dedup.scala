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

  /** hashed k-word shingles via the codegen rotate-xor expression; a
    * doc shorter than k words contributes one shingle mixing all its
    * tokens. The only interpreted step left is the per-token xxhash64
    * lambda (one pass). */
  def shingleHashes(text: Column, k: Int): Column =
    graft.functions.HashExpressions.shingle_hashes(
      transform(tokens(text), t => xxhash64(t)), k)

  /** distinct shingle hash set — for the exact Jaccard pass (long set
    * ops are ~an order of magnitude cheaper than string sets; the
    * 64-bit mix makes collisions negligible at corpus scale). */
  def shingleSet(text: Column, k: Int): Column =
    array_distinct(shingleHashes(text, k))

  /** MinHash signature: numHashes permuted minima over the shingle
    * hashes — one codegen loop, no explode, no shuffle. */
  def minhashSignature(text: Column, numHashes: Int, k: Int): Column =
    graft.functions.HashExpressions.minhash_signature(
      shingleHashes(text, k), permSeeds(numHashes))

  /** (doc_id, band_idx, band_hash) — one row per band; equal band_hash
    * within a band ⇒ candidate duplicates. */
  def minhashBands(docs: DataFrame, numHashes: Int = 32, bands: Int = 8,
                   k: Int = 3): DataFrame = {
    val r = numHashes / bands
    val sigs = docs.select(col("doc_id"),
      minhashSignature(col("text"), numHashes, k).as("sig"))
    val bandCols = (0 until bands).map(j =>
      hash(lit(j), slice(col("sig"), j * r + 1, r)))
    sigs
      .select(col("doc_id"), posexplode(array(bandCols: _*)))
      .withColumnRenamed("pos", "band_idx")
      .withColumnRenamed("col", "band_hash")
  }

  /** q31: per-doc MinHash profile — is the doc a banding candidate
    * duplicate, and how many band-mates does it have. */
  def minhashProfile(docs: DataFrame): DataFrame = {
    // bucket sizes via window count — a groupBy+self-join would
    // recompute the whole signature pipeline for the second branch
    val w = Window.partitionBy("band_idx", "band_hash")
    minhashBands(docs)
      .withColumn("bucket_n", count(lit(1)).over(w))
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
    val w = Window.partitionBy("band_idx", "band_hash")
    bandsDf
      .withColumn("bucket_n", count(lit(1)).over(w))
      .groupBy("doc_id")
      .agg(max(col("simhash")).as("simhash"),
        sum(col("bucket_n") - 1).as("n_band_mates"))
      .orderBy("doc_id")
  }
}
