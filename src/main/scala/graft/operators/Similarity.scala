package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Vector similarity over an embedding column (SURVEY.md §2C):
  * embedding-cosine near-dup pairs, brute-force cosine top-k, and a
  * random-hyperplane-LSH bucketed variant (the 100 TB path: equality
  * join on bucket id instead of a cartesian product).
  *
  * Dot products use zip_with + aggregate over the array column —
  * builtin higher-order functions, evaluated row-local. Vectors are
  * L2-normalized once up front so every pair comparison is a plain dot
  * product.
  */
object Similarity {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, v) => acc + v)

  /** embeddings + unit-normalized vector column. */
  def withUnit(embeddings: DataFrame): DataFrame =
    embeddings
      .withColumn("__norm", sqrt(dot(col("embedding"), col("embedding"))))
      .withColumn("unit", transform(col("embedding"), x => x / col("__norm")))
      .drop("__norm")

  /** q34: top-N most-similar embedding pairs (near-dup screen).
    * All-pairs is acceptable at validation scale; the LSH variant below
    * is the production path — same output schema. */
  def nearDupPairs(embeddings: DataFrame, topN: Int = 100): DataFrame = {
    val e = withUnit(embeddings).select(col("vec_id"), col("unit"))
    val a = e.select(col("vec_id").as("id_a"), col("unit").as("u_a"))
    val b = e.select(col("vec_id").as("id_b"), col("unit").as("u_b"))
    a.crossJoin(b)
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), dot(col("u_a"), col("u_b")).as("cosine"))
      .orderBy(col("cosine").desc, col("id_a"), col("id_b"))
      .limit(topN)
  }

  /** q35: brute-force cosine top-k neighbors for a query set — the
    * exact baseline the ANN variants are judged against. */
  def knnBruteForce(embeddings: DataFrame, nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = withUnit(embeddings).select(col("vec_id"), col("unit"))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("unit").as("u_q"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("unit").as("u_c"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("u_q"), col("u_c")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }

  /** deterministic random hyperplanes (seeded) as array literals. */
  private def planes(nPlanes: Int, dim: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
  }

  /** sign-bucket id from nPlanes hyperplane sides. */
  def lshBucket(unit: Column, nPlanes: Int, dim: Int): Column =
    planes(nPlanes, dim).zipWithIndex.map { case (p, j) =>
      when(dot(unit, typedLit(p)) > 0, 1 << j).otherwise(0)
    }.reduce(_ + _)

  /** q36: ANN top-k via random-hyperplane LSH — candidates come from an
    * equality join on the bucket id (shuffle on a small int key; at
    * 100 TB this replaces the quadratic cross join; recall traded for
    * the multi-probe/plane-count knobs). */
  def knnLsh(embeddings: DataFrame, nPlanes: Int = 8, dim: Int = 64,
             nQueries: Int = 20, k: Int = 10): DataFrame = {
    val e = withUnit(embeddings)
      .select(col("vec_id"), col("unit"))
      .withColumn("bucket", lshBucket(col("unit"), nPlanes, dim))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("query_id"), col("unit").as("u_q"), col("bucket"))
    val c = e.select(col("vec_id").as("neighbor_id"), col("unit").as("u_c"), col("bucket"))
    val scored = q.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"),
        dot(col("u_q"), col("u_c")).as("cosine"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .orderBy("query_id", "rank")
  }
}
