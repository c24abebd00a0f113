package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over an embedding column (`array<float>`).
 *
 * - `bruteForceTopK`: exact cosine top-k — the correctness baseline. The
 *   pair join is a broadcast of the (small) query set against the corpus;
 *   dot products run inside codegen via `zip_with`/`aggregate` higher-order
 *   functions, no UDF.
 * - `lshTopK`: the scale path — random-hyperplane LSH buckets shrink the
 *   candidate set from |corpus| to a bucket, turning the similarity scan
 *   into an equi-join on (bucket). Hyperplanes are derived deterministically
 *   from xxhash64(plane, dim) so executors need no shared RNG state.
 *
 * At 100 TB the brute-force path is only for small query batches
 * (broadcast); LSH (or an IVF coarse quantizer built with k-means — same
 * bucket-join shape) is the default.
 */
object Similarity {

  /** Cosine similarity between two array<float>/array<double> columns.
    * A custom codegen'd Catalyst expression (VectorExpressions.CosineSim):
    * Spark's higher-order functions run interpreted, which made this the
    * bottleneck of the whole similarity path. Element values are widened
    * to double before multiplying and accumulated left-to-right, matching
    * a SQL oracle's list_sum-with-casts bit-for-bit. */
  def cosine(a: Column, b: Column): Column =
    graft.functions.VectorExpressions.vecCosine(a, b)

  /**
   * Exact cosine top-k neighbors for each query vector.
   * @param corpus   (id, vec) — the full embedding table
   * @param queries  (id, vec) — small; broadcast against the corpus
   */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"))
    val scored = c.crossJoin(broadcast(q))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Random-hyperplane signature: bit i = sign(vec · plane_i), planes
    * derived deterministically from splitmix64(plane, dim) → ±1. A custom
    * codegen'd expression (VectorExpressions.HyperplaneSig) — executors
    * need no shared RNG state and the loop stays in WholeStageCodegen. */
  def hyperplaneSignature(vec: Column, nPlanes: Int): Column =
    graft.functions.VectorExpressions.hyperplaneSig(vec, nPlanes)

  /** LSH-bucketed approximate top-k: candidates share a hyperplane-signature
    * bucket; exact cosine re-ranks inside the bucket. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int, nPlanes: Int = 12,
              idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val c = corpus.select(col(idCol).as("nbr_id"), col(vecCol).as("nbr_vec"),
      hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("nbr_id"))
      .withColumn("cos", cosine(col("q_vec"), col("nbr_vec")))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("nbr_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "nbr_id", "cos", "rank")
  }

  /** Embedding-cosine near-duplicate pairs via LSH buckets (the embedding
    * variant of Dedup): pairs in the same bucket with cosine ≥ threshold. */
  def cosineNearDups(corpus: DataFrame, threshold: Double, nPlanes: Int = 10,
                     idCol: String = "vec_id", vecCol: String = "embedding"): DataFrame = {
    val sig = corpus.select(col(idCol).as("id"), col(vecCol).as("vec"),
      hyperplaneSignature(col(vecCol), nPlanes).as("bucket"))
    val a = sig.select(col("id").as("id_a"), col("vec").as("vec_a"), col("bucket"))
    val b = sig.select(col("id").as("id_b"), col("vec").as("vec_b"), col("bucket"))
    a.join(b, Seq("bucket"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select("id_a", "id_b", "cos")
      .dropDuplicates("id_a", "id_b")
  }
}
