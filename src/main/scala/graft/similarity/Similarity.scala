package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (Array[Float]): brute-force
  * cosine top-k as the exact baseline, and random-hyperplane LSH
  * bucketing as the scale path (all-pairs → equi-join on bucket).
  *
  * All dot products are sequential left-folds over the vector elements
  * (functions.aggregate / zip_with) so the DuckDB oracle — written with
  * the same fold order — produces bit-identical doubles before rounding.
  */
object Similarity {

  /** Sequential-fold dot product of two double arrays. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors per query vector (brute force — the
    * correctness baseline; at scale restrict `queries` or use the LSH
    * path). Embeddings cast to double before any arithmetic. */
  def bruteTopK(embeddings: DataFrame, k: Int = 3,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueryId: Long = Long.MaxValue): DataFrame = {
    val base = embeddings.select(col(idCol).as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
    val queries = base.filter(col("id") < maxQueryId)
      .select(col("id").as("qid"), col("v").as("qv"))
    val scored = queries.join(base, col("qid") =!= col("id"))
      .select(col("qid"), col("id").as("nid"),
        round(cosine(col("qv"), col("v")), 6).as("cos"))
    import org.apache.spark.sql.expressions.Window
    scored.withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic ±1 hyperplane weight for (plane, dim): parity of the
    * last hex digit of md5("p-d"). Same formula in the oracle. */
  def planeWeight(p: Int, d: Column): Column =
    when(conv(substring(md5(concat_ws("-", lit(p), d)), 32, 1), 16, 10)
      .cast("long") % 2 === 0, lit(1.0d)).otherwise(lit(-1.0d))

  /** Random-hyperplane LSH bucket id (numPlanes sign bits → BIGINT). */
  def lshBucket(vec: Column, numPlanes: Int = 8, dims: Int = 64): Column = {
    val planes = (0 until numPlanes).map { p =>
      val proj = aggregate(
        zip_with(vec, sequence(lit(0), lit(dims - 1)),
          (x, d) => x.cast("double") * planeWeight(p, d)),
        lit(0.0d), (acc, x) => acc + x)
      when(proj > 0, lit(1L << p)).otherwise(lit(0L))
    }
    planes.reduce(_ + _)
  }

  /** LSH candidate pairs: vectors sharing a hyperplane-sign bucket.
    * Equi-join on the bucket id — the distributed ANN scale path; follow
    * with exact cosine on candidates only. */
  def lshCandidatePairs(embeddings: DataFrame, numPlanes: Int = 8,
      dims: Int = 64, idCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame = {
    val b = embeddings.select(col(idCol).as("id"),
      lshBucket(col(vecCol), numPlanes, dims).as("bucket"))
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id1"), col("b.id").as("id2"), col("a.bucket"))
  }
}
