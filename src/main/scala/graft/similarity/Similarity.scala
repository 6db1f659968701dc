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

  /** Sequential-fold dot product of two double arrays (generic-length
    * path; higher-order functions are INTERPRETED in Spark — prefer
    * [[dotFixed]] in hot loops). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  /** Unrolled fixed-dimension dot product: 64 explicit element_at
    * multiplications left-folded in index order — whole-stage codegen
    * compiles this flat expression, unlike transform/aggregate lambdas.
    * Same FP addition order as the sequential fold, so oracle math is
    * unchanged. */
  def dotFixed(a: Column, b: Column, dims: Int = 64): Column =
    (0 until dims).map(i =>
      element_at(a, i + 1) * element_at(b, i + 1)).reduce(_ + _)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Exact top-k cosine neighbors per query vector (brute force — the
    * correctness baseline; at scale restrict `queries` or use the LSH
    * path). Vectors are pre-normalized to unit length ONCE (one pass over
    * N rows) so the N×N join pays a single fused dot product per pair
    * instead of dot + two norms — 3× less arithmetic in the quadratic
    * stage. Embeddings cast to double before any arithmetic. */
  def bruteTopK(embeddings: DataFrame, k: Int = 3, dims: Int = 64,
      idCol: String = "vec_id", vecCol: String = "embedding",
      maxQueryId: Long = Long.MaxValue): DataFrame = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    // The pairwise scoring kernel is typed mapPartitions over BROADCAST
    // query vectors — the one place Catalyst expressions lose: a 64-term
    // unrolled dot exceeds the JIT method-size limit (interpreter
    // fallback, ~30×), and higher-order lambdas are interpreted.
    // A tight double-array loop JIT-compiles; the summation order is the
    // same sequential fold the oracle states, so results are identical.
    val base = embeddings.select(col(idCol).cast("long").as("id"),
      transform(col(vecCol), x => x.cast("double")).as("v"))
      .as[(Long, Seq[Double])]
      .map { case (id, v) =>
        val arr = v.toArray
        var s = 0.0d; var i = 0
        while (i < arr.length) { s += arr(i) * arr(i); i += 1 }
        val nrm = math.sqrt(s)
        (id, arr.map(_ / nrm))
      }
    val queries = spark.sparkContext.broadcast(
      base.filter(_._1 < maxQueryId).collect().sortBy(_._1))
    val scored = base.mapPartitions { it =>
      val qs = queries.value
      it.flatMap { case (nid, u) =>
        qs.iterator.filter(_._1 != nid).map { case (qid, qu) =>
          var s = 0.0d; var i = 0
          while (i < u.length) { s += qu(i) * u(i); i += 1 }
          (qid, nid, s)
        }
      }
    }.toDF("qid", "nid", "raw")
      .select(col("qid"), col("nid"), round(col("raw"), 6).as("cos"))
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

  /** Random-hyperplane LSH bucket id (numPlanes sign bits → BIGINT).
    * Unrolled per (plane, dim): the md5-derived ±1 weights are literal
    * expressions that constant-fold at optimization time, leaving 64
    * codegen'd multiply-adds per plane. */
  def lshBucket(vec: Column, numPlanes: Int = 8, dims: Int = 64): Column = {
    val planes = (0 until numPlanes).map { p =>
      val proj = (0 until dims).map(d =>
        element_at(vec, d + 1).cast("double") * planeWeight(p, lit(d)))
        .reduce(_ + _)
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
