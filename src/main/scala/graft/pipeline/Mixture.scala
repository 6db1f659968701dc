package graft.pipeline

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixture planning: given target corpus shares per stratum
  * (language, source domain) in ppm and a total token budget, compute
  * per-stratum actual token counts and the integer sampling-rate /
  * epoch factors that realize the mixture — the "how many epochs of
  * Wikipedia, what downsample of CommonCrawl" table every pre-training
  * run starts from.
  *
  * All decisions are integer-exact. Products that could overflow at
  * trillion-token scale are computed by quotient/remainder
  * decomposition — floor(a·p/10⁶) = (a div 10⁶)·p + (a mod 10⁶)·p div
  * 10⁶ — which is exact while keeping every intermediate ≤ max(a, 10¹²).
  * One aggregation over the corpus; the targets broadcast.
  */
object Mixture {

  /** Plan rows: (stratum, n_toks actual, want_toks, keep_ppm, epochs).
    *  - `want_toks`  = floor(budget · target_ppm / 10⁶);
    *  - `keep_ppm`   = min(10⁶, floor(10⁶ · want / actual)) — the
    *    downsample rate when the stratum is over-represented;
    *  - `epochs`     = ceil(want / actual) — the repeat factor when it
    *    is under-represented (0 when the target is 0).
    * `budgetTokens = None` re-mixes at the corpus's own total size.
    * Strata absent from `targetsPpm` get target 0 (dropped strata). */
  def plan(docs: DataFrame, targetsPpm: Map[String, Long],
      budgetTokens: Option[Long] = None, strataCol: String = "lang",
      textCol: String = "text"): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val actual = docs
      .groupBy(col(strataCol).as("stratum"))
      .agg(sum(graft.text.TextOps.tokenCount(col(textCol)).cast("long"))
        .as("n_toks"))
    val withBudget = budgetTokens match {
      case Some(b) => actual.withColumn("b", lit(b))
      case None =>
        // 1×1 scalar-summary combine (same pattern as the other
        // whole-corpus scalars) — not a data cross join
        actual.crossJoin(
          actual.agg(sum(col("n_toks")).as("b")))
    }
    val targets = broadcast(
      targetsPpm.toSeq.toDF("stratum", "target_ppm"))
    val t = withBudget.join(targets, Seq("stratum"), "left")
      .withColumn("target_ppm", coalesce(col("target_ppm"), lit(0L)))
    import graft.time.Buckets.intDiv
    val M = lit(1000000L)
    // want = floor(b · ppm / 1e6) via q/r decomposition (overflow-safe)
    val want = intDiv(col("b"), M) * col("target_ppm") +
      intDiv(pmod(col("b"), M) * col("target_ppm"), M)
    val planned = t.withColumn("want_toks", want)
    // keep_ppm = min(1e6, floor(1e6 · want / actual)), same decomposition;
    // a zero-token stratum (all-empty texts) plans to 0/0 instead of
    // dividing by zero (ANSI division would throw)
    val keep = when(col("n_toks") === 0L, 0L).otherwise(least(M,
      intDiv(col("want_toks"), col("n_toks")) * M +
        intDiv(pmod(col("want_toks"), col("n_toks")) * M, col("n_toks"))))
    val epochs = when(col("n_toks") === 0L, 0L).otherwise(
      intDiv(col("want_toks") + col("n_toks") - 1, col("n_toks")))
    planned.select(col("stratum"), col("n_toks"), col("want_toks"),
      keep.as("keep_ppm"), greatest(epochs, lit(0L)).as("epochs"))
  }

  /** MATERIALIZE a [[plan]]: each doc appears `floor(want/actual)` full
    * epochs plus one more iff its deterministic hash draw falls under
    * the remainder rate — so per stratum the expected token mass equals
    * `want_toks` (row-level sampling approximates token-level; the
    * standard trade). Downsampling is the epochs = 0 case of the same
    * formula. Output = input columns + `copy` (0-based epoch index);
    * deterministic under any partitioning ([[PipelineOps.hashDraw]]).
    * The plan broadcasts (strata-sized). */
  def applyPlan(docs: DataFrame, planDf: DataFrame,
      strataCol: String = "lang", idCol: String = "doc_id"): DataFrame = {
    import graft.time.Buckets.intDiv
    val M = lit(1000000L)
    val p = planDf.select(col("stratum").as(strataCol),
      col("n_toks"), col("want_toks"))
      .filter(col("n_toks") > 0)  // zero-token strata emit nothing
    val joined = docs.join(broadcast(p), Seq(strataCol))
    val full = intDiv(col("want_toks"), col("n_toks"))
    val remPpm = intDiv(pmod(col("want_toks"), col("n_toks")) * M,
      col("n_toks"))
    val nCopies = (full + when(
      PipelineOps.hashDraw(col(idCol)) < remPpm, 1L).otherwise(0L))
      .as("n_copies")
    joined.withColumn("n_copies", nCopies)
      .filter(col("n_copies") > 0)
      .select(docs.columns.map(col).toIndexedSeq :+
        explode(sequence(lit(0L), col("n_copies") - 1)).as("copy"): _*)
  }
}
