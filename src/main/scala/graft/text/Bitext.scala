package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Comparable-corpus mining — the precursor stage of bitext/parallel
  * data pipelines (Resnik & Smith 2003, "The Web as a Parallel
  * Corpus"): find CROSS-LANGUAGE document pairs that share enough RARE
  * anchor tokens (names, numbers, codes survive translation verbatim;
  * frequent words pair everything with everything). Candidates flow
  * through an inverted-index equi-join restricted to tokens with
  * 2 ≤ df ≤ `maxDf` — the df ceiling bounds every token's pair
  * fan-out at maxDf², which is what keeps the join linear at corpus
  * scale (the PPJoin/LSH discipline: never join on a hot key).
  */
object Bitext {

  /** Cross-language pairs sharing ≥ `minShared` distinct rare tokens
    * (2 ≤ df ≤ `maxDf`). Returns (id1, id2, lang1, lang2, n_shared)
    * with id1 < id2 and lang1 ≠ lang2. */
  def comparablePairs(docs: DataFrame, minShared: Int = 2,
      maxDf: Int = 10, idCol: String = "doc_id",
      langCol: String = "lang", textCol: String = "text"): DataFrame = {
    val postings = docs.select(col(idCol).cast("long").as("id"),
        col(langCol).as("lang"),
        explode(array_distinct(TextOps.tokens(col(textCol))))
          .as("token"))
      .filter(col("token") =!= "")
    val rare = postings.groupBy(col("token"))
      .agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("token"))
    val rp = postings.join(rare, Seq("token"), "left_semi")
    rp.as("a").join(rp.as("b"),
        col("a.token") === col("b.token") &&
        col("a.id") < col("b.id") &&
        col("a.lang") =!= col("b.lang"))
      .groupBy(col("a.id").as("id1"), col("b.id").as("id2"),
        col("a.lang").as("lang1"), col("b.lang").as("lang2"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
