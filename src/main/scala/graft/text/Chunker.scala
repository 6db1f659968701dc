package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the training-prep step that turns
  * long documents into fixed-size overlapping token windows (context
  * windows, RAG passages). Pure per-row explode: no shuffle, no state,
  * embarrassingly parallel at 100 TB; the output carries enough
  * provenance (doc_id, chunk_idx, start_tok) to reassemble or
  * deduplicate chunks later.
  */
object Chunker {

  /** Chunk every doc into windows of `chunkSize` tokens advancing by
    * `chunkSize − overlap`: window starts are 0, step, 2·step, … < n
    * (so the final window may be short; a doc shorter than one chunk
    * yields exactly one window). Tokenization is [[TextOps.tokens]].
    * Returns (doc_id, chunk_idx, start_tok, n_toks, chunk_text).
    * Empty docs (no tokens) yield no rows. */
  def chunk(docs: DataFrame, chunkSize: Int = 64, overlap: Int = 16,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got $chunkSize/$overlap")
    val step = chunkSize - overlap
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"),
        posexplode(sequence(lit(0), size(col("t")) - 1, lit(step)))
          .as(Seq("chunk_idx", "start_tok")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("start_tok").cast("long").as("start_tok"),
        size(slice(col("t"), col("start_tok") + 1, lit(chunkSize)))
          .cast("long").as("n_toks"),
        array_join(slice(col("t"), col("start_tok") + 1, lit(chunkSize)),
          " ").as("chunk_text"))
  }
}
