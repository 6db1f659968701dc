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

  /** Content-defined chunking (the FastCDC/Rabin-fingerprint idea
    * re-expressed over tokens): a chunk boundary opens at token
    * position i (1 ≤ i ≤ n−k) whenever the k-token window starting at
    * i hashes into the cut bucket (md5-derived bucket % `divisor` = 0,
    * so expected chunk length ≈ divisor tokens). Unlike the fixed
    * windows of [[chunk]], boundaries move WITH the content: an
    * insertion shifts only the chunk it touches and every later chunk
    * re-aligns on the same content cut — the property that makes
    * chunk-hash dedup stable across document revisions (spec-proven).
    * Emits (doc_id, chunk_idx, start_tok, n_toks, chunk_md5); empty
    * docs yield no rows. Pure nested array expressions (the winnowing
    * discipline): zero shuffle, embarrassingly parallel at 100 TB, and
    * every piece (md5-hex bucket, slice joins) states verbatim in the
    * oracle. */
  def chunkCdc(docs: DataFrame, k: Int = 3, divisor: Int = 8,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1 && divisor >= 1, s"need k, divisor >= 1, got $k/$divisor")
    val t = col("t")
    val n = size(t)
    def bucket(i: org.apache.spark.sql.Column) =
      conv(substring(md5(array_join(slice(t, i + 1, lit(k)), " ")), 1, 8),
        16, 10).cast("long") % divisor
    // boundary positions, ascending; sequence(1, n-k) only when n > k
    // (Spark's sequence runs DESCENDING for start > stop — guard it)
    val bs = when(n > k,
        filter(sequence(lit(1L), (n - k).cast("long")), i => bucket(i) === 0L))
      .otherwise(array().cast("array<long>"))
    val starts = concat(array(lit(0L)), bs)
    val ends = concat(bs, array(n.cast("long")))
    docs.select(col(idCol).as("doc_id"),
        TextOps.tokens(col(textCol)).as("t"))
      .filter(size(col("t")) > 0)
      .select(col("doc_id"), col("t"), starts.as("ss"), ends.as("es"))
      .select(col("doc_id"), col("t"),
        posexplode(arrays_zip(col("ss"), col("es")))
          .as(Seq("chunk_idx", "se")))
      .select(col("doc_id"),
        col("chunk_idx").cast("long").as("chunk_idx"),
        col("se.ss").as("start_tok"),
        (col("se.es") - col("se.ss")).as("n_toks"),
        md5(array_join(slice(col("t"), col("se.ss") + 1,
          (col("se.es") - col("se.ss")).cast("int")), " ")).as("chunk_md5"))
  }
}
