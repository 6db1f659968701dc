package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed byte-pair-encoding vocabulary induction (Sennrich et al.
  * 2016) — tokenizer training over a corpus.
  *
  * Scale shape: all per-round work runs over the DISTINCT-WORD frequency
  * table, not the corpus — the classic BPE trick that makes tokenizer
  * training corpus-size-independent after one counting pass (vocab is
  * ~10⁵-10⁶ rows at 100 TB while the corpus is 10¹¹ docs). Pair
  * counting is a map-side-combinable hash aggregation; the only
  * driver-side data per round is the single winning pair. Each round
  * cuts lineage ([[graft.util.Checkpoints.cut]]) so `numMerges` rounds
  * don't grow task binaries; pass `checkpointDir` on preemptible
  * clusters.
  */
object Bpe {

  /** Corpus → distinct-word frequency table (word, cnt), tokenized by
    * [[TextOps.tokens]]. The one corpus-sized pass. */
  def wordCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(explode(TextOps.tokens(col(textCol))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))

  /** Character-split each word: (word, cnt, syms: array<string>). */
  def initSymbols(words: DataFrame): DataFrame =
    words.select(col("word"), col("cnt"),
      transform(sequence(lit(1), length(col("word"))),
        i => substr(col("word"), i, lit(1))).as("syms"))

  /** Adjacent symbol-pair counts weighted by word frequency:
    * (left, right, cnt). Partial-aggregates map-side; the shuffle
    * carries pair partials, not words. */
  def pairCounts(words: DataFrame): DataFrame =
    words
      .filter(size(col("syms")) >= 2)
      .select(col("cnt"), explode(
        transform(sequence(lit(0), size(col("syms")) - 2),
          i => struct(element_at(col("syms"), i + 1).as("left"),
            element_at(col("syms"), i + 2).as("right")))).as("p"))
      .groupBy(col("p.left").as("left"), col("p.right").as("right"))
      .agg(sum(col("cnt")).as("cnt"))

  /** One merge round: greedy non-overlapping left-to-right replacement
    * of adjacent (l, r) with the concatenated symbol, as a single
    * `aggregate` fold per word — no shuffle, no UDF. */
  private[graft] def mergePair(words: DataFrame, l: String,
      r: String): DataFrame = {
    val emptyAcc = array().cast("array<string>")
    val noPrev = lit(null).cast("string")
    val merged = aggregate(
      col("syms"),
      struct(emptyAcc.as("acc"), noPrev.as("prev")),
      (st, x) => {
        val acc = st.getField("acc")
        val prev = st.getField("prev")
        when(prev.isNull, struct(acc.as("acc"), x.as("prev")))
          .when(prev === lit(l) && x === lit(r),
            struct(concat(acc, array(concat_ws("", prev, x))).as("acc"),
              noPrev.as("prev")))
          .otherwise(
            struct(concat(acc, array(prev)).as("acc"), x.as("prev")))
      },
      st => when(st.getField("prev").isNull, st.getField("acc"))
        .otherwise(concat(st.getField("acc"),
          array(st.getField("prev")))))
    words.select(col("word"), col("cnt"), merged.as("syms"))
  }

  /** Learn up to `numMerges` merges; stops early when no pair reaches
    * `minCount`. Returns the ordered merge table
    * (rank, left, right, pair_cnt) — a tokenizer's merges.txt. Winner
    * per round = max count, ties broken (left, right) ascending (as
    * UTF-8 bytes, Spark's string order), so the result is deterministic
    * under any partitioning.
    *
    * Runtime adaptation (the `clusterLabelsStar` discipline): the merge
    * loop is inherently sequential — one Spark job per round is 32k
    * scheduler round-trips for a real vocab, pure latency on a cluster.
    * When the distinct-word table has at most `localThreshold` rows
    * (checked with a single `limit(n+1).collect()` probe that doubles
    * as the data fetch), ALL rounds run in one driver-local loop with
    * bit-identical results (spec-pinned parity, including UTF-8
    * tie-break order). The distinct-word table is vocab-sized
    * (~10⁵-10⁶ rows even at 100 TB corpus scale), so the local path is
    * the common case; the distributed loop remains for degenerate
    * vocabularies past the threshold. */
  def learnMerges(docs: DataFrame, numMerges: Int = 10,
      minCount: Long = 2L, textCol: String = "text",
      checkpointDir: Option[String] = None,
      localThreshold: Int = 1 << 20): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words0 = initSymbols(wordCounts(docs, textCol))
    val probe =
      if (localThreshold <= 0) Array.empty[org.apache.spark.sql.Row]
      else words0.select(col("cnt"), col("syms"))
        .limit(localThreshold + 1).collect()
    val merges: Seq[(Long, String, String, Long)] =
      if (localThreshold > 0 && probe.length <= localThreshold) {
        // probe returned strictly fewer rows than its limit ⇒ it IS the
        // whole table
        localLearn(probe.map(r =>
          (r.getLong(0), r.getSeq[String](1).toArray)), numMerges, minCount)
      } else distributedLearn(words0, numMerges, minCount, checkpointDir)
    merges.toDF("rank", "left", "right", "pair_cnt")
  }

  /** Unsigned UTF-8 byte comparison — Spark's UTF8String order, so the
    * local loop's tie-break matches `orderBy(col("left"), col("right"))`
    * exactly, supplementary-plane symbols included. */
  private def utf8Cmp(a: String, b: String): Int =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  private def utf8Lt(a: String, b: String): Boolean = utf8Cmp(a, b) < 0

  /** Greedy non-overlapping left-to-right replacement — the local twin
    * of [[mergePair]]'s fold (same prev/emit state machine). */
  private def applyMergeLocal(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Driver-local merge loop over the collected word table: identical
    * winner selection (max cnt, ties (left, right) ascending by UTF-8
    * bytes) and merge application as the distributed rounds.
    *
    * INCREMENTAL (r9 ADVICE: the previous full pair-count rebuild per
    * round was O(numMerges × total symbol positions) — hours of driver
    * time for a 32k-merge vocab near the 2²⁰-word threshold). State:
    * exact pair counts, a pair → word-index occurrence map, and a
    * lazy-invalidation max-heap of (cnt, left, right) snapshots ordered
    * exactly like the selection scan (cnt desc, then UTF-8-ascending
    * tie-break). A merge touches only the words that CONTAIN the
    * winning pair, applying per-word count deltas and pushing fresh
    * heap snapshots; stale snapshots pop off harmlessly (their count no
    * longer matches). Per round: O(affected positions · log P) instead
    * of O(total positions) — the merge sequence is bit-identical to the
    * full-rebuild loop (same counts, same comparator), which the
    * local-vs-distributed parity spec pins. */
  private def localLearn(words0: Array[(Long, Array[String])],
      numMerges: Int, minCount: Long): Seq[(Long, String, String, Long)] = {
    val words = words0.clone()
    def pairsOf(syms: Array[String]): Array[(String, String)] =
      if (syms.length < 2) Array.empty
      else Array.tabulate(syms.length - 1)(i => (syms(i), syms(i + 1)))
    val counts = new java.util.HashMap[(String, String), java.lang.Long]()
    val occur =
      new java.util.HashMap[(String, String), java.util.HashSet[Integer]]()
    val pq = new java.util.PriorityQueue[(Long, String, String)](
      math.max(16, words.length),
      new java.util.Comparator[(Long, String, String)] {
        override def compare(x: (Long, String, String),
            y: (Long, String, String)): Int = {
          if (x._1 != y._1) java.lang.Long.compare(y._1, x._1)
          else {
            val c = utf8Cmp(x._2, y._2)
            if (c != 0) c else utf8Cmp(x._3, y._3)
          }
        }
      })
    var wi = 0
    while (wi < words.length) {
      val (cnt, syms) = words(wi)
      pairsOf(syms).foreach { p =>
        counts.merge(p, cnt, (a, b) => a + b)
        occur.computeIfAbsent(p,
          _ => new java.util.HashSet[Integer]()).add(wi): Unit
      }
      wi += 1
    }
    counts.forEach { (k, c) => pq.add((c.longValue(), k._1, k._2)): Unit }
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < numMerges && !done) {
      // pop stale snapshots until the top reflects a current count; the
      // newest snapshot of every live pair is always present, so the
      // first current one IS the scan winner (same comparator)
      var best: (String, String) = null
      var bestCnt = Long.MinValue
      var searching = true
      while (searching) {
        val top = pq.peek()
        if (top == null) searching = false
        else {
          val cur = counts.get((top._2, top._3))
          if (cur != null && cur.longValue() == top._1) {
            best = (top._2, top._3); bestCnt = top._1; searching = false
          } else { pq.poll(): Unit }
        }
      }
      if (best == null || bestCnt < minCount) done = true
      else {
        merges += ((rank, best._1, best._2, bestCnt))
        val affected = occur.get(best)
        if (affected != null) {
          val touched = affected.toArray(new Array[Integer](affected.size()))
          touched.foreach { w =>
            val (cnt, old) = words(w)
            val neu = applyMergeLocal(old, best._1, best._2)
            val oldPairs = pairsOf(old)
            val newPairs = pairsOf(neu)
            val delta = new java.util.HashMap[(String, String),
              java.lang.Long]()
            oldPairs.foreach(p => delta.merge(p, -cnt, (a, b) => a + b))
            newPairs.foreach(p => delta.merge(p, cnt, (a, b) => a + b))
            delta.forEach { (p, d) =>
              if (d.longValue() != 0) {
                val nv = counts.merge(p, d, (a, b) => a + b)
                if (nv.longValue() == 0) { counts.remove(p): Unit }
                else pq.add((nv.longValue(), p._1, p._2)): Unit
              }
            }
            val oldSet = oldPairs.toSet
            val newSet = newPairs.toSet
            oldSet.diff(newSet).foreach { p =>
              val s = occur.get(p)
              if (s != null) {
                s.remove(w): Unit
                if (s.isEmpty) { occur.remove(p): Unit }
              }
            }
            newSet.diff(oldSet).foreach { p =>
              occur.computeIfAbsent(p,
                _ => new java.util.HashSet[Integer]()).add(w): Unit
            }
            words(w) = (cnt, neu)
          }
        }
        rank += 1
      }
    }
    merges.toSeq
  }

  /** One-Spark-job-per-round merge loop — the past-threshold path. */
  private def distributedLearn(words0: DataFrame, numMerges: Int,
      minCount: Long, checkpointDir: Option[String])
      : Seq[(Long, String, String, Long)] = {
    var words = words0.persist()
    val merges = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var rank = 0L
    var done = false
    while (rank < numMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left"), col("right"))
        .limit(1).collect()
      if (top.isEmpty || top(0).getAs[Long]("cnt") < minCount) done = true
      else {
        val (l, r, c) = (top(0).getAs[String]("left"),
          top(0).getAs[String]("right"), top(0).getAs[Long]("cnt"))
        merges += ((rank, l, r, c))
        val next = graft.util.Checkpoints.cut(
          mergePair(words, l, r), checkpointDir).persist()
        words.unpersist()
        words = next
        rank += 1
      }
    }
    words.unpersist()
    merges.toSeq
  }

  /** Subword vocabulary from a segmented word table: (sym, sym_id, n)
    * ranked by (total count desc, symbol asc), ids dense from 0 — a
    * tokenizer's vocab.json. Id assignment is the J5 SeqID pattern
    * (range-partitioned sort + zipWithIndex): globally dense ids with
    * per-partition counting only, no global window. */
  def vocab(segmented: DataFrame): DataFrame = {
    val spark = segmented.sparkSession
    val counts = segmented
      .select(explode(col("syms")).as("sym"), col("cnt"))
      .groupBy(col("sym")).agg(sum(col("cnt")).as("n"))
    val sorted = counts.sort(col("n").desc, col("sym"))
    val schema = org.apache.spark.sql.types.StructType(
      sorted.schema.fields :+
        org.apache.spark.sql.types.StructField("sym_id",
          org.apache.spark.sql.types.LongType, nullable = false))
    spark.createDataFrame(
      sorted.rdd.zipWithIndex().map { case (r, i) =>
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ i) },
      schema).select(col("sym"), col("sym_id"), col("n"))
  }

  /** ENCODE the corpus with a learned merge table: every doc becomes
    * its subword-id sequence (doc_id, ids: array<long>) — the
    * tokenize-the-corpus end stage. The heavy lifting rides the
    * distinct-word trick twice: segmentation and the vocab are
    * vocab-sized frames that broadcast into the corpus-sized joins;
    * per-doc order is restored by sorting (word position, subword
    * position) pairs inside the final aggregation, not with a window.
    *
    * `fixedVocab`: pass the TRAINING corpus's [[vocab]] when encoding
    * later batches, so sym_ids stay stable across batches (a
    * batch-derived vocab would re-rank by that batch's frequencies and
    * silently mix id spaces in concatenated shards). Subwords absent
    * from a fixed vocab are dropped (OOV) — train the merges on the
    * same corpus as the vocab and every subword is covered. Docs with
    * no tokens emit (doc_id, []) rather than disappearing. */
  def encode(docs: DataFrame, merges: Seq[(String, String)],
      idCol: String = "doc_id", textCol: String = "text",
      checkpointDir: Option[String] = None,
      fixedVocab: Option[DataFrame] = None): DataFrame = {
    val seg = segment(docs, merges, textCol, checkpointDir)
    val v = fixedVocab.getOrElse(vocab(seg))
    // resolve each word's subword ids IN ORDER via posexplode (a
    // symbol may repeat within a word)
    val wordIds = seg
      .select(col("word"), posexplode(col("syms")).as(Seq("spos", "sym")))
      .join(v.select(col("sym"), col("sym_id")), Seq("sym"))
      .groupBy(col("word"))
      .agg(transform(
        sort_array(collect_list(struct(col("spos"), col("sym_id")))),
        p => p.getField("sym_id")).as("wids"))
    val positioned = docs
      .select(col(idCol).as("doc_id"),
        posexplode(TextOps.tokens(col(textCol))).as(Seq("wpos", "word")))
      .join(wordIds, Seq("word"))
    // doc-sized gather → BoundedCollect (one group's buffer at a time
    // past the byte threshold; adaptive via plan statistics, no probe
    // job) — see graft.util.BoundedCollect / Tables.sessionConfs
    val encoded = graft.util.BoundedCollect.sortedGather(
        positioned.select(col("doc_id"), col("wpos"), col("wids")),
        Seq("doc_id"), Seq("wpos"), "wids", "widss")
      .select(col("doc_id"), flatten(col("widss")).as("ids"))
    // token-less docs (empty/null text) keep a row with an empty array
    docs.select(col(idCol).as("doc_id"))
      .join(encoded, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("ids"), array().cast("array<bigint>")).as("ids"))
  }

  /** Segment words with a learned merge table: replays the merges in
    * rank order over the distinct-word frame and returns
    * (word, cnt, syms) — the subword segmentation a tokenizer applies.
    * Merge application is vocab-sized work, like training. */
  def segment(docs: DataFrame, merges: Seq[(String, String)],
      textCol: String = "text",
      checkpointDir: Option[String] = None): DataFrame = {
    var words = initSymbols(wordCounts(docs, textCol))
    var i = 0
    merges.foreach { case (l, r) =>
      words = mergePair(words, l, r)
      i += 1
      // cut every few rounds: the fold expressions nest otherwise
      if (i % 4 == 0) words = graft.util.Checkpoints.cut(words, checkpointDir)
    }
    words
  }
}
