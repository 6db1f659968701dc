package graft.tools
// Scratch timing probe (dev-only; not part of the driver contract).
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.sources.Tables
import graft.text.TextOps

object Probe {
  def main(args: Array[String]): Unit = {
    val b = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
    Tables.sessionConfs.foreach { case (k, v) => b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val docs = Tables.documents(spark, d).select(col("doc_id"), col("text"))
    def time(tag: String)(f: => Long): Unit = {
      f; val t0 = System.nanoTime(); val n = f
      println(f"STAGE $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
    }
    if (args.length > 1 && args(1) == "gate") {
      // Standalone per-gate A/B: `Probe <dir> gate <name> [runs]` — the
      // variance discipline (VERDICT r10 #2): fresh JVM, N back-to-back
      // timed runs of ONE gate, no suite contention.
      val name = args(2)
      val runs = if (args.length > 3) args(3).toInt else 3
      val q = graft.SparkEntry.queries(name)
      for (i <- 1 to runs) {
        val t0 = System.nanoTime()
        val n = q(spark, d).count()
        println(f"GATE $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "suite") {
      // in-suite overhead repro: does running materializing queries
      // beforehand slow a later query (lingering localCheckpoint RDDs)?
      time("q84-cold")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      time("q84-warm")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      Seq("q25_ann_topk", "q28_embed_neardup", "q36_neardup_clusters",
          "q50_dedup_corpus", "q21_ngram_jaccard").foreach { q =>
        time(q)(graft.SparkEntry.queries(q)(spark, d).count())
      }
      time("q84-after-suite")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      time("q84-after-suite2")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      println("storage: " + spark.sparkContext.getPersistentRDDs.size
        + " persistent RDDs live")
      spark.sparkContext.getPersistentRDDs.values.take(10).foreach(r =>
        println("  rdd " + r.id + " " + r.name + " " + r.getStorageLevel))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q50guard") {
      import graft.dedup.Dedup
      val docsG = docs.filter(assert_true(col("doc_id") < 10000,
        lit("doc_id must stay below the twin shift 10000")).isNull)
      val doubled = docsG.unionByName(docsG.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      try {
        val labels = Dedup.clusterLabelsStar(
          Dedup.minhashCandidatePairs(doubled))
        val dropped = labels.filter(col("id") =!= col("cluster"))
          .select(col("id").as("doc_id"))
        val anti = doubled.join(dropped, Seq("doc_id"), "left_anti")
        println("=== ANTI PLAN ===")
        println(anti.queryExecution.executedPlan.toString)
        println("anti = " + anti.count())
      } catch { case e: Throwable =>
        e.printStackTrace()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q25x") {
      import org.apache.spark.sql.expressions.Window
      import graft.similarity.Similarity.dot
      val emb = Tables.embeddings(spark, d)
      val base = emb.select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val unit = base.select(col("id"),
        transform(col("v"), x => x / sqrt(dot(col("v"), col("v")))).as("u"))
        .persist()
      def lane(spreadQ: Boolean): Long = {
        val q0 = unit.filter(col("id") < 500L)
          .select(col("id").as("qid"), col("u").as("qu"))
        val q = if (spreadQ) graft.util.Spread.spreadAmplified(q0) else q0
        val scored = q.join(unit, col("qid") =!= col("id"))
          .select(col("qid"), col("id").as("nid"),
            round(dot(col("qu"), col("u")), 6).as("cos"))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
          .filter(col("rank") <= 3).count()
      }
      time("no-spread")(lane(false))
      time("spread")(lane(true))
      time("no-spread2")(lane(false))
      time("spread2")(lane(true))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q25p") {
      import org.apache.spark.sql.expressions.Window
      import graft.similarity.Similarity.dot
      val emb = Tables.embeddings(spark, d)
      val base = emb.select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      val unit = base.select(col("id"),
        transform(col("v"), x => x / sqrt(dot(col("v"), col("v")))).as("u"))
        .persist()
      def lane(spreadQ: Boolean): org.apache.spark.sql.DataFrame = {
        val q0 = unit.filter(col("id") < 500L)
          .select(col("id").as("qid"), col("u").as("qu"))
        val q = if (spreadQ) graft.util.Spread.spreadAmplified(q0) else q0
        val scored = q.join(unit, col("qid") =!= col("id"))
          .select(col("qid"), col("id").as("nid"),
            round(dot(col("qu"), col("u")), 6).as("cos"))
        scored.withColumn("rank", row_number().over(
            Window.partitionBy(col("qid")).orderBy(desc("cos"), asc("nid"))))
          .filter(col("rank") <= 3)
      }
      val a = lane(false); a.count()
      println("===== FINAL PLAN no-spread =====")
      println(a.queryExecution.executedPlan.toString.take(4000))
      val b = lane(true); b.count()
      println("===== FINAL PLAN spread =====")
      println(b.queryExecution.executedPlan.toString.take(4000))
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q124") {
      import graft.multimodal.ImageDedup
      val doubled = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      val hashes = ImageDedup.stubImageHashesSql(doubled)
      time("stub-hashes")(hashes.count())
      val h = graft.util.Checkpoints.materialize(
        ImageDedup.stubImageHashesSql(doubled))
      time("pairs")(ImageDedup.nearDupPairs(h).count())
      val pairs = ImageDedup.nearDupPairs(h)
      time("cluster-star")(graft.dedup.Dedup.clusterLabelsStar(
        pairs.select(col("id1"), col("id2"))).count())
      time("full-op") {
        val (hh, cc) = ImageDedup.nearDupClustersAndHashes(
          ImageDedup.stubImageHashesSql(doubled))
        hh.join(cc, "media_id")
          .select(col("media_id"), col("ahash"), col("dhash"),
            col("cluster")).count()
      }
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q84") {
      import graft.dedup.Dedup
      import graft.functions.CollectCapped.collectCapped
      val doubled = docs.unionByName(docs.select(
        (col("doc_id") + 10000).as("doc_id"), col("text")))
      val ps = Dedup.positionedShingles(doubled, 3, "doc_id", "text")
      time("positioned-shingles")(ps.count())
      val grouped = ps.groupBy(col("shingle"))
        .agg(collectCapped(struct(col("id"), col("pos")), 64).as("occs"))
        .filter(col("occs").isNotNull)
        .select(col("occs"))
      time("grouped-capped")(grouped.count())
      val m = grouped
        .select(explode(col("occs")).as("a"), col("occs"))
        .select(col("a"), explode(col("occs")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
      time("match-frame")(m.count())
      time("full-op")(Dedup.sharedSpanPairs(doubled,
        minSpanTokens = 8, k = 3, maxOcc = 64).count())
      // A/B: count-prefilter the (pair, diag) groups below the minimum
      // run length before the island window — necessary-condition prune
      def prefilterShape(): Long = {
        val g2 = ps.groupBy(col("shingle"))
          .agg(collectCapped(struct(col("id"), col("pos")), 64).as("occs"))
          .filter(col("occs").isNotNull)
          .select(col("occs")).persist()
        val m2 = g2
          .select(explode(col("occs")).as("a"), col("occs"))
          .select(col("a"), explode(col("occs")).as("b"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"),
            col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
        val minRun = 8 - 3 + 1
        val hot = m2.groupBy(col("id1"), col("id2"), col("diag"))
          .agg(count(lit(1)).as("nm"))
          .filter(col("nm") >= minRun)
          .select(col("id1"), col("id2"), col("diag"))
        val pruned = m2.join(broadcast(hot), Seq("id1", "id2", "diag"),
          "left_semi")
        val isl = pruned.withColumn("island",
          col("p1") - row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("id1"), col("id2"), col("diag"))
              .orderBy(col("p1"))))
        val out = isl
          .groupBy(col("id1"), col("id2"), col("diag"), col("island"))
          .agg((count(lit(1)) + 2).as("span"))
          .groupBy(col("id1"), col("id2"))
          .agg(max(col("span")).as("max_span_tokens"))
          .filter(col("max_span_tokens") >= 8)
          .count()
        g2.unpersist()
        out
      }
      time("prefilter-shape")(prefilterShape())
      // B: persist the match frame — one explode pass, agg + semi read cache
      def persistMShape(): Long = {
        val m2 = m.persist()
        val minRun = 8 - 3 + 1
        val hot = m2.groupBy(col("id1"), col("id2"), col("diag"))
          .agg(count(lit(1)).as("nm"))
          .filter(col("nm") >= minRun)
          .select(col("id1"), col("id2"), col("diag"))
        val pruned = m2.join(broadcast(hot), Seq("id1", "id2", "diag"),
          "left_semi")
        val isl = pruned.withColumn("island",
          col("p1") - row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("id1"), col("id2"), col("diag"))
              .orderBy(col("p1"))))
        val out = isl
          .groupBy(col("id1"), col("id2"), col("diag"), col("island"))
          .agg((count(lit(1)) + 2).as("span"))
          .groupBy(col("id1"), col("id2"))
          .agg(max(col("span")).as("max_span_tokens"))
          .filter(col("max_span_tokens") >= 8)
          .count()
        m2.unpersist()
        out
      }
      time("persist-m-shape")(persistMShape())
      // C: anchor prune BEFORE the count agg — a qualifying 6-run must
      // contain a match at p1 % 6 == 0, and shorter groups can't qualify
      def anchorShape(): Long = {
        val g2 = ps.groupBy(col("shingle"))
          .agg(collectCapped(struct(col("id"), col("pos")), 64).as("occs"))
          .filter(col("occs").isNotNull)
          .select(col("occs")).persist()
        val m2 = g2
          .select(explode(col("occs")).as("a"), col("occs"))
          .select(col("a"), explode(col("occs")).as("b"))
          .filter(col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"),
            col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
        val minRun = 8 - 3 + 1
        val anchors = m2.filter(pmod(col("p1"), lit(minRun)) === 0)
          .select(col("id1"), col("id2"), col("diag")).distinct()
        val cand = m2.join(anchors, Seq("id1", "id2", "diag"), "left_semi")
        val hot = cand.groupBy(col("id1"), col("id2"), col("diag"))
          .agg(count(lit(1)).as("nm"))
          .filter(col("nm") >= minRun)
          .select(col("id1"), col("id2"), col("diag"))
        val pruned = cand.join(broadcast(hot), Seq("id1", "id2", "diag"),
          "left_semi")
        val isl = pruned.withColumn("island",
          col("p1") - row_number().over(
            org.apache.spark.sql.expressions.Window
              .partitionBy(col("id1"), col("id2"), col("diag"))
              .orderBy(col("p1"))))
        val out = isl
          .groupBy(col("id1"), col("id2"), col("diag"), col("island"))
          .agg((count(lit(1)) + 2).as("span"))
          .groupBy(col("id1"), col("id2"))
          .agg(max(col("span")).as("max_span_tokens"))
          .filter(col("max_span_tokens") >= 8)
          .count()
        g2.unpersist()
        out
      }
      time("anchor-shape")(anchorShape())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q50") {
      import graft.dedup.Dedup
      val doubled = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val sigs = Dedup.minhashSignatures(doubled, 3, "doc_id", "text")
      time("minhash-sigs")(sigs.agg(count(lit(1))).collect()(0).getLong(0))
      val pairs = Dedup.minhashCandidatePairs(doubled, 3, "doc_id", "text")
      time("candidate-pairs")(pairs.count())
      time("cc+antijoin=full-q50")(Dedup.dedupCorpus(doubled).count())
      time("full-q50-again")(Dedup.dedupCorpus(doubled).count())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q102") {
      import org.apache.spark.sql.expressions.Window
      import graft.dedup.Dedup
      import graft.functions.CollectCapped.collectCapped
      val doubled = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      def oldShape(): Long = {
        val sh = Dedup.shingles(doubled, 3, "doc_id", "text")
        val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("sz"))
        val capped = sh.withColumn("df",
            count(lit(1)).over(Window.partitionBy(col("shingle"))))
          .filter(col("df") <= 64).drop("df")
        val shared = capped.as("a").join(capped.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.id") =!= col("b.id"))
          .groupBy(col("a.id").as("id_contained"), col("b.id").as("id_container"))
          .agg(count(lit(1)).as("n_shared"))
        shared.join(sizes.select(col("id").as("id_contained"), col("sz").as("sz_contained")), Seq("id_contained"))
          .filter(col("sz_contained") >= 4 &&
            col("n_shared") * 1000000L >= lit(800000L) * col("sz_contained"))
          .count()
      }
      time("old-window-join")(oldShape())
      time("new-collect-capped")(Dedup.containmentPairs(doubled).count())
      time("old-again")(oldShape())
      time("new-again")(Dedup.containmentPairs(doubled).count())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q84") {
      import graft.dedup.Dedup
      import graft.functions.CollectCapped.collectCapped
      val doubled = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val ps = Dedup.positionedShingles(doubled, 3, "doc_id", "text")
      time("positioned-shingles")(ps.agg(count(lit(1))).collect()(0).getLong(0))
      val grouped = ps.groupBy(col("shingle"))
        .agg(collectCapped(struct(col("id"), col("pos")), 64).as("occs"))
        .filter(col("occs").isNotNull)
      time("grouped-capped")(grouped.agg(count(lit(1))).collect()(0).getLong(0))
      val m = grouped.select(col("occs"))
        .select(explode(col("occs")).as("a"), col("occs"))
        .select(col("a"), explode(col("occs")).as("b"))
        .filter(col("a.id") < col("b.id"))
        .select(col("a.id").as("id1"), col("b.id").as("id2"),
          col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
      time("pairs")(m.agg(count(lit(1))).collect()(0).getLong(0))
      def windowShape(): Long = {
        import org.apache.spark.sql.expressions.Window
        val psw = Dedup.positionedShingles(doubled, 3, "doc_id", "text")
          .withColumn("occ", count(lit(1)).over(Window.partitionBy(col("shingle"))))
          .filter(col("occ") <= 64).drop("occ")
        val mw = psw.as("a").join(psw.as("b"),
            col("a.shingle") === col("b.shingle") && col("a.id") < col("b.id"))
          .select(col("a.id").as("id1"), col("b.id").as("id2"),
            col("a.pos").as("p1"), (col("a.pos") - col("b.pos")).as("diag"))
        mw.withColumn("island", col("p1") - row_number().over(Window
            .partitionBy(col("id1"), col("id2"), col("diag")).orderBy(col("p1"))))
          .groupBy(col("id1"), col("id2"), col("diag"), col("island"))
          .agg((count(lit(1)) + 2).as("span"))
          .groupBy(col("id1"), col("id2"))
          .agg(max(col("span")).as("max_span_tokens"))
          .filter(col("max_span_tokens") >= 8).count()
      }
      time("window-nopersist")(windowShape())
      time("full-q84")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      time("window-nopersist-again")(windowShape())
      time("full-q84-again")(graft.SparkEntry.queries("q84_span_dedup")(spark, d).count())
      spark.stop(); return
    }
    if (args.length > 1 && args(1) == "q21") {
      import graft.dedup.Dedup
      val doubled = docs.unionByName(docs.select((col("doc_id") + 10000).as("doc_id"), col("text")))
      val sh = Dedup.shingles(doubled, 3, "doc_id", "text")
      time("shingles")(sh.agg(count(lit(1))).count())
      import org.apache.spark.sql.expressions.Window
      val withFreq = sh.withColumn("freq", count(lit(1)).over(Window.partitionBy(col("shingle"))))
      time("freq-window")(withFreq.agg(count(lit(1))).count())
      val ranked = withFreq.groupBy(col("id"))
        .agg(sort_array(collect_list(struct(col("freq"), col("shingle")))).as("ranked"))
      time("ranked-collect")(ranked.agg(count(lit(1))).count())
      time("full-q21")(graft.SparkEntry.queries("q21_ngram_jaccard")(spark, d).count())
      time("full-q21-again")(graft.SparkEntry.queries("q21_ngram_jaccard")(spark, d).count())
      spark.stop(); return
    }
    time("tokens-count")(docs.select(TextOps.tokenCount(col("text")).as("n")).agg(sum("n")).count())
    time("plang")(docs.select(TextOps.predictedLang(col("text")).as("p")).groupBy("p").count().count())
    time("fingerprint")(docs.select(md5(array_join(TextOps.tokens(col("text")), " ")).as("f")).agg(count(lit(1))).count())
    time("full-q71")(graft.SparkEntry.queries("q71_pipeline_e2e")(spark, d).count())
    spark.stop()
  }
}
