package graft

import graft.similarity.Similarity
import graft.sources.Tables

/** ANN paths: IVF search overlaps the exact baseline; LSH buckets are
  * self-consistent. Runs on the sf0.001 embeddings table. */
class SimilaritySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private def haveData =
    java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/embeddings.parquet"))

  it("ivfTopK returns exact cosines and decent recall vs brute force") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val brute = Similarity.bruteTopK(emb, k = 3,
        allowUnboundedQueries = true).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ivf = Similarity.ivfTopK(emb, k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    ivf should not be empty
    // every IVF hit's cosine equals the exact cosine for that pair
    ivf.foreach { case (pair, cos) =>
      brute.get(pair).foreach(_ shouldBe cos)
    }
    // probe restriction keeps a reasonable share of the true top-3
    val recall = ivf.keySet.intersect(brute.keySet).size.toDouble /
      brute.size
    recall should be >= 0.2
    // the recall OPERATOR reports the same overall number
    val ivfDf = Similarity.ivfTopK(emb, k = 3, nprobe = 2)
    val bruteDf = Similarity.bruteTopK(emb, k = 3,
      allowUnboundedQueries = true)
    val per = Similarity.topKRecall(ivfDf, bruteDf).collect()
    val overall = per.map(_.getLong(2)).sum.toDouble /
      per.map(_.getLong(1)).sum
    overall shouldBe recall +- 1e-9
  }

  it("banded cosineNearDupPairs matches brute force and avoids cross joins") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val doubled = emb.unionByName(emb.select(
      (org.apache.spark.sql.functions.col("vec_id") + 10000).as("vec_id"),
      org.apache.spark.sql.functions.col("embedding")))
    // lazy mode so the FULL plan is inspectable (materialized results
    // explain as an opaque existing-RDD scan)
    val lazyPlan =
      try {
        spark.conf.set(graft.util.Checkpoints.MaterializeConf, "false")
        Similarity.cosineNearDupPairs(doubled)
          .queryExecution.executedPlan.toString
      } finally {
        spark.conf.unset(graft.util.Checkpoints.MaterializeConf)
        spark.sharedState.cacheManager.clearCache() // lazy mode skips unpersist
      }
    // the default (banded) plan must not contain an all-pairs join
    lazyPlan should not include "CartesianProduct"
    lazyPlan should not include "BroadcastNestedLoopJoin"
    val banded = Similarity.cosineNearDupPairs(doubled)
    val bandedPairs = banded.collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val brutePairs = Similarity
      .cosineNearDupPairs(doubled, bruteForce = true).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // candidates only shrink the pair set...
    bandedPairs.subsetOf(brutePairs) shouldBe true
    // ...and every exact duplicate (identical vector → identical buckets)
    // is guaranteed kept; on this corpus that's the whole answer
    val n = emb.count()
    (0L until n).foreach { i => bandedPairs should contain((i, i + 10000)) }
    bandedPairs shouldBe brutePairs
  }

  it("kmeansCentroids improves (or holds) the clustering objective") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val init = Similarity.kmeansCentroids(emb, iters = 0)
    val refined = Similarity.kmeansCentroids(emb, iters = 3)
    // same cluster count, unit-norm centroids
    refined.count() shouldBe init.count()
    val norms = refined.select(
      org.apache.spark.sql.functions.sqrt(
        Similarity.dot(org.apache.spark.sql.functions.col("cu"),
          org.apache.spark.sql.functions.col("cu")))).collect()
      .map(_.getDouble(0))
    all(norms) shouldBe 1.0 +- 1e-9
    // Lloyd never worsens the spherical k-means objective
    val before = Similarity.meanBestCosine(emb, init)
    val after = Similarity.meanBestCosine(emb, refined)
    after should be >= before - 1e-9
  }

  it("IVF index layout prunes unprobed partitions at the scan") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ivf_index").toString
    Similarity.writeIvfIndex(emb, out)
    // partition dirs per centroid on disk
    val parts = new java.io.File(out).list().filter(_.startsWith("centroid="))
    parts.length should be >= 2
    val probed = parts.take(2).map(_.stripPrefix("centroid=").toLong).toSeq
    val lists = Similarity.readIvfLists(spark, out, probed)
    // the probe filter reaches the scan as a partition filter
    val plan = lists.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("centroid")
    // row counts match the assignment for exactly the probed lists
    val expected = Similarity.ivfAssign(emb)
      .filter(org.apache.spark.sql.functions.col("centroid").isin(probed: _*))
      .count()
    lists.count() shouldBe expected
  }

  it("bruteTopK refuses an unbounded query side without explicit opt-in") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val ex = intercept[IllegalArgumentException] {
      Similarity.bruteTopK(emb, k = 3) // no maxQueryId, no opt-in
    }
    ex.getMessage should include("ivfTopK")
    // bounded query side needs no opt-in (the q25 gate path)
    Similarity.bruteTopK(emb, k = 1, maxQueryId = 5).count() should be > 0L
  }

  it("searchIvfIndex through the partitioned layout matches the " +
      "in-memory ivfTopK") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val out = java.nio.file.Files.createTempDirectory("ivf_search").toString
    Similarity.writeIvfIndex(emb, out)
    import org.apache.spark.sql.functions.col
    val queries = emb.filter(col("vec_id") < 20)
    val viaIndex = Similarity.searchIvfIndex(spark, out, queries,
        k = 3, nprobe = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toSeq
    val inMemory = Similarity.ivfTopK(emb, k = 3, nprobe = 2,
        maxQueryId = 20).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
      .sorted.toSeq
    viaIndex shouldBe inMemory
  }

  it("product quantization: seeds reconstruct exactly, finer codebooks " +
      "never hurt, codes are m bytes in range") {
    if (!haveData) cancel("testdata missing")
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val emb = Tables.embeddings(spark, dir)
    val books = Similarity.pqCodebooks(emb, m = 8, stride = 50)
    val k = books.filter(col("sub") === 0).count()
    // codes: 8 entries per vector, all within [0, k)
    val codes = Similarity.pqEncode(emb, books, m = 8)
    codes.count() shouldBe emb.count()
    codes.select(org.apache.spark.sql.functions.size(col("codes")))
      .distinct().as[Int].head() shouldBe 8
    codes.select(explode(col("codes")).as("c"))
      .agg(min(col("c")), max(col("c"))).as[(Long, Long)].head() match {
      case (lo, hi) => lo should be >= 0L; hi should be < k
    }
    // a codebook seed's own subvectors are codebook entries → exact
    val seedMse = Similarity.pqReconstructionError(
      emb.filter(col("vec_id") % 50 === 0), books, m = 8)
      .select("mse").as[Double].head()
    seedMse shouldBe 0.0 +- 1e-12
    // a finer codebook (more seeds) can only match or reduce the error
    val coarse = Similarity.pqReconstructionError(emb,
      Similarity.pqCodebooks(emb, m = 8, stride = 250), m = 8)
      .select("mse").as[Double].head()
    val fine = Similarity.pqReconstructionError(emb, books, m = 8)
      .select("mse").as[Double].head()
    fine should be <= coarse
    fine should be > 0.0
  }

  it("pqTopK (ADC) searches codes only and keeps high recall on " +
      "clustered data (uniform noise is PQ's worst case by design)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // 200 vectors in 20 tight clusters (ids 10c..10c+9): cluster center
    // pattern + small deterministic jitter. stride=10 seeds one
    // codebook entry per cluster.
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val c = i / 10
      val v = Array.tabulate(64)(d =>
        (math.sin(c * 13 + d).toFloat * 10f) + (rnd.nextFloat() - 0.5f))
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(emb, m = 8, stride = 10)
    val codes = Similarity.pqEncode(emb, books, m = 8)
    val queries = emb.filter(col("vec_id") < 50)
    val approx = Similarity.pqTopK(queries, codes, books, k = 5, m = 8)
    approx.groupBy(col("qid")).count().select("count")
      .distinct().as[Long].head() shouldBe 5L
    // exact L2 top-5, computed driver-side on the 200-vector corpus
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = (for {
      (qi, qv) <- rows.take(50)
    } yield qi -> rows.filter(_._1 != qi)
      .map { case (ni, nv) => (ni, d2(qv, nv)) }
      .sortBy { case (ni, d) => (d, ni) }.take(5).map(_._1).toSet).toMap
    val approxPairs = approx.select("qid", "nid").as[(Long, Long)]
      .collect()
    // cluster recovery: same-cluster members share codes, so EVERY
    // returned neighbor must come from the query's own cluster (within
    // a cluster the codes tie — ordering there is id-deterministic, not
    // distance-driven, so set-level recall@5 vs the jitter ordering is
    // bounded ≈ 5/9 and is NOT the right assertion)
    approxPairs.foreach { case (q, n) => n / 10 shouldBe q / 10 }
    // and the tie-broken sets still overlap the exact sets far above
    // the ~1% chance level
    val approxMap = approxPairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = exact.map { case (q, ex) =>
      (ex & approxMap.getOrElse(q, Set.empty)).size }.sum
    hits.toDouble / (50 * 5) should be > 0.4
  }

  it("IVF-PQ disk index: codes partitions prune at the scan; ADC search " +
      "recovers clusters and overlaps the exact top-k") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // same clustered corpus as the pqTopK spec: 20 tight clusters,
    // ids 10c..10c+9; stride/centroidStride 10 seed one codebook entry
    // and one IVF centroid per cluster
    val rnd = new scala.util.Random(42)
    val rows = (0 until 200).map { i =>
      val c = i / 10
      val v = Array.tabulate(64)(d =>
        (math.sin(c * 13 + d).toFloat * 10f) + (rnd.nextFloat() - 0.5f))
      (i.toLong, v)
    }
    val emb = rows.toDF("vec_id", "embedding")
    val out = java.nio.file.Files.createTempDirectory("ivfpq_idx").toString
    Similarity.writeIvfPqIndex(emb, out, centroidStride = 10, m = 8,
      stride = 10)
    // the collection on disk is codes only, partitioned by centroid
    val parts = new java.io.File(s"$out/codes").list()
      .filter(_.startsWith("centroid="))
    parts.length should be >= 10
    spark.read.parquet(s"$out/codes").columns should contain("codes")
    // a probe-restricted scan prunes unprobed partitions
    val pruned = spark.read.parquet(s"$out/codes")
      .filter(col("centroid").isin(0L, 10L))
    val plan = pruned.queryExecution.executedPlan.toString
    plan should include("PartitionFilters")
    plan should include("centroid")
    val res = Similarity.searchIvfPqIndex(spark, out,
      emb.filter(col("vec_id") < 50), k = 5, nprobe = 2, m = 8)
    val approxPairs = res.select("qid", "nid").as[(Long, Long)].collect()
    approxPairs.length shouldBe 50 * 5
    // every returned neighbor comes from the query's own cluster
    approxPairs.foreach { case (q, n) => n / 10 shouldBe q / 10 }
    // and overlaps the exact L2 top-5 far above chance (ties within a
    // cluster break by id — see the pqTopK spec for the bound rationale)
    def d2(a: Array[Float], b: Array[Float]) =
      a.zip(b).map { case (x, y) => (x - y).toDouble * (x - y) }.sum
    val exact = (for {
      (qi, qv) <- rows.take(50)
    } yield qi -> rows.filter(_._1 != qi)
      .map { case (ni, nv) => (ni, d2(qv, nv)) }
      .sortBy { case (ni, d) => (d, ni) }.take(5).map(_._1).toSet).toMap
    val approxMap = approxPairs.groupBy(_._1).view.mapValues(_.map(_._2).toSet)
    val hits = exact.map { case (q, ex) =>
      (ex & approxMap.getOrElse(q, Set.empty)).size }.sum
    hits.toDouble / (50 * 5) should be > 0.4
  }

  it("semanticDupPairs finds every twin inside its cell; semanticPrune " +
      "keeps one representative per redundancy chain") {
    if (!haveData) cancel("testdata missing")
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    val doubled = emb.unionByName(emb.select(
      (col("vec_id") + 10000).as("vec_id"), col("embedding")))
    val n = emb.count()
    val pairs = Similarity.semanticDupPairs(doubled).collect()
      .map(r => (r.getLong(1), r.getLong(2)) -> r.getDouble(3)).toMap
    // every (v, v+10000) twin is assigned to the same cell (identical
    // vectors, deterministic tie-break) and scores cosine 1.0
    (0L until n).foreach { i => pairs.get((i, i + 10000)) shouldBe Some(1.0) }
    // prune on a TRIPLED collection: {v, v+10000, v+20000} chains must
    // collapse to the min id even though all three are pairwise dups
    val tripled = doubled.unionByName(emb.select(
      (col("vec_id") + 20000).as("vec_id"), col("embedding")))
    val kept = Similarity.semanticPrune(tripled).select("vec_id")
      .collect().map(_.getLong(0)).toSet
    (0L until n).foreach { i =>
      kept should contain(i)
      kept should not contain (i + 10000)
      kept should not contain (i + 20000)
    }
  }

  it("appendIvfIndex/appendIvfPqIndex: append(B) matches rebuild(A∪B) " +
      "given fixed centroids/codebooks (search parity)") {
    if (!haveData) cancel("testdata missing")
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // batch ids are odd (2·id + 10001) so the deterministic stride
    // sample (id % 50 == 0) draws the same centroid/codebook seeds from
    // A as from A∪B — the fixed-model precondition the append contract
    // states; the batch duplicates A's vectors, so every query's top-k
    // MUST surface appended rows (its cosine-1.0 twin) for parity to hold
    val batch = emb.select((col("vec_id") * 2 + 10001).as("vec_id"),
      col("embedding"))
    val union = emb.unionByName(batch)
    val queries = emb.filter(col("vec_id") < 20)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toSeq).sortBy(_.toString)
    def tmp(p: String) =
      java.nio.file.Files.createTempDirectory(p).toString

    val idxA = tmp("ivf_append")
    Similarity.writeIvfIndex(emb, idxA)
    Similarity.appendIvfIndex(batch, idxA)
    val idxU = tmp("ivf_full")
    Similarity.writeIvfIndex(union, idxU)
    val gotFlat = rows(Similarity.searchIvfIndex(spark, idxA, queries))
    gotFlat shouldBe rows(Similarity.searchIvfIndex(spark, idxU, queries))
    // the appended twins actually surface in the results
    gotFlat.flatMap(r => Option(r(1))).map(_.asInstanceOf[Long])
      .exists(_ > 10000L) shouldBe true

    val pqA = tmp("ivfpq_append")
    Similarity.writeIvfPqIndex(emb, pqA)
    Similarity.appendIvfPqIndex(batch, pqA)
    val pqU = tmp("ivfpq_full")
    Similarity.writeIvfPqIndex(union, pqU)
    val gotPq = rows(Similarity.searchIvfPqIndex(spark, pqA, queries))
    gotPq shouldBe rows(Similarity.searchIvfPqIndex(spark, pqU, queries))
    gotPq.flatMap(r => Option(r(1))).map(_.asInstanceOf[Long])
      .exists(_ > 10000L) shouldBe true
  }

  it("multi-probe semanticDupPairs recovers planted cross-cell near-dups " +
      "(recall audit vs brute-force ground truth)") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // 8-dim fixture, two cells (centroids = ids 0 and 50 → axes e1/e2),
    // five boundary pairs straddling the 45° cell boundary: x at 41° is
    // hard-assigned to cell A, its near-dup y at 49° to cell B, so the
    // pair is invisible to cell-confined (nprobe = 1) SemDeDup. Each
    // pair carries a distinct perturbation axis so cross-pair cosines
    // land below the 0.97 threshold (x_k·y_l ≈ 0.968).
    def vec(parts: (Int, Double)*): Array[Float] = {
      val a = Array.fill(8)(0.0f)
      parts.foreach { case (i, x) => a(i) = x.toFloat }
      a
    }
    val rad = math.Pi / 180
    val rows = Seq.newBuilder[(Long, Array[Float])]
    rows += 0L -> vec(0 -> 1.0)
    rows += 50L -> vec(1 -> 1.0)
    for (k <- 0 until 3) { // tight satellites, found at nprobe = 1
      rows += (1L + k) -> vec(0 -> 1.0, 2 -> 0.05)
      rows += (54L + k) -> vec(1 -> 1.0, 2 -> 0.05)
    }
    val boundary = (0 until 5).map(k => (10L + k, 60L + k))
    for (k <- 0 until 5) {
      rows += (10L + k) -> vec(0 -> math.cos(41 * rad),
        1 -> math.sin(41 * rad), 3 + k -> 0.15)
      rows += (60L + k) -> vec(0 -> math.cos(49 * rad),
        1 -> math.sin(49 * rad), 3 + k -> 0.15)
    }
    val fix = rows.result().toDF("vec_id", "embedding")
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairSet(Similarity.cosineNearDupPairs(fix, bruteForce = true,
      threshold = 0.97))
    val p1 = pairSet(Similarity.semanticDupPairs(fix))
    val p2 = pairSet(Similarity.semanticDupPairs(fix, nprobe = 2))
    boundary.foreach { p => truth should contain(p) }
    // candidate restriction only ever shrinks the exact pair set
    p1.subsetOf(p2) shouldBe true
    p2.subsetOf(truth) shouldBe true
    // the planted straddlers are exactly what nprobe = 1 misses and
    // top-2 multi-probe recovers
    boundary.foreach { p =>
      p1 should not contain p
      p2 should contain(p)
    }
    val recall1 = p1.size.toDouble / truth.size
    val recall2 = p2.size.toDouble / truth.size
    recall2 shouldBe 1.0
    recall1 should be < 1.0
    info(f"planted-boundary fixture: recall nprobe=1 $recall1%.3f " +
      f"(${truth.size - p1.size} cross-cell misses of ${truth.size}), " +
      f"nprobe=2 $recall2%.3f")
    // prune honors the probe width: the x side (10–14) and y side
    // (60–64) are each within-cell chains, so nprobe = 1 keeps one
    // representative per CELL (10 and 60 — the cross-cell redundancy
    // survives); nprobe = 2 sees the straddling pairs and collapses the
    // whole chain to the single min id 10
    val boundaryIds = boundary.flatMap { case (a, b) => Seq(a, b) }.toSet
    val kept1 = Similarity.semanticPrune(fix)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    val kept2 = Similarity.semanticPrune(fix, nprobe = 2)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    kept1.intersect(boundaryIds) shouldBe Set(10L, 60L)
    kept2.intersect(boundaryIds) shouldBe Set(10L)
  }

  it("semanticDupPairs recall/cost curve on the real corpus: recall " +
      "monotone in nprobe, takedown preset (nprobe=4) ≥ 0.9") {
    if (!haveData) cancel("testdata missing")
    import org.apache.spark.sql.functions.col
    val emb = Tables.embeddings(spark, dir).select("vec_id", "embedding")
    // data-driven threshold: the 99.9th-percentile all-pairs cosine, so
    // the audit has a meaningful ground-truth set regardless of how the
    // synthetic embeddings are distributed
    val allCos = Similarity.cosineNearDupPairs(emb, bruteForce = true,
        threshold = -2.0).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2)))
    val thr = allCos.map(_._2).sorted.apply((allCos.length * 0.999).toInt)
    val truth = allCos.filter(_._2 >= thr).map(_._1).toSet
    def pairSet(df: org.apache.spark.sql.DataFrame) = df
      .select(col("id1"), col("id2")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // The nprobe recall/cost CURVE (round-11 verdict item): recall vs
    // brute-force truth at the p99.9 threshold, cost = candidate-pair
    // budget Σ_cell |cell|·(|cell|−1)/2 from the probe assignment
    // (semanticProbes — the exact join size the cell self-join pays,
    // before the threshold filter). Pinned: recall is monotone in
    // nprobe, candidates stay far below brute force, and the
    // TAKEDOWN-GRADE preset reaches recall ≥ 0.9.
    val bruteCost = {
      val n = emb.count(); n * (n - 1) / 2
    }
    val curve = Seq(1, 2, 4, 8).map { np =>
      val pairs = pairSet(Similarity.semanticDupPairs(emb, threshold = thr,
        nprobe = np))
      pairs.subsetOf(truth) shouldBe true
      val probes = Similarity.semanticProbes(emb, nprobe = np)
        .groupBy(col("centroid")).count().collect()
        .map(r => r.getLong(1) * (r.getLong(1) - 1) / 2).sum
      (np, pairs, pairs.size.toDouble / truth.size, probes)
    }
    curve.sliding(2).foreach { case Seq((_, a, _, _), (_, b, _, _)) =>
      a.subsetOf(b) shouldBe true // wider probes never lose pairs
    }
    curve.foreach { case (np, _, recall, cand) =>
      info(f"nprobe=$np%d: recall $recall%.3f, candidate pairs $cand%d " +
        f"(${100.0 * cand / bruteCost}%.1f%% of brute ${bruteCost}%d)")
    }
    // the takedown-grade preset (documented in semanticDupPairs
    // scaladoc + SURVEY §8): nprobe=4 buys ≥ 0.9 recall. The candidate
    // budget scales as ~nprobe² · n²/cells — on THIS 40-cell toy corpus
    // nprobe=4 probes 10% of all cells so the fraction-of-brute looks
    // large; at the production DefaultMaxCentroids=1024 cells the same
    // preset probes 0.4% and the budget is ~nprobe²/cells of brute.
    // What the toy corpus CAN pin: recall, and that the budget grows
    // ≤ nprobe² (not worse).
    val cand1 = curve.head._4
    curve.foreach { case (np, _, recall, cand) =>
      cand.toDouble / cand1 should be <= (np.toDouble * np + 1.0)
    }
    val (np9, _, recall9, cand9) = curve.find(_._3 >= 0.9).get
    np9 should be <= 4
    info(f"takedown preset nprobe=$np9%d: recall $recall9%.3f, " +
      f"candidate budget ${cand9.toDouble / cand1}%.1f× the nprobe=1 " +
      f"budget (brute would be ${bruteCost / cand1.toDouble}%.1f×)")
  }

  it("lshCandidatePairs puts identical vectors in one bucket") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
      .select("vec_id", "embedding")
    val doubled = emb.unionByName(emb.select(
      (org.apache.spark.sql.functions.col("vec_id") + 10000).as("vec_id"),
      org.apache.spark.sql.functions.col("embedding")))
    val pairs = Similarity.lshCandidatePairs(doubled).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val n = emb.count()
    // every (v, v+10000) duplicate pair must be a candidate
    (0L until n).foreach { i => pairs should contain((i, i + 10000)) }
  }

  it("RetrievalEval.perQueryIvf equals the brute-lane metrics on " +
      "clustered data (the q212 scale path)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // two clearly-separated clusters, 30 vectors each (the
    // knnLabelAgreementIvf corpus): stride 10 seeds centroids in both
    // clusters, so nprobe=2 probed lists contain the true top-k
    val rnd = new scala.util.Random(7)
    val df = (0 until 60).map { i =>
      val base = if (i < 30) Array(1.0f, 0.0f, 0.0f)
        else Array(0.0f, 1.0f, 0.0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.05f), (i / 30).toLong)
    }.toDF("vec_id", "embedding", "label")
    val ids = df.select(col("vec_id").as("id"), col("label"))
    val rels = ids.select(col("id").as("qid"), col("label"))
      .join(ids.select(col("id").as("nid"), col("label")), Seq("label"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(r => (r.getLong(0), r.toString)).toMap
    val brute = canon(graft.similarity.RetrievalEval.perQuery(
      Similarity.bruteTopK(df, k = 5, maxQueryId = 1000L), rels, k = 5))
    val ivf = canon(graft.similarity.RetrievalEval.perQueryIvf(
      df, rels, k = 5, nprobe = 2, centroidStride = 10,
      maxQueryId = 1000L))
    brute.size shouldBe 60
    ivf shouldBe brute
    // within a tight cluster every top-5 neighbor shares the label
    brute.values.foreach(_ should include(",5,29,1,1000000,1000000,"))
  }

  it("the r16 IVF twins equal their brute lanes on clustered data: " +
      "prefix-slice search (q219) and RRF-over-IVF fusion (q220)") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // the perQueryIvf corpus shape: two separated clusters in the
    // FIRST TWO dims (so the 2-of-4 Matryoshka prefix still separates
    // them), stride 10 seeds centroids in both clusters — the probed
    // lists contain the true top-k and IVF ≡ brute exactly (nprobe=3
    // covers ALL THREE same-cluster centroid lists — with 2, a true
    // neighbor assigned to the unprobed third list breaks equality)
    val rnd = new scala.util.Random(13)
    val df = (0 until 60).map { i =>
      val base = if (i < 30) Array(1.0f, 0.0f, 0.0f, 0.0f)
        else Array(0.0f, 1.0f, 0.0f, 0.0f)
      (i.toLong, base.map(_ + rnd.nextFloat() * 0.05f))
    }.toDF("vec_id", "embedding")
    val prefix = df.select(col("vec_id"),
      slice(col("embedding"), 1, 2).as("embedding"))
    def canon(d: org.apache.spark.sql.DataFrame) =
      d.collect().map(_.toString).sorted.toSeq
    // q219 shape: IVF over the sliced prefix ≡ brute over the prefix
    canon(Similarity.ivfTopK(prefix, k = 3, nprobe = 3,
      centroidStride = 10, maxQueryId = 1000L)) shouldBe
      canon(Similarity.bruteTopK(prefix, k = 3, maxQueryId = 1000L))
    // q220 shape: RRF over the two IVF rankings ≡ RRF over the two
    // brute rankings (rank-only fusion — substrate equality carries)
    val fullB = Similarity.bruteTopK(df, k = 3, maxQueryId = 1000L)
    val prefB = Similarity.bruteTopK(prefix, k = 3, maxQueryId = 1000L)
    val fullI = Similarity.ivfTopK(df, k = 3, nprobe = 3,
      centroidStride = 10, maxQueryId = 1000L)
    val prefI = Similarity.ivfTopK(prefix, k = 3, nprobe = 3,
      centroidStride = 10, maxQueryId = 1000L)
    canon(graft.similarity.Fusion.rrfFuse(Seq(fullI, prefI))) shouldBe
      canon(graft.similarity.Fusion.rrfFuse(Seq(fullB, prefB)))
  }

  it("ivfTopKCurve equals per-nprobe ivfTopK row-for-row at every " +
      "curve point") {
    if (!haveData) cancel("testdata missing")
    val emb = Tables.embeddings(spark, dir)
    val nps = Seq(1, 2, 4, 8)
    val curve = Similarity.ivfTopKCurve(emb, k = 3, nprobes = nps,
      maxQueryId = 200L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getLong(4))).toSet
    nps.foreach { np =>
      val single = Similarity.ivfTopK(emb, k = 3, nprobe = np,
        maxQueryId = 200L).collect()
        .map(r => (np.toLong, r.getLong(0), r.getLong(1),
          r.getDouble(2), r.getLong(3))).toSet
      withClue(s"nprobe=$np:") {
        curve.filter(_._1 == np.toLong) shouldBe single
      }
    }
  }

  it("a 2-degree cosine chain near-dups ONLY adjacent vectors at the " +
      ".999 threshold (the FuzzSpec embedding-chain contract)") {
    // unit vectors rotating 2° per step: adjacent cos ≈ .99939 (pair),
    // distance-2 cos ≈ .99756 (not). Pins that the fuzz corpus rows
    // exercise the threshold comparison non-vacuously, through the
    // BANDED path (fixed hyperplanes — deterministic buckets).
    import spark.implicits._
    val chain = (0 until 6).map { j =>
      val th = math.toRadians(2.0 * j)
      (40L + j, Array.tabulate(64)(i =>
        if (i == 0) math.cos(th).toFloat
        else if (i == 1) math.sin(th).toFloat else 0f))
    }.toDF("vec_id", "embedding")
    val pairs = Similarity.cosineNearDupPairs(chain,
      numBands = 4, planesPerBand = 8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    pairs shouldBe (0 until 5).map(j => (40L + j, 41L + j)).toSet
  }
}
