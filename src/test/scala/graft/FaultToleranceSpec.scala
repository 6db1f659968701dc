package graft

import org.apache.spark.sql.functions._

import graft.operators.{Bfs, PageRank, ShortestPaths}
import graft.util.Checkpoints

/** Fault-injection for the checkpointed iterative family (round-14
  * verdict item 4): on a preemptible cluster the failure mode is "the
  * upstream data an iteration's lineage points at is GONE" — an
  * executor died, a shuffle dir was reclaimed, an input went away. A
  * reliable `checkpointDir` is supposed to make the loop's state
  * self-contained on durable storage so recomputation resumes from the
  * checkpoint files instead of replaying lineage. These specs PROVE
  * that by destroying the lineage's source: the input parquet files
  * are DELETED and the result must still materialize — identically —
  * because every read now comes from the checkpoint dir. If any plan
  * still referenced the parquet scan, the action would throw
  * FileNotFoundException instead.
  *
  * (The loops' integer arithmetic is deterministic, so "identical" is
  * exact equality, not approximate.)
  */
class FaultToleranceSpec extends SparkSpec {

  private def tmp(prefix: String) =
    java.nio.file.Files.createTempDirectory(prefix).toString

  /** Write a small two-component digraph, read it back as a REAL
    * parquet scan (deletable), return (edgesDf, dataDir). */
  private def edgesOnDisk(): (org.apache.spark.sql.DataFrame, String) = {
    import spark.implicits._
    val dir = tmp("graft_ft_edges")
    Seq((1L, 2L, 1L), (2L, 3L, 2L), (3L, 4L, 1L), (4L, 1L, 1L),
      (2L, 5L, 3L), (5L, 6L, 1L), (6L, 7L, 1L), (7L, 8L, 1L),
      (8L, 9L, 1L), (10L, 11L, 2L))
      .toDF("src", "dst", "w")
      .repartition(2).write.mode("overwrite").parquet(dir)
    (spark.read.parquet(dir), dir)
  }

  private def deleteData(dir: String): Unit = {
    val d = new java.io.File(dir)
    d.listFiles().filter(_.getName.endsWith(".parquet"))
      .foreach(f => assert(f.delete(), s"could not delete $f"))
  }

  private def assertNoFileScanOf(df: org.apache.spark.sql.DataFrame,
      dir: String): Unit = {
    // lineage truncation, stated on the plan: nothing below the result
    // references the deleted parquet relation
    val plan = df.queryExecution.analyzed.toString
    assert(!plan.contains(dir),
      s"plan still references the deleted input $dir:\n$plan")
  }

  it("PageRank with a reliable checkpointDir survives losing its " +
      "input files mid-computation") {
    val (edges, dataDir) = edgesOnDisk()
    val ckpt = tmp("graft_ft_ckpt_pr")
    // baseline from an intact twin run (deterministic integer ranks)
    val expected = PageRank.pageRank(edges, 6)
      .collect().map(_.toString).sorted.toSeq
    // checkpointed run: iterations > CutEvery forces interior cuts AND
    // a final cut, so the returned frame is self-contained on disk
    val pr = PageRank.pageRank(edges, 6, checkpointDir = Some(ckpt))
    assertNoFileScanOf(pr, dataDir)
    deleteData(dataDir)
    pr.collect().map(_.toString).sorted.toSeq shouldBe expected
  }

  it("BFS with a reliable checkpointDir survives losing its input " +
      "files (forced distributed path)") {
    import spark.implicits._
    val (edges, dataDir) = edgesOnDisk()
    val ckpt = tmp("graft_ft_ckpt_bfs")
    val starts = Seq(1L).toDF("node_id")
    val expected = Bfs.reachable(edges.select(col("src"), col("dst")),
        starts, localEdgeThreshold = 0)
      .collect().map(_.toString).sorted.toSeq
    val bfs = Bfs.reachable(edges.select(col("src"), col("dst")),
      starts, checkpointDir = Some(ckpt), localEdgeThreshold = 0)
    assertNoFileScanOf(bfs, dataDir)
    deleteData(dataDir)
    bfs.collect().map(_.toString).sorted.toSeq shouldBe expected
  }

  it("SSSP with a reliable checkpointDir survives losing its input " +
      "files") {
    val (edges, dataDir) = edgesOnDisk()
    val ckpt = tmp("graft_ft_ckpt_sssp")
    val wEdges = edges.selectExpr("cast(src as string) u",
      "cast(dst as string) v", "w")
    val expected = ShortestPaths.sssp(wEdges, "1")
      .collect().map(_.toString).sorted.toSeq
    val d = ShortestPaths.sssp(wEdges, "1", checkpointDir = Some(ckpt))
    assertNoFileScanOf(d, dataDir)
    deleteData(dataDir)
    d.collect().map(_.toString).sorted.toSeq shouldBe expected
  }

  it("connected components with a reliable checkpointDir survive " +
      "losing their input files (forced distributed star rounds)") {
    val (edges, dataDir) = edgesOnDisk()
    val ckpt = tmp("graft_ft_ckpt_cc")
    val pairs = edges.select(col("src").as("id1"), col("dst").as("id2"))
    val expected = graft.dedup.Dedup.clusterLabelsStar(pairs,
        localFallbackEdges = 0L)
      .collect().map(_.toString).sorted.toSeq
    val cc = graft.dedup.Dedup.clusterLabelsStar(pairs,
      checkpointDir = Some(ckpt), localFallbackEdges = 0L)
    assertNoFileScanOf(cc, dataDir)
    deleteData(dataDir)
    cc.collect().map(_.toString).sorted.toSeq shouldBe expected
  }

  it("Checkpoints.cut(Some(dir)) truncates lineage MID-ITERATION: " +
      "rounds after the cut never replay the deleted source") {
    val (edges, dataDir) = edgesOnDisk()
    val ckpt = tmp("graft_ft_ckpt_cut")
    // hand-rolled 3-round recurrence over the raw cut primitive (the
    // exact machinery every operator loop uses): round 1 runs on the
    // live input and is cut; the input dies; rounds 2-3 must complete
    var deg = edges.groupBy(col("src")).agg(count(lit(1)).as("d"))
    deg = Checkpoints.cut(deg, Some(ckpt)) // round 1 materialized
    deleteData(dataDir)
    var out = deg
    for (_ <- 2 to 3)
      out = Checkpoints.cut(
        out.withColumn("d", col("d") * 2), Some(ckpt))
    out.agg(sum(col("d"))).collect()(0).getLong(0) shouldBe 40L // 10 edges * 4
  }
}
