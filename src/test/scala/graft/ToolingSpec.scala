package graft

import org.apache.spark.sql.functions._

/** Pins the round-12 contract of the Python round tooling — the guards
  * themselves must not regress:
  *
  *  - `scripts/selfcheck.py` REJECTS driver-unhashable gate output
  *    types (DECIMAL/ARRAY/…) even when values match, and still passes
  *    hashable-scalar gates. This is the local mirror of the driver's
  *    hasher; round 11 shipped four driver-RED gates precisely because
  *    the old selfcheck normalized Decimal→float.
  *  - `scripts/bench_ratios.py` exits nonzero on a raw 2× ratio vs the
  *    committed first-recorded baseline and zero otherwise.
  *
  * Runs python3 exactly as the driver does (duckdb + pandas are
  * driver-side tools present on this box). */
class ToolingSpec extends SparkSpec {

  private val repo = new java.io.File(".").getCanonicalPath
  private def haveTool: Boolean =
    try {
      new ProcessBuilder("python3", "-c", "import duckdb").start()
        .waitFor() == 0
    } catch { case _: Throwable => false }

  private def runPy(args: Seq[String], cwd: java.io.File): (Int, String) = {
    val pb = new ProcessBuilder((Seq("python3") ++ args): _*)
      .directory(cwd).redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    (p.waitFor(), out)
  }

  it("selfcheck rejects a DECIMAL gate output and passes the BIGINT " +
      "twin of the same values") {
    if (!haveTool) cancel("python3/duckdb not available")
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("tooling_sc").toFile
    val out = new java.io.File(dir, "out"); out.mkdirs()
    // decimal-typed gate output (values match the oracle exactly)
    Seq(1L, 2L).toDF("v")
      .select(col("v").cast("decimal(38,0)").as("v"))
      .coalesce(1).write.parquet(new java.io.File(out, "g_dec").toString)
    Seq(1L, 2L).toDF("v")
      .coalesce(1).write.parquet(new java.io.File(out, "g_big").toString)
    val oracles =
      """{"g_dec": "SELECT CAST(v AS DECIMAL(38,0)) AS v FROM (VALUES (1),(2)) t(v)",
        | "g_big": "SELECT CAST(v AS BIGINT) AS v FROM (VALUES (1),(2)) t(v)"}"""
        .stripMargin
    java.nio.file.Files.writeString(
      new java.io.File(out, "oracle_sql.json").toPath, oracles)
    val (rc, log) = runPy(Seq(s"$repo/scripts/selfcheck.py",
      "/root/testdata/sf0.001", out.toString), new java.io.File(repo))
    rc should not be 0 // one gate fails
    log should include ("OK   g_big")
    log should include ("FAIL g_dec")
    log should include ("driver-unhashable")
  }

  it("bench_ratios exits nonzero on a raw 2x breach and zero when flat") {
    if (!haveTool) cancel("python3/duckdb not available")
    val dir = java.nio.file.Files.createTempDirectory("tooling_br").toFile
    java.nio.file.Files.writeString(
      new java.io.File(dir, "BENCH_BASELINES.json").toPath,
      """{"_doc": "t", "queries": {
        |  "q03_a1_unify_latest": {"sec": 0.7, "round": 1, "marker_sec": 0.7},
        |  "qx_slow": {"sec": 0.5, "round": 1, "marker_sec": 0.7}}}"""
        .stripMargin)
    def bench(slow: Double): String = {
      val f = new java.io.File(dir, s"bench_$slow.json")
      java.nio.file.Files.writeString(f.toPath,
        s"""{"queries": {"q03_a1_unify_latest": 0.7, "qx_slow": $slow}}""")
      f.toString
    }
    val (rcBad, logBad) = runPy(
      Seq(s"$repo/scripts/bench_ratios.py", bench(1.2)), dir)
    rcBad should not be 0
    logBad should include ("qx_slow")
    val (rcOk, _) = runPy(
      Seq(s"$repo/scripts/bench_ratios.py", bench(0.6)), dir)
    rcOk shouldBe 0
  }
}
