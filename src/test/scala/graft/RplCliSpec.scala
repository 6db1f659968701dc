package graft

import graft.rpl.RplCli
import graft.time.IntervalEnd

/** CLI option grammar (net-spider-cli Snapshot.hs:92-160 semantics). */
class RplCliSpec extends SparkSpec {

  private val base = Array("/tmp/x.log", "syslog:2019")

  it("derives cis starts DAO-root-first (sortDAONodes, CLI.hs:388-389)") {
    val fixture = "/root/reference/net-spider-rpl/test/data/syslog_sr_tables.log"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
      cancel("fixture missing")
    val (dioF, daoF) = graft.rpl.ContikiNg.readLogs(spark, fixture,
      graft.rpl.ContikiNg.SyslogHead(2019))
    // root (route_num 6) first, route-less DAO subject next, DIO last
    RplCli.sortedStarts(dioF, daoF) shouldBe Seq(
      "dao://[fd00::222:5566:cc99:62c4]",
      "dao://[fd00::222:5566:ddee:4fdf]",
      "dio://[fd00::222:5566:cc99:62c4]")
  }

  it("parses starts-from, interval ends, duration, filter") {
    val o = RplCli.parseArgs(base ++ Array("graphml",
      "-s", "dio://[fd00::1]", "-s", "dio://[fd00::2]",
      "-f", "x2019-10-09T12:03:22", "--filter", "latest")).toOption.get
    o.mode shouldBe "graphml"
    o.startsFrom shouldBe Seq("dio://[fd00::1]", "dio://[fd00::2]")
    o.from shouldBe Some(IntervalEnd(Some(1570622602000L), false))
    o.filter shouldBe "latest"
  }

  it("rejects the invalid bound/duration combinations") {
    RplCli.parseArgs(base ++ Array("-f", "2019-01-01T00:00:00",
      "-t", "2019-01-02T00:00:00", "-d", "60")).isLeft shouldBe true
    RplCli.parseArgs(base ++ Array("-d", "60")).isLeft shouldBe true
    RplCli.parseArgs(Array("only-one-arg")).isLeft shouldBe true
    RplCli.parseArgs(base ++ Array("--nope")).isLeft shouldBe true
  }

  it("parses --filter keep:N, rejects malformed variants") {
    RplCli.parseArgs(base ++ Array("--filter", "keep:2"))
      .toOption.get.filter shouldBe "keep:2"
    RplCli.parseArgs(base ++ Array("--filter", "keep:0")).isLeft shouldBe true
    RplCli.parseArgs(base ++ Array("--filter", "keep:x")).isLeft shouldBe true
    RplCli.parseArgs(base ++ Array("--filter", "newest")).isLeft shouldBe true
  }

  it("cis --filter keep:1 behaves as latest; keep:N is reachable " +
      "from the grammar (PolicyKeepN wired through)") {
    val fixture = "/root/reference/net-spider-rpl/test/data/syslog_sr_tables.log"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
      cancel("fixture missing")
    val (dioF, daoF) = graft.rpl.ContikiNg.readLogs(spark, fixture,
      graft.rpl.ContikiNg.SyslogHead(2019))
    def summaryWith(filter: String): String = {
      val opts = RplCli.parseArgs(Array(fixture, "syslog:2019",
        "summary", "--filter", filter)).toOption.get
      val out = new java.io.ByteArrayOutputStream()
      Console.withOut(new java.io.PrintStream(out)) {
        RplCli.cis(spark, dioF, daoF, opts)
      }
      out.toString.trim
    }
    val latest = summaryWith("latest")
    summaryWith("keep:1") shouldBe latest
    // keep:99 retains everything here (few findings per node) — the
    // unfiltered result
    summaryWith("keep:99") shouldBe summaryWith("none")
  }

  it("unifylog mode prints the reference Weaver's per-pair decision " +
      "lines (Weaver.hs:186-189) for both layers") {
    val fixture = "/root/reference/net-spider-rpl/test/data/syslog_sr_tables.log"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(fixture)))
      cancel("fixture missing")
    val (dioF, daoF) = graft.rpl.ContikiNg.readLogs(spark, fixture,
      graft.rpl.ContikiNg.SyslogHead(2019))
    val opts = RplCli.parseArgs(Array(fixture, "syslog:2019",
      "unifylog")).toOption.get
    val out = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(out)) {
      RplCli.cis(spark, dioF, daoF, opts)
    }
    val lines = out.toString.split("\n").filter(_.nonEmpty).toSeq
    lines should not be empty
    all(lines) should fullyMatch regex
      """\[(dio|dao)\] Unify link \[.+\]-\[.+\]: from \d+ samples to \d+ samples"""
    // at least one line per layer on this fixture
    lines.count(_.startsWith("[dao]")) should be >= 1
  }

  it("assembles secSince/secUntil with inclusivity flip") {
    val since = RplCli.parseArgs(base ++
      Array("-f", "1970-01-01T00:00:01", "-d", "60")).toOption.get
    RplCli.intervalOf(since) shouldBe graft.time.Interval(
      IntervalEnd(Some(1000L), true), IntervalEnd(Some(61000L), false))
    val until = RplCli.parseArgs(base ++
      Array("-t", "x1970-01-01T00:02:30", "-d", "60")).toOption.get
    RplCli.intervalOf(until) shouldBe graft.time.Interval(
      IntervalEnd(Some(90000L), true), IntervalEnd(Some(150000L), false))
  }
}
