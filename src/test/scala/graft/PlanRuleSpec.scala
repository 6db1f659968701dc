package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.TopOneWindowToMaxBy

/** The TopOneWindowToMaxBy optimizer rule: plan shape + result parity. */
class PlanRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](body: => T): T = {
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ TopOneWindowToMaxBy
    try body
    finally spark.experimental.extraOptimizations = before
  }

  private val df = (1 to 300).map { i =>
    (i % 7L, i.toLong * 2654435761L % 1000, i.toLong)
  }.toDF("k", "ts", "seq")

  private def top1(d: DataFrame, asc: Boolean): DataFrame = {
    val ord: Seq[org.apache.spark.sql.Column] =
      if (asc) Seq(col("ts"), col("seq"))
      else Seq(col("ts").desc, col("seq").desc)
    val w = Window.partitionBy(col("k")).orderBy(ord: _*)
    d.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select("k", "ts", "seq")
  }

  private def hasWindow(d: DataFrame): Boolean =
    d.queryExecution.optimizedPlan.collect { case w: LWindow => w }.nonEmpty

  private def hasAggregate(d: DataFrame): Boolean =
    d.queryExecution.optimizedPlan.collect { case a: Aggregate => a }.nonEmpty

  it("rewrites desc top-1 windows to max_by and preserves the result") {
    val want = top1(df, asc = false).as[(Long, Long, Long)]
      .collect().toSet // window plan, rule off
    withRule {
      val d = top1(df, asc = false)
      hasWindow(d) shouldBe false
      hasAggregate(d) shouldBe true
      d.as[(Long, Long, Long)].collect().toSet shouldBe want
    }
  }

  it("rewrites asc top-1 to min_by") {
    val want = top1(df, asc = true).as[(Long, Long, Long)].collect().toSet
    withRule {
      val d = top1(df, asc = true)
      hasWindow(d) shouldBe false
      d.as[(Long, Long, Long)].collect().toSet shouldBe want
    }
  }

  it("leaves rn > 1 filters, rank(), and nullable order keys alone") {
    withRule {
      val w = Window.partitionBy(col("k")).orderBy(col("ts").desc)
      // top-2 is not an argmax
      hasWindow(df.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 2)) shouldBe true
      // rank() has different tie semantics
      hasWindow(df.withColumn("rn", rank().over(w))
        .filter(col("rn") === 1)) shouldBe true
      // nullable order key: max_by skips nulls, row_number does not
      val nullable = df.withColumn("ts",
        when(col("ts") > 500, col("ts")))
      hasWindow(nullable.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)) shouldBe true
    }
  }

  it("does NOT rewrite a global (empty PARTITION BY) top-1") {
    withRule {
      val w = Window.orderBy(col("ts").desc, col("seq").desc)
      val global = df.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select("k", "ts", "seq")
      // the rewrite's global Aggregate would emit one all-null row on
      // an empty input where the window form returns zero rows
      hasWindow(global) shouldBe true
      val empty = df.filter(col("k") < 0)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      empty.count() shouldBe 0L
    }
  }

  it("the SQL-registered extension form fires too (session clone)") {
    withRule {
      df.createOrReplaceTempView("plan_rule_t")
      val d = spark.sql(
        """SELECT k, ts, seq FROM (
          |  SELECT *, row_number() OVER (
          |    PARTITION BY k ORDER BY ts DESC, seq DESC) AS rn
          |  FROM plan_rule_t) WHERE rn = 1""".stripMargin)
      hasWindow(d) shouldBe false
      d.count() shouldBe 7L
    }
  }
}
