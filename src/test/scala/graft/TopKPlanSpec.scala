package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.TopK

/** The custom TopKByScore operator (logical node + SparkStrategy +
  * two-phase physical plan) must agree with the relational window form and
  * plan as partial heap → exchange → final heap. */
class TopKPlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("TopKByScore equals the window form; plans partial → exchange → final") {
    // the 1e-7·i addend makes every score unique → both forms deterministic
    val df = (1 to 10000).map { i =>
      (i % 50, ((i * 37) % 9973).toDouble + i * 1e-7, i)
    }.toDF("g", "score", "payload")
    val got = TopK.topKByScore(df, Seq("g"), "score", 5)
    val w = Window.partitionBy(col("g")).orderBy(col("score").desc)
    val expected = df.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5).drop("rn")
    assert(got.collect().toSet === expected.collect().toSet)
    val plan = got.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerGroupPartial"), s"missing partial:\n$plan")
    assert(plan.contains("TopKPerGroupFinal"), s"missing final:\n$plan")
    assert(plan.contains("Exchange"), s"missing exchange:\n$plan")
  }

  test("TopKByScore edge cases: k ≥ group size, empty input, integer score") {
    val small = Seq((1, 10L, "a"), (1, 20L, "b"), (2, 5L, "c"))
      .toDF("g", "s", "p")
    assert(TopK.topKByScore(small, Seq("g"), "s", 10).collect().toSet ===
      small.collect().toSet) // k over group size keeps everything
    assert(TopK.topKByScore(small.filter(col("g") > 99), Seq("g"), "s", 3)
      .collect().isEmpty)
    // long score goes through the Cast path; top-1 per group
    val top1 = TopK.topKByScore(small, Seq("g"), "s", 1)
      .select("g", "p").as[(Int, String)].collect().toSet
    assert(top1 === Set((1, "b"), (2, "c")))
  }

  test("TopKByScore with no group columns is a GLOBAL top-k (k rows total)") {
    // 8000 rows spread over every input partition — with the old
    // UnspecifiedDistribution each partition leaked its own k rows; AllTuples
    // must force a single-task final phase returning exactly k overall.
    val df = (1 to 8000).map(i => (((i * 131) % 7919).toDouble + i * 1e-7, i))
      .toDF("score", "payload").repartition(16)
    val got = TopK.topKByScore(df, Nil, "score", 7)
    val expected = df.orderBy(col("score").desc).limit(7)
    assert(got.count() === 7)
    assert(got.collect().toSet === expected.collect().toSet)
  }

  test("TopKByScore matches w3's shape on driver testdata (multi-column group)") {
    val sf = "/root/testdata/sf0.001"
    val li = SparkEntry.T(spark, sf, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
    val got = TopK.topKByScore(li, Seq("l_orderkey"), "l_extendedprice", 2)
    val w = Window.partitionBy(col("l_orderkey"))
      .orderBy(col("l_extendedprice").desc)
    // prices within an order can tie in principle; compare (order, price)
    // multisets, which are tie-invariant
    def keys(df: org.apache.spark.sql.DataFrame) = df
      .select(col("l_orderkey"), col("l_extendedprice").cast("double"))
      .as[(Long, Double)].collect().sorted.toSeq
    val expected = li.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 2).drop("rn")
    assert(keys(got) === keys(expected))
  }
}
