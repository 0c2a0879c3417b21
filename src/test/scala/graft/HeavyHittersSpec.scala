package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.expr.HeavyHittersAgg.heavyHitters

/** Misra-Gries heavy-hitters aggregate (functions/expr/HeavyHittersAgg):
  * exact in the small-domain regime, guarantee-bounded in the approximate
  * regime, merge-correct under adversarial partitioning, SQL-registered.
  */
class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def summarize(df: org.apache.spark.sql.DataFrame, k: Int)
      : Map[String, Long] =
    df.agg(heavyHitters(col("ky"), k).as("hh"))
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est"))
      .as[(String, Long)].collect().toMap

  test("exact regime: distinct < k-1 gives exact counts, any partitioning") {
    val df = (1L to 5000L).map(i => s"v${i % 7}").toDF("ky")
    val exact = df.groupBy("ky").count().as[(String, Long)].collect().toMap
    assert(summarize(df, 16) === exact)
    assert(summarize(df.repartition(13), 16) === exact)
    assert(summarize(df.repartition(1), 16) === exact)
  }

  test("approximate regime: n/k guarantee holds under skew + repartition") {
    // hot key = 50% of stream; 500 tail keys; k small enough to decrement
    val n = 10000L
    val df = (1L to n).map { i =>
      if (i % 2 == 0) "HOT" else s"t${i % 500}"
    }.toDF("ky").repartition(17)
    val k = 32
    val got = summarize(df, k)
    val exact = df.groupBy("ky").count().as[(String, Long)].collect().toMap
    val bound = n / k
    // every item with true freq > n/k is present
    exact.filter(_._2 > bound).keys.foreach { heavy =>
      assert(got.contains(heavy), s"heavy item $heavy missing")
    }
    // estimates are lower bounds within n/k of truth
    got.foreach { case (ky, est) =>
      assert(est <= exact(ky), s"$ky overestimated: $est > ${exact(ky)}")
      assert(exact(ky) - est <= bound,
        s"$ky underestimated beyond n/k: ${exact(ky)} - $est > $bound")
    }
    // state never exceeds k-1 counters
    assert(got.size <= k - 1)
  }

  test("SQL registration: heavy_hitters usable from spark.sql") {
    GraftExtensions.register(spark)
    Seq("a", "a", "b", "a", "c").toDF("ky").createOrReplaceTempView("hh_in")
    val rows = spark.sql(
      """SELECT e.item, e.est
        |FROM (SELECT explode(heavy_hitters(ky, 8)) AS e FROM hh_in)
        |ORDER BY e.est DESC, e.item""".stripMargin)
      .as[(String, Long)].collect().toSeq
    assert(rows === Seq(("a", 3L), ("b", 1L), ("c", 1L)))
  }

  test(">64KB items survive the serialize/deserialize shuffle round-trip") {
    // writeUTF caps entries at 65535 encoded bytes; the length-prefixed
    // byte-array serialization must not. 70_000 ASCII chars = 70_000 UTF-8
    // bytes, and a multi-byte suffix exercises non-ASCII encode lengths.
    val big = "x" * 70000 + "é€𝄞"
    val df = (Seq.fill(5)(big) ++ Seq("small", "small", "tiny"))
      .toDF("ky")
      .repartition(7) // forces partial buffers through serialize/merge
    val got = summarize(df, 16)
    assert(got(big) === 5L)
    assert(got("small") === 2L)
    assert(got("tiny") === 1L)
  }

  test("null inputs are ignored, not counted") {
    val df = Seq(Some("x"), None, Some("x"), None, Some("y"))
      .toDF("ky")
    assert(summarize(df, 8) === Map("x" -> 2L, "y" -> 1L))
  }
}
