package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BandJoinRewrite optimizer rule: a pure abs(a−b) <= δ theta-join must
  * re-plan as a bucketed equi-join with identical results; non-matching
  * shapes must be left untouched. */
class BandJoinRuleSpec extends AnyFunSuite {
  // Isolated session state: the rule installs only here, so the shared
  // TestSpark session (used by every other suite) stays vanilla.
  lazy val spark = {
    val s = TestSpark.spark.newSession()
    s.experimental.extraOptimizations =
      Seq(graft.plans.BandJoinRewrite)
    s
  }

  private def frames = {
    import spark.implicits._
    val a = (1L to 300L).map(i => (i, ((i * 2654435761L) % 997L) / 10.0))
      .toDF("ida", "va")
    val b = (1L to 200L).map(i => (i, ((i * 40503L) % 997L) / 10.0))
      .toDF("idb", "vb")
    (a, b)
  }

  test("band theta-join re-plans as an equi-join and matches the naive result") {
    import spark.implicits._
    val (a, b) = frames
    val joined = a.join(b, abs(col("va") - col("vb")) <= lit(1.5))
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin") &&
      !plan.contains("CartesianProduct"),
      s"band join should have been rewritten to an equi-join:\n$plan")
    val got = joined.select("ida", "idb").as[(Long, Long)].collect().toSet
    val av = a.as[(Long, Double)].collect()
    val bv = b.as[(Long, Double)].collect()
    val expected = (for {
      (i, x) <- av; (k, y) <- bv if math.abs(x - y) <= 1.5
    } yield (i, k)).toSet
    assert(got === expected)
  }

  test("rows with null values drop in both forms") {
    import spark.implicits._
    val (a, b) = frames
    val aNull = a.withColumn("va",
      when(col("ida") <= 5, lit(null).cast("double")).otherwise(col("va")))
    val joined = aNull.join(b, abs(col("va") - col("vb")) <= lit(1.5))
      .select("ida", "idb").as[(Long, Long)].collect()
    assert(joined.forall(_._1 > 5))
  }

  test("extreme values: ±Infinity / huge magnitudes don't overflow the replica buckets (ANSI)") {
    import spark.implicits._
    // Floor(v/δ) saturates at Long.MaxValue for v = +Infinity or
    // v >= δ·2^63; the unclamped ±1 replica arithmetic would throw
    // ARITHMETIC_OVERFLOW under Spark 4's default ANSI mode where the
    // original theta-join simply returns no match. The clamp + distinct
    // must also keep each legitimate pair matched exactly once.
    val a = Seq(
      (1L, 1.0), (2L, Double.PositiveInfinity),
      (3L, Double.NegativeInfinity), (4L, 1.7e308), (5L, -1.7e308),
      (6L, 2.0)).toDF("ida", "va")
    val b = Seq(
      (10L, 1.5), (20L, Double.PositiveInfinity), (30L, 1.7e308),
      (40L, Double.NaN)).toDF("idb", "vb")
    val joined = a.join(b, abs(col("va") - col("vb")) <= lit(1.5))
      .select("ida", "idb").as[(Long, Long)].collect()
    // Infinity−Infinity = NaN and huge−huge overflows to the same value
    // minus itself = 0 for equal doubles: 1.7e308 − 1.7e308 = 0 ≤ 1.5.
    val av = Seq(1L -> 1.0, 2L -> Double.PositiveInfinity,
      3L -> Double.NegativeInfinity, 4L -> 1.7e308, 5L -> -1.7e308,
      6L -> 2.0)
    val bv = Seq(10L -> 1.5, 20L -> Double.PositiveInfinity,
      30L -> 1.7e308, 40L -> Double.NaN)
    val expected = (for {
      (i, x) <- av; (k, y) <- bv if math.abs(x - y) <= 1.5
    } yield (i, k))
    assert(joined.sorted === expected.sorted,
      s"got ${joined.toSeq}, expected $expected")
  }

  test("non-band shapes are left untouched") {
    val (a, b) = frames
    // extra conjunct → not the pure band pattern; must still plan and run
    val mixed = a.join(b,
      abs(col("va") - col("vb")) <= lit(1.5) && col("ida") =!= col("idb"))
    assert(mixed.count() > 0)
    // plain inequality → untouched (nested loop is the correct plan here)
    val ineq = a.join(b, col("va") < col("vb") - 90.0)
    assert(ineq.count() > 0)
  }
}
