package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Differential fuzzing of the round-7 parallel-rank / candidate-join
  * devices against plain-Scala references: random multisets through
  * globalRowNumber and rankInGroups, random interval sets through
  * intervalJoin. Fixed scalacheck seeds (same offline-sampling pattern as
  * MetricsPropertySpec) keep runs reproducible. */
class ParallelRankPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    // small value domain → heavy ties, incl. ties spanning range bounds
    vals <- Gen.listOfN(n, Gen.choose(0L, 12L))
  } yield vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  test("globalRowNumber = sorted-order permutation on random multisets") {
    (1 to 4).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(100L + batch))
      val df = rows.toDF("v", "id")
      val got = Relational.globalRowNumber(
          df, Seq(col("v"), col("id")), rnCol = "rn")
        .select(col("id"), col("rn")).as[(Long, Long)].collect()
        .sortBy(_._2).map(_._1).toSeq
      val want = rows.sortBy { case (v, id) => (v, id) }.map(_._2)
      assert(got === want, s"batch $batch")
    }
  }

  test("rankInGroups = reference rank() on random grouped multisets") {
    (1 to 4).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(200L + batch))
        .map { case (v, id) => (s"g${id % 3}", v, id) }
      val df = rows.toDF("g", "v", "id")
      val got = Relational.rankInGroups(df, "g", "v", "rk")
        .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(_._2)
        sorted.zipWithIndex.map { case ((_, v, id), i) =>
          // SQL rank(): 1 + count of strictly-smaller values in the group
          id -> (sorted.count(_._2 < v) + 1).toLong
        }
      }
      assert(got === want, s"batch $batch")
    }
  }

  private val intervalCase: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] =
    for {
      np <- Gen.choose(0, 150)
      pts <- Gen.listOfN(np, Gen.choose(0L, 300L))
      ni <- Gen.choose(0, 25)
      ivs <- Gen.listOfN(ni, for {
        s <- Gen.choose(-20L, 310L)
        w <- Gen.choose(-5L, 80L) // negative width → inverted interval
      } yield (s, s + w))
    } yield (pts.zipWithIndex.map { case (p, i) => (i.toLong, p) },
      ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) })

  test("intervalJoin = naive BETWEEN on random points and intervals") {
    (1 to 4).foreach { batch =>
      val (pts, ivs) = intervalCase
        .pureApply(Gen.Parameters.default, Seed(300L + batch))
      val got = Relational.intervalJoin(
          pts.toDF("pid", "p"), "p",
          ivs.toDF("iid", "s", "e"), "s", "e", bucketWidth = 13L)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, p) <- pts; (iid, s, e) <- ivs if p >= s && p <= e
      } yield (pid, iid)).toSet
      assert(got === want, s"batch $batch")
    }
  }
}
