package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Differential pin for the r16 histogram [[Relational.timeSplit]]: the
  * boundary-exact split must equal the full-corpus rank form
  * ([[Relational.timeSplitRank]]) ROW FOR ROW — especially on ts ties
  * straddling the fraction boundaries, which is exactly the case the
  * histogram form's per-boundary-group window must get right. Small value
  * domains force heavy ties; fixed scalacheck seeds keep runs
  * reproducible (the suite's standard offline-sampling pattern). */
class SplitDifferentialSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 300)
    // ts domain of 8 values → every boundary lands inside a tie group
    ts <- Gen.listOfN(n, Gen.choose(0L, 7L))
  } yield ts.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  private def assignments(df: org.apache.spark.sql.DataFrame,
                          f: (org.apache.spark.sql.DataFrame, String, String,
                              Double, Double) => org.apache.spark.sql.DataFrame,
                          trainFrac: Double, valFrac: Double)
      : Map[Long, String] =
    f(df, "ts", "id", trainFrac, valFrac)
      .select(col("id"), col("split")).as[(Long, String)]
      .collect().toMap

  test("histogram timeSplit ≡ rank timeSplit on tie-heavy random multisets") {
    val fracs = Seq((0.8, 0.1), (0.5, 0.5), (0.9, 0.0), (1.0, 0.0),
      (0.33, 0.33))
    (1 to 4).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(700L + batch))
      val df = rows.toDF("ts", "id")
      fracs.foreach { case (tf, vf) =>
        val hist = assignments(df, Relational.timeSplit, tf, vf)
        val rank = assignments(df, Relational.timeSplitRank, tf, vf)
        assert(hist === rank, s"batch $batch fracs ($tf,$vf)")
      }
    }
  }

  test("histogram timeSplit ≡ rank timeSplit when n·frac is exactly integral") {
    // 10 rows, 0.8/0.1 → thresholds 8.0/9.0 land exactly on group edges:
    // the histogram form must classify the edge groups as fully-train /
    // fully-val (no boundary group), matching rank semantics.
    val df = (1L to 10L).map(i => ((i - 1) / 2, i)).toDF("ts", "id")
    val hist = assignments(df, Relational.timeSplit, 0.8, 0.1)
    val rank = assignments(df, Relational.timeSplitRank, 0.8, 0.1)
    assert(hist === rank)
    assert(hist.values.groupBy(identity).view.mapValues(_.size).toMap ===
      Map("train" -> 8, "val" -> 1, "test" -> 1))
  }

  test("null ts sorts first and splits rank-exactly in both forms") {
    val rows = Seq((None, 1L), (None, 2L), (Some(5L), 3L), (Some(6L), 4L),
      (Some(6L), 5L), (Some(7L), 6L), (Some(8L), 7L), (Some(9L), 8L),
      (Some(9L), 9L), (Some(10L), 10L))
    val df = rows.toDF("ts", "id")
    val hist = assignments(df, Relational.timeSplit, 0.8, 0.1)
    val rank = assignments(df, Relational.timeSplitRank, 0.8, 0.1)
    assert(hist === rank)
    // nulls are the two earliest rows → train
    assert(hist(1L) === "train" && hist(2L) === "train")
  }

  test("empty input yields an empty split in both forms") {
    val df = Seq.empty[(Long, Long)].toDF("ts", "id")
    assert(Relational.timeSplit(df, "ts", "id", 0.8, 0.1).count() === 0L)
    assert(Relational.timeSplitRank(df, "ts", "id", 0.8, 0.1).count() === 0L)
  }

  test("deterministicShuffle: dense 1..n positions, reproducible across " +
    "partitionings, ordered by md5 of the key; null key is a loud error") {
    val df = (1L to 97L).map(i => (i, s"doc$i")).toDF("id", "name")
    val a = Relational.deterministicShuffle(df, col("id"))
      .select(col("id"), col("shuffle_pos")).as[(Long, Long)]
      .collect().toMap
    assert(a.values.toSeq.sorted === (1L to 97L))
    // same content, different partitioning → identical positions
    val b = Relational.deterministicShuffle(df.repartition(7), col("id"))
      .select(col("id"), col("shuffle_pos")).as[(Long, Long)]
      .collect().toMap
    assert(a === b)
    // matches the plain-Scala md5 order (content-pure contract)
    val mdig = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String): String = mdig.digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val want = (1L to 97L).sortBy(i => (hex(i.toString), i.toString))
      .zipWithIndex.map { case (id, p) => (id, p + 1L) }.toMap
    assert(a === want)
    val ex = intercept[Exception] {
      Relational.deterministicShuffle(
        Seq((Option.empty[Long], "x")).toDF("id", "name"), col("id"))
        .count()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e =>
        Option(e.getMessage).toSeq ++ msgs(e.getCause))
    assert(msgs(ex).mkString("\n").contains("null shuffle key"))
  }

  test("globalCumSum: exact inclusive running totals on random multisets") {
    (1 to 3).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(900L + batch))
        .map { case (v, id) => (id, v + 1) } // positive weights, unique key
      val df = rows.toDF("k", "w")
      val got = Relational.globalCumSum(df, Seq(col("k")), "w", "cum")
        .select(col("k"), col("cum")).as[(Long, Long)].collect().toMap
      var acc = 0L
      val want = rows.sortBy(_._1).map { case (k, w) =>
        acc += w; (k, acc)
      }.toMap
      assert(got === want, s"batch $batch")
    }
  }
}
