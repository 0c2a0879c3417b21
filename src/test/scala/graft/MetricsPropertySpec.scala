package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RankingMetrics

/** Differential fuzzing of the ranking-metric expressions (SURVEY §2.10)
  * against an independent plain-Scala reference implementation that
  * transcribes `metrics.py:73-228` directly. The Catalyst forms are pure
  * array expressions with their own shape (HOF folds, struct accumulators);
  * if either side misreads the reference semantics on any edge (empty gt,
  * empty pred, hits past K, K > |pred|), the property run finds it. */
class MetricsPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  // --- plain-Scala reference (independent of the Catalyst forms) ---
  private def log2(x: Double) = math.log(x) / math.log(2.0)
  private def refRecall(pred: Seq[Int], gt: Set[Int], k: Int): Double =
    if (gt.isEmpty) 0.0 else pred.take(k).count(gt).toDouble / gt.size
  private def refPrecision(pred: Seq[Int], gt: Set[Int], k: Int): Double =
    pred.take(k).count(gt).toDouble / k
  private def refHitRate(pred: Seq[Int], gt: Set[Int], k: Int): Double =
    if (pred.take(k).exists(gt)) 1.0 else 0.0
  private def refDcg(pred: Seq[Int], gt: Set[Int], k: Int): Double =
    pred.take(k).zipWithIndex.collect {
      case (p, i) if gt(p) => 1.0 / log2(i + 2.0)
    }.sum
  private def refNdcg(pred: Seq[Int], gt: Set[Int], k: Int): Double = {
    val m = math.min(gt.size, k)
    if (m <= 0) return 0.0
    val idcg = (0 until m).map(i => 1.0 / log2(i + 2.0)).sum
    if (idcg == 0.0) 0.0 else refDcg(pred, gt, k) / idcg
  }
  private def refMrr(pred: Seq[Int], gt: Set[Int]): Double =
    pred.zipWithIndex.collectFirst {
      case (p, i) if gt(p) => 1.0 / (i + 1)
    }.getOrElse(0.0)
  private def refAp(pred: Seq[Int], gt: Set[Int]): Double = {
    if (gt.isEmpty) return 0.0
    var hits = 0; var s = 0.0
    pred.zipWithIndex.foreach { case (p, i) =>
      if (gt(p)) { hits += 1; s += hits.toDouble / (i + 1) }
    }
    s / gt.size
  }

  // ranked lists are duplicate-free in the reference (each item recommended
  // once); gt is a set
  private val caseGen: Gen[(List[Int], Set[Int], Int)] = for {
    predLen <- Gen.choose(0, 30)
    pred <- Gen.pick(predLen, 0 until 60).map(_.toList)
    gtLen <- Gen.choose(0, 12)
    gt <- Gen.pick(gtLen, 0 until 60).map(_.toSet)
    k <- Gen.choose(1, 40)
  } yield (pred, gt, k)

  test("metric expressions match the plain-Scala reference on random inputs") {
    // deterministic scalacheck sampling (scalatestplus bridge not in the
    // offline cache): 5 batches of 60 cases from fixed seeds
    (1 to 5).foreach { batch =>
      val cases = Gen.listOfN(60, caseGen)
        .pureApply(Gen.Parameters.default, Seed(42L + batch))
      locally {
          val distinctKs = cases.map(_._3).distinct.sorted
          val df = cases.zipWithIndex
            .map { case ((p, g, _), i) => (i, p, g.toSeq.sorted) }
            .toDF("i", "pred", "gt")
          // ONE job: per-K metric columns for every distinct K in the batch
          val kCols = distinctKs.flatMap { k =>
            Seq(RankingMetrics.recallAtK(col("pred"), col("gt"), k).as(s"r$k"),
              RankingMetrics.precisionAtK(col("pred"), col("gt"), k).as(s"p$k"),
              RankingMetrics.hitRateAtK(col("pred"), col("gt"), k).as(s"h$k"),
              RankingMetrics.ndcgAtK(col("pred"), col("gt"), k).as(s"n$k"))
          }
          val rows = df.select(Seq(col("i"),
              RankingMetrics.reciprocalRank(col("pred"), col("gt")).as("mrr"),
              RankingMetrics.averagePrecision(col("pred"), col("gt")).as("ap"))
              ++ kCols: _*)
            .orderBy(col("i")).collect()
          def ≈(x: Double, y: Double) = math.abs(x - y) < 1e-12
          cases.zipWithIndex.foreach { case ((pred, gt, k), i) =>
            val row = rows(i)
            assert(≈(row.getAs[Double](s"r$k"), refRecall(pred, gt, k)),
              s"recall@$k: $pred gt=$gt")
            assert(≈(row.getAs[Double](s"p$k"), refPrecision(pred, gt, k)),
              s"precision@$k: $pred gt=$gt")
            assert(≈(row.getAs[Double](s"h$k"), refHitRate(pred, gt, k)),
              s"hitrate@$k: $pred gt=$gt")
            assert(≈(row.getAs[Double](s"n$k"), refNdcg(pred, gt, k)),
              s"ndcg@$k: $pred gt=$gt")
            assert(≈(row.getAs[Double]("mrr"), refMrr(pred, gt)),
              s"mrr: $pred gt=$gt")
            assert(≈(row.getAs[Double]("ap"), refAp(pred, gt)),
              s"ap: $pred gt=$gt")
          }
      }
    }
  }
}
