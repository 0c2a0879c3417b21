package graft.eval

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Ranking-metric layer (SURVEY §2.10 E1–E10) — the reference's
  * `src/evaluation/metrics.py:73-317` re-expressed as pure Catalyst array
  * expressions over per-user rows of
  * `(pred: Array[item] ranked desc, gt: Array[item] distinct)`.
  *
  * No UDFs and no shuffle: each metric is a per-row expression (higher-order
  * functions over the arrays), so the metric pass is embarrassingly parallel
  * and whole-stage-codegen'd; only the final mean (E9) aggregates.
  *
  * Numeric parity notes (SURVEY §7.4.3): binary relevance, IDCG over
  * `min(|gt|, k)`, zero for empty ground truth, Double arithmetic throughout.
  */
object RankingMetrics {

  private def topK(pred: Column, k: Int): Column = slice(pred, 1, k)

  /** |top_k ∩ gt| — `gt` must be distinct (it is a set in the reference). */
  def hitsAtK(pred: Column, gt: Column, k: Int): Column =
    size(array_intersect(topK(pred, k), gt))

  /** E1: Recall@K = |top_k ∩ gt| / |gt|, 0 if gt empty
    * (ref `metrics.py:73-96`). */
  def recallAtK(pred: Column, gt: Column, k: Int): Column =
    when(size(gt) === 0, 0.0)
      .otherwise(hitsAtK(pred, gt, k).cast("double") / size(gt))

  /** E2: Precision@K = |top_k ∩ gt| / K (ref `metrics.py:99-119`). */
  def precisionAtK(pred: Column, gt: Column, k: Int): Column =
    hitsAtK(pred, gt, k).cast("double") / k

  /** E4: HitRate@K ∈ {0,1} (ref `metrics.py:160-178`). */
  def hitRateAtK(pred: Column, gt: Column, k: Int): Column =
    when(hitsAtK(pred, gt, k) > 0, 1.0).otherwise(0.0)

  /** DCG@K with binary relevance: Σ_{i<k, pred_i ∈ gt} 1/log2(i+2)
    * (0-based i; ref `metrics.py:140-157`). */
  def dcgAtK(pred: Column, gt: Column, k: Int): Column =
    aggregate(
      transform(topK(pred, k), (x, i) =>
        when(array_contains(gt, x),
          lit(1.0) / log2(i.cast("double") + 2.0)).otherwise(0.0)),
      lit(0.0), (acc, x) => acc + x)

  /** Ideal DCG over min(|gt|, k) positions (ref `metrics.py:150-153`). */
  def idcgAtK(gt: Column, k: Int): Column = {
    val m = least(size(gt), lit(k))
    when(m <= 0, 0.0).otherwise(
      aggregate(
        transform(sequence(lit(0), m - 1), i =>
          lit(1.0) / log2(i.cast("double") + 2.0)),
        lit(0.0), (acc, x) => acc + x))
  }

  /** E3: NDCG@K, 0 for empty gt (ref `metrics.py:122-157`). */
  def ndcgAtK(pred: Column, gt: Column, k: Int): Column = {
    val idcg = idcgAtK(gt, k)
    when(size(gt) === 0 || idcg === 0.0, 0.0)
      .otherwise(dcgAtK(pred, gt, k) / idcg)
  }

  /** E5/W4: reciprocal rank — 1/(1-based position of first hit), 0 if no hit
    * (ref `metrics.py:181-199`). */
  def reciprocalRank(pred: Column, gt: Column): Column = {
    val hitPositions = filter(
      transform(pred, (x, i) =>
        when(array_contains(gt, x), i + 1).otherwise(lit(null))),
      p => p.isNotNull)
    coalesce(lit(1.0) / array_min(hitPositions), lit(0.0))
  }

  /** E6/W6: average precision — running hit-count precision accumulated at
    * each hit position over the FULL prediction list, divided by |gt|
    * (ref `metrics.py:202-228`). Single-row fold via `aggregate` with a
    * (hits, sum, idx) struct accumulator — no window, no shuffle. */
  def averagePrecision(pred: Column, gt: Column): Column = {
    val folded = aggregate(
      pred,
      struct(lit(0L).as("hits"), lit(0.0).as("s"), lit(0L).as("i")),
      (acc, x) => {
        val isHit = array_contains(gt, x)
        val newHits = acc.getField("hits") +
          when(isHit, 1L).otherwise(0L)
        struct(
          newHits.as("hits"),
          (acc.getField("s") + when(isHit,
            newHits.cast("double") / (acc.getField("i") + 1))
            .otherwise(0.0)).as("s"),
          (acc.getField("i") + lit(1L)).as("i"))
      },
      acc => acc.getField("s"))
    when(size(gt) === 0, 0.0).otherwise(folded / size(gt))
  }

  /** E8: exclusion — drop already-seen items from the ranked list before
    * metrics, preserving order (ref `metrics.py:281-283`). Prediction lists
    * are de-duplicated ranked lists, so `array_except`'s distinct semantics
    * are safe here. */
  def excludeSeen(pred: Column, excluded: Column): Column =
    array_except(pred, excluded)

  /** Attach per-user metric columns at each K (ref `metrics.py:291-299`):
    * recall_at_K, precision_at_K, ndcg_at_K, hit_rate_at_K + mrr, map. */
  def perUserMetrics(df: DataFrame, predCol: String, gtCol: String,
                     ks: Seq[Int]): DataFrame = {
    val p = col(predCol); val g = col(gtCol)
    val withKs = ks.foldLeft(df) { (d, k) =>
      d.withColumn(s"recall_at_$k", recallAtK(p, g, k))
        .withColumn(s"precision_at_$k", precisionAtK(p, g, k))
        .withColumn(s"ndcg_at_$k", ndcgAtK(p, g, k))
        .withColumn(s"hit_rate_at_$k", hitRateAtK(p, g, k))
    }
    withKs.withColumn("mrr", reciprocalRank(p, g))
      .withColumn("map", averagePrecision(p, g))
  }

  /** E9: evaluator aggregation — unweighted mean over users with non-empty
    * ground truth (users with empty gt skipped, ref `metrics.py:274-313`). */
  def meanMetrics(perUser: DataFrame, gtCol: String,
                  metricCols: Seq[String]): DataFrame =
    perUser.filter(size(col(gtCol)) > 0)
      .agg(metricCols.map(c => avg(col(c)).as(c)).head,
        metricCols.map(c => avg(col(c)).as(c)).tail: _*)

  /** E7/A11/X3: catalog coverage — distinct items in anyone's top-maxK over
    * catalog size (ref `metrics.py:271,286-288,315-317`). */
  def coverage(df: DataFrame, predCol: String, maxK: Int,
               numItems: Long): DataFrame =
    df.select(explode(slice(col(predCol), 1, maxK)).as("__item"))
      .agg((countDistinct(col("__item")).cast("double") / numItems)
        .as("coverage"))

  /** E10/R10: popularity-weighted novelty — mean −log2(pop/total + 1e-10)
    * over recommended top-K items (ref `metrics.py:449-478`; epsilon
    * documented in FIXTURES §3). `popularity` = (itemCol, cnt). Items
    * absent from the popularity table default to count 1, matching
    * `item_popularity.get(item, 1)` at `metrics.py:474` (NOT 0, which
    * would spike novelty to −log2(1e-10) ≈ 33.2 for unseen items). */
  def noveltyAtK(recs: DataFrame, predCol: String, k: Int,
                 popularity: DataFrame, itemCol: String, cntCol: String,
                 total: Column): DataFrame = {
    val exploded = recs.select(col("*"),
      explode(slice(col(predCol), 1, k)).as(itemCol + "__rec"))
    exploded
      .join(broadcast(popularity),
        exploded(itemCol + "__rec") === popularity(itemCol), "left")
      .withColumn("__p",
        coalesce(col(cntCol).cast("double"), lit(1.0)) / total)
      .agg(avg(-log2(col("__p") + 1e-10)).as("novelty"))
  }
}
