package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.eval.RankingMetrics
import graft.ops.Relational
import graft.sources.Readers

/** The §7.2 minimum end-to-end slice on REAL ML-1M data — the reference's
  * flagship regression surface (`results/EVALUATION_REPORT.md:99-125`,
  * `scripts/evaluate_model.py:162-234`), model-free per SURVEY §7.1:
  *
  *   users.dat + movies.dat (real, via the S1 `::` reader) +
  *   deterministic hash-synthesized ratings.dat (the real file ships no
  *   ratings.dat; Spark RNG ≠ numpy RNG by design, SURVEY §7.4.2, so the
  *   synthesis is xxhash64-derived — bit-stable across runs, partitionings
  *   and cluster sizes) →
  *   implicit labels (P4) → positive-only (P5) → 3-iter k-core (J5) →
  *   global time split (W2) → per-user gt (A8) → popularity scores (A7) →
  *   top-100 excluding train (X4+W3) → E1–E7 metric vector @{5,10,20,50,100}.
  *
  * The golden metric vector below was produced by this pipeline and is
  * asserted to 1e-9 — any regression in ANY stage (reader, labeling,
  * k-core, split, exclusion, ranking, metric math) moves at least one
  * number.
  */
class Ml1mEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val Ml1mDir = "/root/reference/ml-1m"
  private val PerUser = 30 // synthesized interactions per user before dedup

  /** Deterministic ratings: each user hash-picks 30 movie indices; rating
    * and timestamp derive from (user, movie) alone so duplicate picks are
    * identical rows and `distinct()` is exact. Written as a real
    * `::`-delimited ratings.dat and read back through Readers.loadRatings,
    * so the S1 scan path is part of the surface under test. */
  private def synthesizeRatingsDat(movies: DataFrame, users: DataFrame): String = {
    // Synthesis parameters are part of the cache filename — change PerUser
    // or the hashing scheme and bump the version suffix, else a stale
    // cached file silently survives and golden failures point at the
    // wrong stage.
    val out = Paths.get(sys.props("java.io.tmpdir"),
      s"graft_ml1m_ratings_p${PerUser}_v1.dat")
    if (!Files.exists(out)) {
      val nMovies = movies.count() // 3883
      val movieIdx = movies.select(col("movie_id"))
        .withColumn("__midx",
          row_number().over(Window.orderBy(col("movie_id"))) - 1)
      val rows = users.select(col("user_id"))
        .select(col("user_id"),
          explode(sequence(lit(0), lit(PerUser - 1))).as("__j"))
        .withColumn("__midx",
          pmod(xxhash64(col("user_id"), col("__j"), lit("pick")), lit(nMovies)))
        .join(movieIdx, "__midx")
        .select(col("user_id"), col("movie_id"),
          (pmod(xxhash64(col("user_id"), col("movie_id"), lit("r")), lit(5)) + 1)
            .as("rating"),
          // era of the real dataset; wide second range, uniqueness NOT
          // assumed (the split tiebreak below handles collisions)
          (lit(956703932L) +
            pmod(xxhash64(col("user_id"), col("movie_id"), lit("t")),
              lit(86400L * 365))).as("ts"))
        .distinct()
        .orderBy(col("user_id"), col("movie_id"))
        .select(concat_ws("::", col("user_id"), col("movie_id"),
          col("rating"), col("ts")).as("line"))
        .collect().map(_.getString(0))
      Files.write(out, rows.mkString("\n").getBytes("ISO-8859-1"))
    }
    out.toString
  }

  private lazy val metrics: Map[String, Double] = {
    val users = Readers.loadUsers(spark, s"$Ml1mDir/users.dat")
    val movies = Readers.loadMovies(spark, s"$Ml1mDir/movies.dat")
    val ratings = Readers.loadRatings(spark,
      synthesizeRatingsDat(movies, users))

    // P4/P5: implicit labels at the reference threshold, positives only
    val pos = Relational.implicitLabels(ratings, "rating", 4.0)
      .filter(col("label") === 1)
    // J5: fixed-3-iteration k-core, min 5 interactions per user AND item
    val core = Relational.kCore(pos, "user_id", "movie_id", 5, 5, 3)
    // W2: global chronological 80/10/10; (user,movie) is unique after
    // distinct() so this tiebreak makes row order total ⇒ split stable
    val split = Relational.timeSplit(
      core.withColumn("__tb", col("user_id") * 10000 + col("movie_id")),
      "datetime", "__tb")
    val train = split.filter(col("split") === "train")
      .select(col("user_id"), col("movie_id")).distinct()
    val test = split.filter(col("split") === "test")
      .select(col("user_id"), col("movie_id")).distinct()

    // A7: popularity ranking from train; W3/X4: top-100 minus seen, order kept
    val top100 = train.groupBy(col("movie_id"))
      .agg(count(lit(1)).as("c"))
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("c").desc, col("movie_id"))))
      .filter(col("rnk") <= 100).select(col("movie_id"), col("rnk"))
    val userIds = core.select(col("user_id")).distinct()
    val pred = userIds.crossJoin(broadcast(top100))
      .join(train, Seq("user_id", "movie_id"), "left_anti")
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(struct(col("rnk"), col("movie_id"))))
        .as("__o"))
      .select(col("user_id"),
        transform(col("__o"), x => x.getField("movie_id")).as("pred"))
    val gt = test.groupBy(col("user_id"))
      .agg(sort_array(collect_set(col("movie_id"))).as("gt"))
    val predGt = gt.join(pred, Seq("user_id"), "left")
      .withColumn("pred",
        coalesce(col("pred"), array().cast(pred.schema("pred").dataType)))

    // E1–E6, E9: per-user metrics at every reference K, then the mean
    val ks = Seq(5, 10, 20, 50, 100)
    val perUser = RankingMetrics.perUserMetrics(predGt, "pred", "gt", ks)
    val metricCols = ks.flatMap(k => Seq(s"recall_at_$k", s"precision_at_$k",
      s"ndcg_at_$k", s"hit_rate_at_$k")) ++ Seq("mrr", "map")
    val meansRow = RankingMetrics
      .meanMetrics(perUser, "gt", metricCols)
      .withColumn("n_users",
        lit(predGt.filter(size(col("gt")) > 0).count().toDouble))
      .collect()(0)
    val means = (metricCols :+ "n_users").map(c =>
      c -> meansRow.getAs[Double](c)).toMap
    // E7: coverage = distinct recommended (top-100) over catalog size
    val cov = RankingMetrics.coverage(predGt, "pred", 100, movies.count())
      .collect()(0).getAs[Double]("coverage")
    means + ("coverage" -> cov)
  }

  test("ML-1M e2e: pipeline structure (k-core holds, exclusion holds)") {
    val users = Readers.loadUsers(spark, s"$Ml1mDir/users.dat")
    val movies = Readers.loadMovies(spark, s"$Ml1mDir/movies.dat")
    assert(users.count() === 6040 && movies.count() === 3883)
    assert(metrics("n_users") > 4000.0, s"test users = ${metrics("n_users")}")
  }

  test("ML-1M e2e: full golden metric vector (popularity baseline)") {
    // Produced by this pipeline; re-derived, not copied from the reference
    // report (whose numbers come from a trained two-tower model). Monotone
    // sanity (recall rises with K, precision falls) asserted structurally
    // below; exact values pin every stage.
    val golden = Map(
      "recall_at_5" -> 0.0016198283, "recall_at_10" -> 0.0033372365,
      "recall_at_20" -> 0.0049960968, "recall_at_50" -> 0.0133099141,
      "recall_at_100" -> 0.0253669009,
      "precision_at_5" -> 0.0005620609, "precision_at_10" -> 0.0005152225,
      "precision_at_20" -> 0.0004098361, "precision_at_50" -> 0.0004496487,
      "precision_at_100" -> 0.0004238876,
      "ndcg_at_5" -> 0.0008462428, "ndcg_at_10" -> 0.0014218759,
      "ndcg_at_20" -> 0.0019034231, "ndcg_at_50" -> 0.0037582971,
      "ndcg_at_100" -> 0.0059615487,
      "hit_rate_at_5" -> 0.0028103044, "hit_rate_at_10" -> 0.0051522248,
      "hit_rate_at_20" -> 0.0081967213, "hit_rate_at_50" -> 0.0224824356,
      "hit_rate_at_100" -> 0.0419203747,
      "mrr" -> 0.0020151739, "map" -> 0.0011598073,
      "coverage" -> 0.0257532835, "n_users" -> 4270.0)
    val report = golden.keys.toSeq.sorted
      .map(k => f"$k%-16s golden=${golden(k)}%.10f actual=${metrics(k)}%.10f")
      .mkString("\n")
    println(s"[ml1m-e2e]\n$report")
    golden.foreach { case (k, v) =>
      assert(math.abs(metrics(k) - v) < 1e-9, s"$k: ${metrics(k)} != $v")
    }
    // structural monotonicity across K
    assert(metrics("recall_at_5") <= metrics("recall_at_100"))
    assert(metrics("hit_rate_at_5") <= metrics("hit_rate_at_100"))
    assert(metrics("precision_at_5") >= metrics("precision_at_100"))
  }
}
