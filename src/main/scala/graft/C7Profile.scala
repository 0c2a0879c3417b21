package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.eval.RankingMetrics
import graft.ops.Relational

/** Stage-attribution harness for `c7_e2e_eval` (VERDICT r14 next #5: the
  * sf10 dominant stage was named only as "fact join+agg" — measure it).
  * Mirrors the registry query's stages verbatim (same fixtures, same
  * checkpoint barriers) but materializes and TIMES each one separately, so
  * the 200-second sf10 total decomposes into named stages instead of a
  * guess. Dev tool — the oracle-gated query in QueriesEval is the
  * authority; this copies its stage structure for observability only.
  *
  * Usage: tools/runjava.sh graft.C7Profile [sfDir]
  */
object C7Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTS", "512"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    var total = 0.0
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      val s = (System.nanoTime() - t0) / 1e9
      total += s
      println(f"| $tag | $s%.1f |")
      a
    }
    println(s"## c7 stage attribution @ $sfDir (local[$cpus])")
    println("| stage | secs |")
    println("|---|---|")

    val ks = Seq(5, 10, 20, 50, 100)
    val base = SparkEntry.T(spark, sfDir, "lineitem")
      .join(SparkEntry.T(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("u"), col("l_partkey").as("it"),
        col("l_quantity").as("rating"), col("l_shipdate").as("sd"))
    val inter = timed("fact join + label filter + (u,it) agg [ckpt]") {
      Relational.implicitLabels(base, "rating", 25.0)
        .filter(col("label") === 1)
        .groupBy(col("u"), col("it")).agg(min(col("sd")).as("ts"))
        .localCheckpoint()
    }
    // A/B knobs (VERDICT r15 next #1/#6): SPARK_GRAFT_C7_SPLIT=rank|hist
    // picks the timeSplit form; SPARK_GRAFT_C7_CORE_CKPT=false drops the
    // registry's post-k-core barrier (r16 default matches the registry:
    // barrier ON — the histogram split reads its input in 3 subtrees);
    // SPARK_GRAFT_C7_KCORE=iter barriers INSIDE the k-core loop after
    // every iteration (the r15 next #6 question) instead of only at the
    // end.
    val splitForm = sys.env.getOrElse("SPARK_GRAFT_C7_SPLIT", "hist")
    val coreCkpt =
      !sys.env.get("SPARK_GRAFT_C7_CORE_CKPT").contains("false")
    val kcoreForm = sys.env.getOrElse("SPARK_GRAFT_C7_KCORE", "plain")
    val core = timed(s"k-core chain ($kcoreForm) " +
        (if (coreCkpt) "[ckpt]" else "[count]")) {
      val c =
        if (kcoreForm == "iter") {
          // kCore's loop with a barrier after each iteration: each `cur`
          // feeds two degree aggs + two semi-joins; the question is
          // whether cutting AQE re-derivation across iterations beats
          // the extra materializations.
          var cur = inter
          for (_ <- 1 to 3) {
            val okU = cur.groupBy(col("u")).count()
              .filter(col("count") >= 5).select(col("u"))
            cur = cur.join(okU, Seq("u"), "left_semi")
            val okI = cur.groupBy(col("it")).count()
              .filter(col("count") >= 5).select(col("it"))
            cur = cur.join(okI, Seq("it"), "left_semi").localCheckpoint()
          }
          cur
        } else Relational.kCore(inter, "u", "it", 5, 5, 3)
      if (coreCkpt) c.localCheckpoint()
      else { c.count(); c }
    }
    val split = timed(s"timeSplit $splitForm [ckpt]") {
      val in = core.withColumn("__tb",
        format_string("%020d%020d", col("u"), col("it")))
      (if (splitForm == "rank") Relational.timeSplitRank(in, "ts", "__tb", 0.8, 0.1)
       else Relational.timeSplit(in, "ts", "__tb", 0.8, 0.1))
        .localCheckpoint()
    }
    val predGt = timed("train/test/pop/top100/pred/gt build [ckpt]") {
      val train = split.filter(col("split") === "train")
        .select(col("u"), col("it"))
      val test = split.filter(col("split") === "test")
        .select(col("u"), col("it"))
      val pop = train.groupBy(col("it")).agg(count(lit(1)).as("c"))
      val top100Arr = pop.orderBy(col("c").desc, col("it")).limit(100)
        .agg(sort_array(collect_list(struct((-col("c")).as("nc"), col("it"))))
          .as("__t"))
        .select(transform(col("__t"), x => x.getField("it")).as("__arr"))
      val users = split.select(col("u")).distinct()
      val topItems = top100Arr.select(explode(col("__arr")).as("it"))
      val seen = train.join(broadcast(topItems), Seq("it"), "left_semi")
        .groupBy(col("u")).agg(collect_set(col("it")).as("__excl"))
      val pred = users.join(seen, Seq("u"), "left")
        .crossJoin(broadcast(top100Arr))
        .select(col("u"),
          when(col("__excl").isNull, col("__arr"))
            .otherwise(filter(col("__arr"),
              x => !array_contains(col("__excl"), x))).as("pred"))
      val gt = test.groupBy(col("u"))
        .agg(sort_array(collect_set(col("it"))).as("gt"))
      gt.join(pred, Seq("u"), "left")
        .withColumn("pred",
          coalesce(col("pred"), array().cast(pred.schema("pred").dataType)))
        .localCheckpoint()
    }
    timed("metric means + coverage tail [collect]") {
      val per = RankingMetrics.perUserMetrics(predGt, "pred", "gt", ks)
      val metricCols = ks.flatMap(k => Seq(s"recall_at_$k",
        s"precision_at_$k", s"ndcg_at_$k", s"hit_rate_at_$k")) ++
        Seq("mrr", "map")
      val means = per.filter(size(col("gt")) > 0).agg(
        count(lit(1)).as("n_users"),
        metricCols.map(c => round(avg(col(c)), 6).as(c)): _*)
      val cov = predGt.select(explode(slice(col("pred"), 1, 100)).as("it"))
        .agg(countDistinct(col("it")).as("nd"))
      val cat = inter.agg(countDistinct(col("it")).as("nc"))
      means.crossJoin(cov).crossJoin(cat)
        .withColumn("coverage", col("nd") / col("nc"))
        .drop("nd", "nc")
        .collect()
    }
    println(f"| TOTAL (sum of stages) | $total%.1f |")
    spark.stop()
  }
}
