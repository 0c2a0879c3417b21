package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Graph

/** PageRank iteration-count scaling harness (VERDICT r13 "Next round" #3):
  * measures the checkpoint-per-round form
  * ([[graft.ops.Graph.pageRankCheckpointed]]) at realistic iteration
  * counts on the sf1 item co-occurrence graph, so "per-step cost is flat
  * past the unrolled form's k ≤ 10 cap" is a committed table
  * (BENCH_SF10.md r14 addendum), not narrative. The unrolled form is
  * measured at k ≤ 10 only (its contract); both forms' rounded ranks are
  * asserted EQUAL at the comparison points on top of the GraphSpec
  * exact-equality differential.
  *
  * Usage: runMain graft.PrScaleRun [sfDir=target/sf1]
  */
object PrScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val li = SparkEntry.T(spark, sfDir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    // shared input: neither form charged for deriving the edge set
    val e = li.join(li.withColumnRenamed("l_partkey", "p2"), Seq("l_orderkey"))
      .filter(col("l_partkey") =!= col("p2"))
      .select(col("l_partkey").as("src"), col("p2").as("dst"))
      .distinct()
      .localCheckpoint()
    val nEdges = e.count()
    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    // round(6) = the engine-contract equality (registry rows hash at 6
    // decimals); ulp-level sum-order deltas between the two forms are
    // expected and documented in GraphSpec. The per-row hash is reduced
    // mod 1e9+7 before summing: a raw sum of millions of full-range
    // xxhash64 values overflows a long under ANSI mode.
    def fingerprint(df: org.apache.spark.sql.DataFrame): Long =
      df.select(pmod(xxhash64(col("id"), round(col("pr"), 6)),
          lit(1000000007L)).as("h"))
        .agg(sum(col("h"))).collect()(0).getLong(0)
    println(s"# PageRank iteration scaling (sfDir=$sfDir, |E|=$nEdges)")
    println("| form | k | secs | secs/step |")
    println("|---|---|---|---|")
    val json = scala.collection.mutable.ListBuffer.empty[String]
    json += s""""edges":$nEdges"""
    val fps = scala.collection.mutable.Map.empty[Int, Long]
    for (k <- Seq(3, 10)) {
      val (su, fu) = time(fingerprint(Graph.pageRank(e, "src", "dst", k)))
      println(f"| unrolled | $k | $su%.2f | ${su / k}%.3f |")
      json += f""""unrolled_$k":$su%.2f"""
      fps(k) = fu
    }
    for (k <- Seq(3, 10, 25, 50)) {
      val (sc, fc) =
        time(fingerprint(Graph.pageRankCheckpointed(e, "src", "dst", k)))
      fps.get(k).foreach { fu =>
        require(fu == fc,
          s"pageRank unrolled vs checkpointed DIVERGED at k=$k: $fu vs $fc")
      }
      println(f"| checkpointed | $k | $sc%.2f | ${sc / k}%.3f |")
      json += f""""ckpt_$k":$sc%.2f"""
    }
    println("{" + json.mkString(",") + "}")
    spark.stop()
  }
}
