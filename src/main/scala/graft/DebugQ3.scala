package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off dev probe for the decontamination plan gate: prints the two
  * size estimates + selected plan, then A/B-times broadcast vs shuffled
  * on a BENCHMARK-shaped split (0.5% test) — the shape the broadcast
  * prefilter exists for. Dev-only, like DebugQ. */
object DebugQ3 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def toks(f: org.apache.spark.sql.DataFrame) =
      f.select(col("doc_id"), graft.ops.Dedup.tokens(col("text")).as("__toks"))
    def split(frac: Double) = {
      val sp = graft.ops.Relational.hashSplit(
        SparkEntry.T(spark, sfDir, "documents"),
        "doc_id", Seq("test" -> frac, "train" -> (1.0 - frac)))
      (toks(sp.filter(col("split") === "test")),
        toks(sp.filter(col("split") === "train")))
    }
    val (t20, tr80) = split(0.2)
    val ts = t20.queryExecution.optimizedPlan.stats.sizeInBytes
    val trs = tr80.queryExecution.optimizedPlan.stats.sizeInBytes
    println(s"[debugq3] 80/20 split: ts=$ts trs=$trs " +
      s"useBroadcast=${ts <= (1L << 28) && ts * 16 <= trs}")
    // benchmark-shaped: 0.5% test vs 99.5% train
    val (te, tr) = split(0.005)
    def time(tag: String, useB: Boolean): Unit = {
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.decontaminationReportFromTokens(
          te, tr, "doc_id", "__toks", n = 3, useBroadcast = useB)
        .write.format("noop").mode("overwrite").save()
      println(f"[debugq3] bench-shaped $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("shuffled ", useB = false)
    time("broadcast", useB = true)
    time("shuffled2", useB = false)
    time("broadcast2", useB = true)
    def time2080(tag: String, useB: Boolean): Unit = {
      val t0 = System.nanoTime()
      graft.ops.TextAnalysis.decontaminationReportFromTokens(
          t20, tr80, "doc_id", "__toks", n = 3, useBroadcast = useB)
        .write.format("noop").mode("overwrite").save()
      println(f"[debugq3] 80/20 $tag: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time2080("shuffled ", useB = false)
    time2080("shuffled2", useB = false)
    time2080("broadcast", useB = true)
    spark.stop()
  }
}
