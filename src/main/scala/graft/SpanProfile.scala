package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.{Dedup, TextAnalysis}

/** Stage attribution for `dedupSpans` at scale (its first sf10 measure
  * came in superlinear: 8.1 s sf1 → 137.7 s sf10 = 17×/decade) — times
  * each stage of the span-removal skeleton separately so the flag is
  * named, not guessed. Dev tool; the oracle-gated query is the authority.
  *
  * Usage: tools/runjava.sh graft.SpanProfile [sfDir] [n]
  */
object SpanProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val n = if (args.length > 1) args(1).toInt else 8
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
    def timed[A](tag: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"| $tag | ${(System.nanoTime() - t0) / 1e9}%.1f | $a |")
      a
    }
    println(s"## dedupSpans stage attribution @ $sfDir n=$n")
    println("| stage (cumulative subtree) | secs | rows |")
    println("|---|---|---|")
    val df = SparkEntry.T(spark, sfDir, "documents")
    val toks = df.select(col("doc_id"), Dedup.tokens(col("text")).as("__t"))
    val spans = toks
      .select(col("doc_id"),
        posexplode(when(size(col("__t")) < n,
          array().cast("array<string>"))
          .otherwise(Dedup.wordShinglesFromTokens(col("__t"), n)))
          .as(Seq("__i", "__span")))
      .select(col("doc_id"), col("__i").cast("long").as("__i"),
        md5(col("__span")).as("__h"))
    timed("spans (explode+md5)")(spans.count())
    val firstSeen = spans.groupBy(col("__h"))
      .agg(min(struct(col("doc_id").as("__fid"), col("__i").as("__fidx")))
        .as("__first"))
    timed("+ election agg")(firstSeen.count())
    val dup = spans.join(firstSeen, Seq("__h"))
      .filter(!(col("__first.__fid") === col("doc_id") &&
        col("__first.__fidx") === col("__i")))
    timed("+ dup-occurrence join")(dup.count())
    val removed = dup
      .select(col("doc_id"),
        explode(sequence(col("__i"), col("__i") + (n - 1))).as("__p"))
      .distinct()
    timed("+ coverage explode+distinct")(removed.count())
    timed("FULL dedupSpans (noop)") {
      TextAnalysis.dedupSpans(df, "doc_id", "text", n)
        .write.format("noop").mode("overwrite").save()
      "-"
    }
    spark.stop()
  }
}
