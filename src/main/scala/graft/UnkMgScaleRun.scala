package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.TextAnalysis

/** Corpus-scale throughput for the UNK rewrite pair (VERDICT r13 "Next
  * round" #7): the registry row `t_unk_mg_rewrite` runs on a planted
  * 2048-doc Zipf corpus BY DESIGN (it proves the Misra-Gries sketch cut
  * equals the exact cut, hash-matched through the sketch) and is therefore
  * scale-invariant — this harness supplies the missing corpus-scale
  * number: exact [[TextAnalysis.unkRewrite]] vs sketch-vocab
  * [[TextAnalysis.unkRewriteMG]] on the real documents table at sf1/sf10.
  * Doc-level agreement between the two rewrites is computed in-run (the
  * sketch may legitimately swap boundary vocab terms; the interesting
  * number is how often that changes a document).
  *
  * Usage: runMain graft.UnkMgScaleRun [sfDir=target/sf10] [vocab=1000]
  *        [capacity=4096]
  */
object UnkMgScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf10")
    val vocab = args.lift(1).map(_.toInt).getOrElse(1000)
    val capacity = args.lift(2).map(_.toInt).getOrElse(4096)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SparkEntry.T(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).localCheckpoint()
    val n = docs.count()
    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    def summarize(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(sum(col("n_unk")), sum(col("n_tokens"))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    println(s"# UNK rewrite corpus-scale (sfDir=$sfDir, docs=$n, " +
      s"V=$vocab, capacity=$capacity)")
    val (se, (unkE, tokE)) = time(summarize(
      TextAnalysis.unkRewrite(docs, "doc_id", "text", vocab)))
    println(f"| unkRewrite (exact top-V) | $se%.2f s | $unkE unk / $tokE toks |")
    val (sm, (unkM, tokM)) = time(summarize(
      TextAnalysis.unkRewriteMG(docs, "doc_id", "text", vocab, capacity)))
    println(f"| unkRewriteMG (sketch)    | $sm%.2f s | $unkM unk / $tokM toks |")
    // doc-level agreement: identical rewritten text
    val e = TextAnalysis.unkRewrite(docs, "doc_id", "text", vocab)
      .select(col("doc_id"), col("unk_text").as("a"))
    val m = TextAnalysis.unkRewriteMG(docs, "doc_id", "text", vocab, capacity)
      .select(col("doc_id"), col("unk_text").as("b"))
    val agree = e.join(m, "doc_id")
      .agg(sum(when(col("a") === col("b"), 1L).otherwise(0L)),
        count(lit(1))).collect()(0)
    println(s"| doc-level agreement | ${agree.getLong(0)} / ${agree.getLong(1)} |")
    println(f"""{"exact_s":$se%.2f,"mg_s":$sm%.2f,"docs":$n,"agree":${agree.getLong(0)},"total":${agree.getLong(1)}}""")
    spark.stop()
  }
}
