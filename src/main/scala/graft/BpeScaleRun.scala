package graft

import org.apache.spark.sql.SparkSession

import graft.ops.TextAnalysis

/** BPE trainer scaling harness (VERDICT r12 "Next round" #6): measures
  * the recomputing chain ([[graft.ops.TextAnalysis.bpeMerges]]) against
  * the materialized per-iteration-localCheckpoint form
  * ([[graft.ops.TextAnalysis.bpeMergesMaterialized]]) at increasing merge
  * counts on one corpus, so "per-step cost is flat" is a committed table
  * (BENCH_SF10.md r13 addendum), not narrative. The recomputing form is
  * measured only at small k: its step-k state subtree is referenced
  * TWICE (by step k+1's pair count and by step k+1's state), so without
  * whole-subtree reuse the executed plan roughly doubles per step —
  * measured 6.4 s at k=4, 15.2 s at k=8, and a k=16 run was aborted at
  * >5 min (sf1). The materialized form must grow ~linearly in k
  * (constant secs/step).
  *
  * Usage: runMain graft.BpeScaleRun [sfDir=target/sf1] [maxK=64]
  *        [maxRecomputeK=8]
  */
object BpeScaleRun {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val maxK = args.lift(1).map(_.toInt).getOrElse(64)
    val maxRecomputeK = args.lift(2).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = SparkEntry.T(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("text"))
      .localCheckpoint() // shared input: neither form charged for the scan

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val n = f
      ((System.nanoTime() - t0) / 1e9, n)
    }
    println(s"# BPE merge-count scaling (sfDir=$sfDir)")
    println("| form | k | secs | secs/step |")
    println("|---|---|---|---|")
    val json = scala.collection.mutable.ListBuffer.empty[String]
    val docsId = SparkEntry.T(spark, sfDir, "documents")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
      .localCheckpoint()
    for (k <- Seq(4, 8, 16, 64).filter(_ <= maxK)) {
      // Train ONCE per k and time the table collect itself (ADVICE r13:
      // the earlier count()-then-collect() shape ran the whole trainer
      // twice — ~40 redundant seconds per bench run at k=64/sf1). The
      // collected table serves both the trainer row and the encode legs.
      var table: Seq[(String, String)] = Nil
      val (sm, nm) = time {
        table = TextAnalysis.bpeMergesMaterialized(docs, "text", k)
          .orderBy(org.apache.spark.sql.functions.col("step"))
          .collect().map(r => (r.getString(1), r.getString(2))).toSeq
        table.size.toLong
      }
      println(f"| materialized | $k | $sm%.2f | ${sm / k}%.3f |  <!-- $nm rows -->")
      json += f""""mat_$k":$sm%.2f"""
      // the recomputing chain's plan ~doubles per step: cap it where
      // the point is made (k=16 measured >5 min at sf1 before abort)
      if (k <= maxRecomputeK) {
        val (sr, nr) = time(TextAnalysis.bpeMerges(docs, "text", k).count())
        println(f"| recomputing | $k | $sr%.2f | ${sr / k}%.3f |  <!-- $nr rows -->")
        json += f""""rec_$k":$sr%.2f"""
      }
      // ENCODE with the k-merge table: one projection whose plan size is
      // constant in k (the table folds into a single aggregate literal) —
      // cost should grow sublinearly in k (k cheap replace passes per doc,
      // most of which no-op), nowhere near the trainer's per-step price.
      val (se, ne) = time(
        TextAnalysis.bpeEncode(docsId, "doc_id", "text", table).count())
      println(f"| encode | $k | $se%.2f | ${se / k}%.3f |  <!-- $ne docs -->")
      json += f""""enc_$k":$se%.2f"""
    }
    // --- ENCODE k-curve, fold vs rank-indexed kernel (VERDICT r13 top-
    //     next): tables come from topPairTable (one pass; all-base
    //     operands → valid apply table) so tokenizer-scale k is reachable
    //     without paying k trainer rounds. The fold is O(k·len)/doc — its
    //     curve should grow ~linearly in k; the indexed kernel is
    //     O(applied·len)/doc — its curve should stay flat. Both forms'
    //     outputs are asserted EQUAL here (count + sum of token counts)
    //     on top of the DedupTextSpec differential. ---
    println("| form | k | secs | secs/step |")
    println("|---|---|---|---|")
    val F = org.apache.spark.sql.functions
    def timed[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    for (k <- Seq(3, 64, 256, 1024)) {
      val table = TextAnalysis.topPairTable(docsId, "text", k)
      def agg(df: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
        val r = df.agg(F.count(F.lit(1)), F.sum(F.col("n_bpe_tokens")),
          F.sum(F.col("n_merged_tokens"))).collect()(0)
        (r.getLong(0), r.getLong(1), r.getLong(2))
      }
      val (sf, rf) = timed(
        agg(TextAnalysis.bpeEncode(docsId, "doc_id", "text", table)))
      val (si, ri) = timed(
        agg(TextAnalysis.bpeEncodeIndexed(docsId, "doc_id", "text", table)))
      // table.size everywhere (row labels, per-step divisor, JSON keys):
      // topPairTable can return FEWER than the requested k on a small
      // corpus, and mixing the two made the printed rows and the JSON
      // disagree (ADVICE r14).
      val kEff = table.size
      require(rf == ri,
        s"encode fold vs indexed DIVERGED at k=$kEff: $rf vs $ri")
      println(f"| encode-fold | $kEff | $sf%.2f | ${sf / kEff}%.4f |  <!-- ${rf._2} toks, ${rf._3} merged -->")
      println(f"| encode-indexed | $kEff | $si%.2f | ${si / kEff}%.4f |")
      json += f""""encfold_$kEff":$sf%.2f,"encidx_$kEff":$si%.2f"""
    }
    println("{" + json.mkString(",") + "}")
    spark.stop()
  }
}
