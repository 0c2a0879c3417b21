package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** ANN recall-vs-cost curve (VERDICT r7 #6): sweep the IVF tuning knobs —
  * nprobe ∈ {1,2,5,10,20} × Lloyd refinement ∈ {0,2} — against the exact
  * brute-force top-k on a real embeddings table, so the tuning story is a
  * committed table (ANN_CURVE.md), not narrative. The reference ships a
  * fixed faiss operating point (`src/serving/retrieval.py:132-133` probes
  * 20 of 1024 with trained centroids); this measures what each knob buys
  * on THIS engine: recall must be monotone in nprobe, and Lloyd-refined
  * centroids must dominate hash-picked seeds at every probe count (the
  * VectorSpec invariant, here measured at scale).
  *
  * Usage: runMain graft.AnnCurve <sfDir> [nQueries=200] [k=10] [nlist=64]
  * Prints one markdown table row per config plus a machine-readable JSON
  * line; wall time is min-of-1 (the curve's signal is recall and RELATIVE
  * cost — scored-pair volume scales with nprobe/nlist by construction).
  */
object AnnCurve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(200)
    val k = args.lift(2).map(_.toInt).getOrElse(10)
    val nlist = args.lift(3).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
      .localCheckpoint()
    val nItems = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)

    def pairs(df: DataFrame) = df.select(col("query_id"), col("item_id"))

    val exact = pairs(Similarity.bruteForceTopK(queries, emb, "vec_id",
        "vec_id", "embedding", k, "cosine", excludeSelf = true))
      .localCheckpoint()
    val nExact = exact.count()

    println(s"# ANN recall-vs-cost curve  (sfDir=$sfDir, items=$nItems, " +
      s"queries=$nQueries, k=$k, nlist=$nlist)")
    println("| nprobe | lloyd | recall | secs | scored-pair fraction |")
    println("|---|---|---|---|---|")
    val results = for {
      lloyd <- Seq(0, 2)
      nprobe <- Seq(1, 2, 5, 10, 20)
    } yield {
      val t0 = System.nanoTime()
      val approx = pairs(Similarity.clusterPrunedTopK(queries, emb,
        "vec_id", "vec_id", "embedding", k, nlist = nlist, nprobe = nprobe,
        refineIters = lloyd, excludeSelf = true))
      val hits = exact.join(approx, Seq("query_id", "item_id"), "left_semi")
        .count()
      val secs = (System.nanoTime() - t0) / 1e9
      val recall = hits.toDouble / nExact
      val frac = nprobe.toDouble / nlist
      println(f"| $nprobe | $lloyd | $recall%.4f | $secs%.1f | $frac%.3f |")
      (nprobe, lloyd, recall, secs)
    }
    val json = results.map { case (np, ll, r, s) =>
      f"""{"nprobe":$np,"lloyd":$ll,"recall":$r%.4f,"secs":$s%.2f}"""
    }.mkString("[", ",", "]")
    println(s"""{"curve":$json,"items":$nItems,"k":$k,"nlist":$nlist}""")
    spark.stop()
  }
}
