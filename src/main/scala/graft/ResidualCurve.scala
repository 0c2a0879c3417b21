package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Raw-PQ vs residual-PQ IVF recall, at matched operating points (r17
  * verdict #1 — faiss `IVFx,PQy` encodes residuals; this measures what
  * that buys on THIS engine). Sweeps coarse-centroid quality (lloyd ∈
  * {0, 2}) × nprobe ∈ {2, 4, 8} with (m, ksub, nlist) fixed; within a
  * (lloyd, nprobe) cell the coarse table is IDENTICAL between the raw
  * and residual arms (same pickCentroids seed + same refine procedure),
  * so the recall delta is pure quantization. The residual hypothesis is
  * conditional: residuals shrink the coded variance only when the
  * centroid is the CELL MEAN (lloyd > 0) — against hash-picked
  * data-point "centroids" the residual is a full-length displacement
  * and buys nothing; both regimes are printed so the conclusion is a
  * measured table, not narrative.
  *
  * Usage: runMain graft.ResidualCurve <sfDir|mog:nItems:nCenters:sigma>
  *   [nQueries=50] [k=5] [nlist=16] [m=16] [ksub=64]
  *
  * The `mog:` corpus is a deterministic hash-derived mixture of
  * Gaussians (the regime REAL embedding tables live in — points near a
  * small set of directions): center lane c_i ∈ [−1, 1) from
  * xxhash64(center, lane), point = center + sigma·u with u ∈ [−1, 1)
  * from xxhash64(id, lane) — no RNG, same rows every run (the
  * plantedGeometricCorpus device at cluster granularity). On it the
  * coarse quantizer RECOVERS the centers, so residuals shrink to the
  * sigma-ball and the same m·ksub budget codes them near-exactly —
  * the faiss-parity gain the driver's geometry-free table cannot
  * show. */
object ResidualCurve {

  /** Deterministic mixture-of-Gaussians embedding corpus (no RNG — all
    * hash-derived, same rows every run): center lane ∈ [−1, 1) from
    * xxhash64(center, lane); point = center + sigma·u, u ∈ [−1, 1) from
    * xxhash64(id, lane). Cluster id = vec_id % nCenters. The clustered
    * regime real embedding tables live in — the corpus where residual
    * encoding shows its textbook gain (and a spec fixture for pinning
    * it). */
  def mogCorpus(spark: SparkSession, nItems: Int, nCenters: Int,
                sigma: Double, dim: Int = 64): DataFrame =
    spark.range(nItems).select(col("id").as("vec_id"),
      transform(sequence(lit(0), lit(dim - 1)), i => {
        val c = pmod(col("id"), lit(nCenters.toLong))
        val centerLane =
          pmod(xxhash64(c, i), lit(2000000L)).cast("double") /
            1000000.0 - 1.0
        val noise = (pmod(xxhash64(col("id"), i, lit(7L)),
          lit(2000000L)).cast("double") / 1000000.0 - 1.0) * sigma
        (centerLane + noise).cast("float")
      }).as("embedding"))

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val nQueries = args.lift(1).map(_.toInt).getOrElse(50)
    val k = args.lift(2).map(_.toInt).getOrElse(5)
    val nlist = args.lift(3).map(_.toInt).getOrElse(16)
    val m = args.lift(4).map(_.toInt).getOrElse(16)
    val ksub = args.lift(5).map(_.toInt).getOrElse(64)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = (if (sfDir.startsWith("mog:")) {
      val parts = sfDir.split(":")
      mogCorpus(spark, parts(1).toInt, parts(2).toInt, parts(3).toDouble)
    } else spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding")))
      .localCheckpoint()
    val nItems = emb.count()
    val queries = emb.filter(col("vec_id") < nQueries)

    def pairs(df: DataFrame) = df.select(col("query_id"), col("item_id"))
    val exact = pairs(Similarity.bruteForceTopK(queries, emb, "vec_id",
        "vec_id", "embedding", k, "cosine", excludeSelf = true))
      .localCheckpoint()
    val nExact = exact.count()
    def recallOf(df: DataFrame): Double =
      exact.join(pairs(df), Seq("query_id", "item_id"), "left_semi")
        .count().toDouble / nExact

    println(s"# Raw-PQ vs residual-PQ IVF recall  (sfDir=$sfDir, " +
      s"items=$nItems, queries=$nQueries, k=$k, nlist=$nlist, m=$m, " +
      s"ksub=$ksub, refineFactor=10)")
    println("| lloyd | nprobe | raw ADC | raw+refine | res ADC | res+refine |")
    println("|---|---|---|---|---|---|")
    // raw codebook doesn't depend on the coarse-centroid quality knob —
    // train once outside the sweep
    val cbRaw = Similarity.pqTrain(emb, "vec_id", "embedding", m, ksub,
      refineIters = 2)
    val rows = for (lloyd <- Seq(0, 2)) yield {
      val idx = Similarity.ivfPqTrain(emb, "vec_id", "embedding", m, ksub,
        nlist, coarseIters = lloyd)
      for (nprobe <- Seq(2, 4, 8)) yield {
        val rawAdc = recallOf(Similarity.clusterPrunedTopKPq(queries, emb,
          "vec_id", "vec_id", "embedding", k, cbRaw, nlist = nlist,
          nprobe = nprobe, refineIters = lloyd, excludeSelf = true))
        val rawRef = recallOf(Similarity.clusterPrunedTopKPq(queries, emb,
          "vec_id", "vec_id", "embedding", k, cbRaw, nlist = nlist,
          nprobe = nprobe, refineIters = lloyd, refineFactor = 10,
          excludeSelf = true))
        val resAdc = recallOf(Similarity.clusterPrunedTopKPqResidual(
          queries, emb, "vec_id", "vec_id", "embedding", k, idx,
          nprobe = nprobe, excludeSelf = true))
        val resRef = recallOf(Similarity.clusterPrunedTopKPqResidual(
          queries, emb, "vec_id", "vec_id", "embedding", k, idx,
          nprobe = nprobe, refineFactor = 10, excludeSelf = true))
        println(f"| $lloyd | $nprobe | $rawAdc%.4f | $rawRef%.4f " +
          f"| $resAdc%.4f | $resRef%.4f |")
        (lloyd, nprobe, rawAdc, rawRef, resAdc, resRef)
      }
    }
    val json = rows.flatten.map { case (ll, np, ra, rr, sa, sr) =>
      f"""{"lloyd":$ll,"nprobe":$np,"raw_adc":$ra%.4f,"raw_ref":$rr%.4f,""" +
        f""""res_adc":$sa%.4f,"res_ref":$sr%.4f}"""
    }.mkString("[", ",", "]")
    println(s"""{"residual_curve":$json,"items":$nItems,"k":$k,""" +
      s""""nlist":$nlist,"m":$m,"ksub":$ksub}""")
    spark.stop()
  }
}
