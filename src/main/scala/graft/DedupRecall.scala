package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Differential recall harness for the near-dup family's SCALE paths
  * against the engine's own lossless reference (r8 VERDICT "What's
  * wrong" #1): `simHashNearDups128` (radius 16/128, banding-complete,
  * no cap) defines the exact radius-8-equivalent pair set for a corpus;
  * every lossy/probabilistic path — capped 64-bit SimHash at several
  * bucket caps, MinHash-LSH at the registry knobs — is then scored as
  * pair-recall against it, with wall-clock, so "use X at scale, expect
  * ≥Y% of the exact pairs" is a measured decision rule
  * (DEDUP_RECALL.md), not a shrug.
  *
  * Two distinct loss mechanisms are being measured at once, so the
  * uncapped 64-bit run is included as the decomposition point:
  *  - SIGNATURE loss (64-bit radius-8 vs 128-bit radius-16 draw
  *    different hyperplane sets, so their radius thresholds select
  *    slightly different pair sets) — the uncapped-64 row IS this
  *    floor;
  *  - CAP loss (hash-ordered bucket eviction drops true pairs whose
  *    members are evicted from every colliding bucket) — the gap
  *    between the capped rows and the uncapped-64 row.
  * MinHash adds a third mechanism: it thresholds token-set JACCARD
  * (registry 0.5), a different similarity than fingerprint Hamming, so
  * its recall vs the Hamming reference includes a semantic mismatch
  * term; its row is the "what does the Jaccard path see of the Hamming
  * pair set" answer, reported for completeness.
  *
  * Usage: runMain graft.DedupRecall <sfDir> [outMd]
  */
object DedupRecall {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/repo/target/sf1")
    val outMd = if (args.length > 1) Some(args(1)) else None
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
    val lines = run(spark, sfDir)
    val report = lines.mkString("\n")
    println(report)
    outMd.foreach { p =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), report)
    }
    spark.stop()
  }

  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  /** Pair frame normalized to (a,b) = (min,max), distinct — everything
    * downstream (counts, intersections) stays DISTRIBUTED: at sf1 the
    * exact set is ~10⁷ pairs and at sf10 ~10⁸, far past driver-side
    * set materialization. */
  private def pairs(df: DataFrame): DataFrame =
    df.select(least(col("id1"), col("id2")).as("a"),
        greatest(col("id1"), col("id2")).as("b"))
      .distinct()

  def run(spark: SparkSession, sfDir: String): Seq[String] = {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"))
    val nDocs = docs.count()

    // The lossless reference: registry d_simhash128 knobs. Written to
    // disk once (not cache()d: the pair frame at sf10 outsizes storage
    // memory, and every config re-reads it as a plain parquet scan).
    val exactPath = s"${sys.props("java.io.tmpdir")}/dedup_recall_exact"
    val tExact = timed {
      pairs(Dedup.simHashNearDups128(docs, "doc_id", "text",
          maxHamming = 16, blockCombos = 2))
        .write.mode("overwrite").parquet(exactPath)
    }._2
    val exact = spark.read.parquet(exactPath)
    val nExact = exact.count()

    case class Cfg(name: String, note: String, run: () => DataFrame)
    val cfgs = Seq(
      Cfg("simhash128 cap=4096", "SAME signature as reference; cap loss only",
        () => Dedup.simHashNearDups128(docs, "doc_id", "text",
          maxHamming = 16, blockCombos = 2, maxBucketSize = 4096)),
      Cfg("simhash128 cap=1024", "same signature, tighter cap",
        () => Dedup.simHashNearDups128(docs, "doc_id", "text",
          maxHamming = 16, blockCombos = 2, maxBucketSize = 1024)),
      Cfg("simhash64 uncapped", "signature-noise floor (no cap loss)",
        () => Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 8)),
      Cfg("simhash64 cap=1024", "capped banding",
        () => Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 8,
          maxBucketSize = 1024)),
      Cfg("simhash64 cap=256", "REGISTRY knobs (d_simhash)",
        () => Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 8,
          maxBucketSize = 256)),
      Cfg("simhash64 cap=64", "aggressive cap",
        () => Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 8,
          maxBucketSize = 64)),
      Cfg("minhash uncapped", "Jaccard>=0.5 semantics (different similarity)",
        () => Dedup.minHashNearDups(docs, "doc_id", "text",
          shingleLen = 3, numHashes = 64, bands = 16, threshold = 0.5)),
      Cfg("minhash cap=64", "REGISTRY knobs (d_minhash_lsh)",
        () => Dedup.minHashNearDups(docs, "doc_id", "text",
          shingleLen = 3, numHashes = 64, bands = 16, threshold = 0.5,
          maxBucketSize = 64)))

    val rows = cfgs.map { c =>
      // one pass per config: n_pairs and the exact-intersection size from
      // a single outer-join aggregate (semi + count would scan twice)
      val ((nPairs, hit), t) = timed {
        val p = pairs(c.run())
        val joined = p.join(exact.withColumn("__e", lit(1)),
          Seq("a", "b"), "left")
        val r = joined.agg(count(lit(1)).as("n"),
          count(col("__e")).as("hit")).head()
        (r.getLong(0), r.getLong(1))
      }
      val recall = if (nExact == 0) 1.0 else hit.toDouble / nExact
      (c.name, nPairs, hit, recall, t, c.note)
    }

    def f(d: Double) = String.format(java.util.Locale.ROOT, "%.4f",
      Double.box(d))
    def t1(d: Double) = String.format(java.util.Locale.ROOT, "%.1f",
      Double.box(d))
    Seq(
      s"# DEDUP_RECALL — lossy near-dup scale paths vs the exact pair set",
      "",
      s"Corpus: `$sfDir` ($nDocs docs). Reference = `simHashNearDups128`",
      s"(radius 16/128, blockCombos=2 — lossless banding): " +
        s"**$nExact pairs, ${t1(tExact)} s**.",
      "",
      "| config | pairs | ∩ exact | recall | sec | note |",
      "|---|---|---|---|---|---|") ++
      rows.map { case (n, p, h, r, t, note) =>
        s"| $n | $p | $h | ${f(r)} | ${t1(t)} | $note |"
      } ++ Seq(
      "",
      "Recall = fraction of the exact radius-16/128 pair set emitted by",
      "the lossy path. The uncapped-64 row isolates SIGNATURE loss (64-",
      "vs 128-bit hyperplane draws select slightly different boundary",
      "pairs); cap rows add hash-ordered bucket-eviction loss; MinHash",
      "rows measure a DIFFERENT similarity (token Jaccard ≥ 0.5) against",
      "the Hamming reference, so their number includes the semantic",
      "mismatch between the two families.")
  }
}
