package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Long-run behavior of the incremental dedup store (VERDICT r10 #7 /
  * r11 carry-over): ingest `batches` micro-batches through the REAL
  * [[graft.streaming.StreamingJobs.incrementalDedupBatch]] merge and
  * measure, per batch, what the touched-buckets-only contract actually
  * costs as the store grows — bytes rewritten (the staged swap's size),
  * store size, store file count — then report total write amplification
  * (bytes written across the run / final store bytes).
  *
  * What the numbers show (sf0.01, 100 batches x 500 docs, 20% dups —
  * see COVERAGE.md row for the measured table):
  *  - per-batch REWRITE is O(touched-bucket bytes), and with uniformly
  *    hashed content keys a batch of B >> numBuckets docs touches EVERY
  *    bucket — so an undersized numBuckets degrades to a full-store
  *    rewrite per batch and total I/O quadratic in the run length. The
  *    remedy is the sizing rule this harness quantifies: pick numBuckets
  *    so a bucket stays ~batch-sized (numBuckets ≈ expected_corpus /
  *    target_bucket_rows); then a batch touches ≤ B buckets and the
  *    rewrite is O(B · target_bucket_rows) — CONSTANT per batch — while
  *    untouched buckets are never read or written.
  *  - store FILE COUNT: the dynamic-partition overwrite REPLACES each
  *    touched bucket directory (nothing accumulates across batches),
  *    but pre-r12 each writer task holding rows of a bucket opened its
  *    own file — and the merge shuffle's AQE-coalesced task count grows
  *    with store size, so files crept toward numBuckets x tasks (this
  *    harness measured 64 buckets -> 462 files, and 13-row files
  *    inflating a 1024-bucket store ~2x in bytes). The swap now
  *    repartitions by __bucket before writing — one file per touched
  *    bucket, file count ≤ numBuckets FOREVER — so no compaction pass
  *    is needed on this store; Layout.compact stays the remedy for the
  *    OTHER fragmentation mode (a corpus that outgrew its numBuckets,
  *    fixed by a one-off re-bucketing rewrite).
  *
  * Usage: runMain graft.IncDedupLongRun <sfDir> [batches=100]
  *   [batchSize=500] [numBuckets=64[,256,...]]
  */
object IncDedupLongRun {

  private def dirStats(path: String): (Long, Long) = {
    val root = new java.io.File(path)
    if (!root.exists()) return (0L, 0L)
    var bytes = 0L
    var files = 0L
    def walk(f: java.io.File): Unit =
      if (f.isDirectory) f.listFiles().foreach(walk)
      else if (f.getName.endsWith(".parquet")) {
        bytes += f.length(); files += 1
      }
    walk(root)
    (bytes, files)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val batches = if (args.length > 1) args(1).toInt else 100
    val batchSize = if (args.length > 2) args(2).toInt else 500
    val bucketConfigs =
      if (args.length > 3) args(3).split(",").map(_.toInt).toSeq
      else Seq(64, 1024)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Fixed doc pool; batch i carries batchSize docs whose content is
    // unique to the batch (suffix) except a 20% tail whose content is
    // SHARED across all batches > 0 (unsuffixed pool text) — a
    // steady-state corpus-growth workload with a real dedup hit rate,
    // fully deterministic.
    val pool = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).limit(batchSize)
      .localCheckpoint()

    for (numBuckets <- bucketConfigs) {
      val store = new java.io.File(
        System.getProperty("java.io.tmpdir"),
        s"graft_incdedup_longrun_$numBuckets").getAbsolutePath
      val fs = new org.apache.hadoop.fs.Path(store)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      fs.delete(new org.apache.hadoop.fs.Path(store), true)
      fs.delete(new org.apache.hadoop.fs.Path(store + ".stage"), true)

      var totalStaged = 0L
      var rows: List[(Int, Long, Long, Long)] = Nil
      for (b <- 0 until batches) {
        val batch = pool.withColumn("doc_id",
            col("doc_id") + lit(b.toLong * 1000000L))
          .withColumn("text",
            when(pmod(col("doc_id"), lit(5)) === 0 && lit(b) > 0, col("text"))
              .otherwise(concat(col("text"), lit(s" #batch$b"))))
        graft.streaming.StreamingJobs.incrementalDedupBatch(
          batch, "doc_id", "text", store, batchId = b.toLong,
          numBuckets = numBuckets)
        val (stagedBytes, _) = dirStats(store + ".stage")
        totalStaged += stagedBytes
        if ((b + 1) % 10 == 0 || b == 0) {
          val (storeBytes, storeFiles) = dirStats(store)
          rows = (b + 1, stagedBytes, storeBytes, storeFiles) :: rows
        }
      }
      val (finalBytes, finalFiles) = dirStats(store)
      val finalRows = spark.read.parquet(store).count()
      println(s"== numBuckets=$numBuckets batches=$batches " +
        s"batchSize=$batchSize ==")
      println(f"${"batch"}%8s ${"rewrittenMB"}%12s ${"storeMB"}%9s " +
        f"${"files"}%7s")
      rows.reverse.foreach { case (b, st, sb, sf) =>
        println(f"$b%8d ${st / 1e6}%12.2f ${sb / 1e6}%9.2f $sf%7d")
      }
      println(f"final: rows=$finalRows store=${finalBytes / 1e6}%.2f MB " +
        f"files=$finalFiles totalWritten=${totalStaged / 1e6}%.2f MB " +
        f"writeAmplification=${totalStaged.toDouble / finalBytes}%.2f")
      fs.delete(new org.apache.hadoop.fs.Path(store), true)
      fs.delete(new org.apache.hadoop.fs.Path(store + ".stage"), true)
    }
    spark.stop()
  }
}
