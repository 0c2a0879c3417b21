package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** A/B measurement for the IVF assignment escalation
  * (Similarity.assignClustersTwoLevel): at 2 M vectors the n/1000 rule
  * puts nlist at 2000, where FLAT assignment's Θ(n·nlist) term is
  * 4×10⁹ centroid scores and the two-level form's Θ(n·2√nlist) is
  * ~1.8×10⁸ — this main times `embeddingNearDups` both ways on the same
  * corpus and prints pair-count agreement, making the escalation's win
  * and its output drift measured numbers (r8 VERDICT next-round #10).
  *
  * The corpus is the sf10 embeddings table replicated `factor`× by the
  * ScaleUp convention (disjoint id universes, deterministic per-lane
  * jitter so replicas don't create identical-point stacks).
  *
  * Usage: runMain graft.TwoLevelBench [sf10Dir] [factor=10]
  */
object TwoLevelBench {
  def main(args: Array[String]): Unit = {
    val srcDir = args.headOption.getOrElse("/root/repo/target/sf10")
    val factor = if (args.length > 1) args(1).toInt else 10
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

    val base = spark.read.parquet(s"$srcDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // replicate with disjoint id strides + deterministic per-replica
    // jitter (ScaleUp's embedding convention, inline so this bench does
    // not depend on the full-corpus multiplier)
    val stride = 1000000000000L
    val rep = spark.range(factor).withColumnRenamed("id", "__r")
    val corpus = base.crossJoin(broadcast(rep))
      .select((col("vec_id") + col("__r") * stride).as("vec_id"),
        transform(col("embedding"),
          (x, i) => (x + when(col("__r") === 0, 0.0f).otherwise(
            (pmod(xxhash64(col("vec_id"), i, col("__r")), lit(1000))
              .cast("float") / 1000.0f - 0.5f) * 0.05f)).cast("float"))
          .as("embedding"))
      .repartition(cpus.toInt * 4)
    // materialize once so both arms time ASSIGNMENT, not corpus synthesis
    val path = s"${sys.props("java.io.tmpdir")}/twolevel_corpus"
    corpus.write.mode("overwrite").parquet(path)
    val e = spark.read.parquet(path)
    val n = e.count()
    val nlist = math.max(16L, n / 1000L).toInt
    println(s"[twolevel] corpus=$n vectors, nlist=$nlist")

    def timeArm(name: String, twoLevelAbove: Int): (Double, Long) = {
      val t0 = System.nanoTime()
      val pairs = Similarity.embeddingNearDups(e, "vec_id", "embedding",
          threshold = 0.2, nlist = nlist,
          twoLevelNlistAbove = twoLevelAbove)
        .count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[twolevel] $name: $sec%.1f s, $pairs pairs")
      (sec, pairs)
    }
    // two-level first so flat (the slow arm) gets any cache warmth bias
    val (tTwo, pTwo) = timeArm("two-level(coarseProbe=2)", 1)
    val (tFlat, pFlat) = timeArm("flat", Int.MaxValue)
    val agree = if (pFlat == 0) 1.0
      else 1.0 - math.abs(pTwo - pFlat).toDouble / pFlat
    println(f"[twolevel] RESULT flat=$tFlat%.1f s two=$tTwo%.1f s " +
      f"speedup=${tFlat / tTwo}%.2f x pair_agreement=$agree%.4f " +
      s"(flat=$pFlat two=$pTwo)")
    spark.stop()
  }
}
