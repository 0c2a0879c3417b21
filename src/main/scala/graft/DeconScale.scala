package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession

import graft.ops.Similarity

/** Semantic-decontamination gate A/B at scale (r13): on a CORPUS-shaped
  * test side — the regime where the r13 shape gate auto-escalates — time
  * the pinned exact form (driver-collected literal + per-row fold over
  * the WHOLE test set) against the cluster-blocked escalation the gate
  * picks, and measure what the escalation costs in recall (blocked ⊆
  * exact by construction). This is the embedding-side analogue of the
  * sf10 broadcast-vs-shuffled A/B that derived the n-gram twin's gate
  * (BENCH_SF10.md r12): the gate's thresholds stop being first-principles
  * and become a measured plan choice.
  *
  * Usage: runMain graft.DeconScale [sfDir=target/sf1] [threshold=0.85]
  */
object DeconScale {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("target/sf1")
    val threshold = args.lift(1).map(_.toDouble).getOrElse(0.85)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    // corpus-shaped 50/50 split: test is NOT benchmark-sized
    val train = emb.filter(col("vec_id") % 2 === 0)
    val test = emb.filter(col("vec_id") % 2 === 1)
    val nTrain = train.count(); val nTest = test.count()
    println(s"# semantic-decon gate A/B (sfDir=$sfDir, train=$nTrain, " +
      s"test=$nTest, threshold=$threshold, single run per form)")

    def time[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime()
      val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }
    // pinned exact: the plan the OLD (r12) nlist=0 always ran
    val (tExact, exactFlags) = time {
      Similarity.semanticDecontaminateExact(train, test, "vec_id",
          "embedding", threshold)
        .filter(col("contaminated")).select("vec_id")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    }
    // the gated entry (nlist=0): must auto-escalate on this shape
    val (tAuto, autoFlags) = time {
      Similarity.semanticDecontaminate(train, test, "vec_id",
          "embedding", threshold)
        .filter(col("contaminated")).select("vec_id")
        .as[Long](org.apache.spark.sql.Encoders.scalaLong).collect().toSet
    }
    val subset = autoFlags.subsetOf(exactFlags)
    val recall =
      if (exactFlags.isEmpty) 1.0
      else autoFlags.intersect(exactFlags).size.toDouble / exactFlags.size
    println("| form | secs | flagged | note |")
    println("|---|---|---|---|")
    println(f"| exact (pinned) | $tExact%.1f | ${exactFlags.size} | " +
      f"collects $nTest x d doubles, folds ALL per train row |")
    println(f"| auto (gated) | $tAuto%.1f | ${autoFlags.size} | " +
      f"recall $recall%.4f vs exact; blocked-subset-of-exact=$subset |")
    println(f"""{"t_exact":$tExact%.1f,"t_auto":$tAuto%.1f,""" +
      f""""n_exact":${exactFlags.size},"n_auto":${autoFlags.size},""" +
      f""""recall":$recall%.4f,"subset":$subset}""")
    spark.stop()
  }
}
