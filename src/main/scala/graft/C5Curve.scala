package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window

import graft.functions.{Vectors => V}
import graft.ops.Similarity

/** Serving-flagship recall/latency curve (VERDICT r12 stretch): sweep the
  * IVF probe width on the c5 1 M-item catalog — nprobe ∈ {1, 2, 4, 8}% of
  * nlist — and measure in-query recall vs the exact top-k plus isolated
  * wall time per point, so the serving flagship's recall/cost tradeoff is
  * a documented knob (ANN_CURVE.md) like the dedup families' cap curves.
  * Catalog construction mirrors c5_serving_ivf exactly: the deterministic
  * planted-geometric 500× corpus written once to parquet so the planner
  * sees honest stats; the timed path is read-catalog → retrieve.
  *
  * Usage: runMain graft.C5Curve [sfDir=/root/testdata/sf0.1] [k=10]
  */
object C5Curve {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.lift(1).map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val catDir = java.nio.file.Files
      .createTempDirectory("graft_c5curve").toString + "/catalog"
    Similarity.plantedGeometricCorpus(
        base.repartition(spark.sparkContext.defaultParallelism), "vec_id",
        "embedding", copies = 500, eps = 0.15)
      .select(col("vec_id").as("item_id"), col("vec").as("embedding"))
      .write.mode("overwrite").parquet(catDir)
    val catalog = spark.read.parquet(catDir)
    val nCat = catalog.count()
    val nlist = math.max(64L, nCat / 500L).toInt // c5's rule: = base rows
    val requests = base.filter(col("vec_id") < 32)
      .select(col("vec_id").as("u"), col("embedding"))
    val nQ = requests.count()

    // exact reference once: one catalog scan vs the broadcast queries
    val qn = V.normalized(requests, "embedding", "__qv")
      .select(col("u"), col("__qv"))
    val cn = V.normalized(catalog, "embedding", "__iv")
      .select(col("item_id"), col("__iv"))
    val w = Window.partitionBy(col("u"))
      .orderBy(col("score").desc, col("item_id"))
    val exact = cn.crossJoin(broadcast(qn))
      .withColumn("score", V.vecDotNative(col("__qv"), col("__iv")))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("u"), col("item_id"))
      .localCheckpoint()
    val nExact = exact.count()

    println(s"# c5 serving IVF recall/latency curve (sfDir=$sfDir, " +
      s"catalog=$nCat, nlist=$nlist, queries=$nQ, k=$k, min-of-2 warm)")
    println("| nprobe | % of nlist | recall | secs |")
    println("|---|---|---|---|")
    val json = scala.collection.mutable.ListBuffer.empty[String]
    for (pct <- Seq(1, 2, 4, 8)) {
      val nprobe = math.max(1, nlist * pct / 100)
      def run() = Similarity.clusterPrunedTopK(requests, catalog, "u",
        "item_id", "embedding", k, nlist = nlist, nprobe = nprobe)
      var best = Double.MaxValue
      (1 to 2).foreach { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        run().write.format("noop").mode("overwrite").save()
        best = math.min(best, (System.nanoTime() - t0) / 1e9)
      }
      val hits = exact.join(
        run().select(col("query_id").as("u"), col("item_id")),
        Seq("u", "item_id"), "left_semi").count()
      val recall = hits.toDouble / nExact
      println(f"| $nprobe | $pct%% | $recall%.4f | $best%.2f |")
      json += f""""p$pct":{"nprobe":$nprobe,"recall":$recall%.4f,"secs":$best%.2f}"""
    }
    println("{" + json.mkString(",") + "}")
    def rm(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
    }
    rm(new java.io.File(catDir).getParentFile)
    spark.stop()
  }
}
