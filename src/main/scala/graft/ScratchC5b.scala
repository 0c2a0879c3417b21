package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.ops.Similarity
import graft.functions.{Vectors => V}

/** r20 scratch: stage attribution for c5b_serving_ivf_int8 (not part of
  * any query path; delete after the round). */
object ScratchC5b {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        "512")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    QueriesEval.seedServingFixtures(spark, d)
    def time(tag: String)(f: => DataFrame): Unit = {
      (1 to 2).foreach { i =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        println(f"[scratch] $tag run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
    }
    val base = SparkEntry.T(spark, d, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val (catalog, _) = QueriesEval.c5CatalogForScratch(spark, d)
    val (qcat, _) = QueriesEval.c5QuantCatalogForScratch(spark, d)
    def mkItems = qcat.select(col("item_id"),
      transform(col("qvec"), x => x.cast("float") * col("scale"))
        .as("embedding"))
    val nCat = SparkEntry.rowCount(spark, d, "embeddings") * 500L
    val nlist = math.max(64L, nCat / 500L).toInt
    val nprobe = math.max(8, nlist / 25)
    val requests = base.filter(col("vec_id") < 32)
      .select(col("vec_id").as("u"), col("embedding"))
    println(s"[scratch] nCat=$nCat nlist=$nlist nprobe=$nprobe")

    time("dequant scan alone") { mkItems }
    time("dequant scan + normalize") {
      V.normalized(mkItems.select(col("item_id"),
        col("embedding").as("__iv")), "__iv", "__in").drop("__iv")
    }

    // inline clusterPrunedTopK pipeline with toggleable fixes
    def approx(items: DataFrame, ckptCentroids: Boolean,
               barrierItems: Boolean): DataFrame = {
      val it = if (barrierItems) Similarity.evalBarrier(items) else items
      val seeds0 = Similarity.pickCentroids(it, "item_id", "embedding", nlist)
      val centroids =
        if (ckptCentroids) seeds0.localCheckpoint(true) else seeds0
      val itemsIded =
        it.select(col("item_id"), col("embedding").as("__iv"))
      val itemsC = Similarity.assignClustersTwoLevel(
        itemsIded, "__iv", centroids, nlist)
      val qProbe = {
        val scored = requests
          .select(col("u").as("query_id"), col("embedding").as("__qv"))
          .crossJoin(broadcast(centroids))
          .withColumn("__d", V.l2Distance(col("__qv"), col("centroid_vec")))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("__d"), col("centroid_id"))
        scored.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") <= nprobe)
          .select(col("query_id"), col("__qv"), col("centroid_id"))
      }
      val pairs = broadcast(V.normalized(qProbe, "__qv", "__qn").drop("__qv"))
        .join(Similarity.evalBarrier(
          V.normalized(itemsC, "__iv", "__in").drop("__iv")),
          Seq("centroid_id"))
      val scored0 = pairs.withColumn("score",
        V.vecDotNative(col("__qn"), col("__in")))
      val w = Window.partitionBy(col("query_id"))
        .orderBy(col("score").desc, col("item_id"))
      scored0.withColumn("rank", row_number().over(w))
        .filter(col("rank") <= 10)
        .select(col("query_id"), col("rank"), col("item_id"), col("score"))
    }

    time("V0 approx (as-is)") { approx(mkItems, false, false) }
    time("V2 approx (ckpt centroids)") { approx(mkItems, true, false) }
    time("V1 approx (barrier items)") { approx(mkItems, false, true) }
    time("V3 approx (both)") { approx(mkItems, true, true) }
    time("V0b library clusterPrunedTopK") {
      Similarity.clusterPrunedTopK(requests, mkItems, "u",
        "item_id", "embedding", 10, nlist = nlist, nprobe = nprobe)
    }
    spark.stop()
  }
}
