package graft

import org.apache.spark.sql.SparkSession

/** Per-round benchmark: times every SparkEntry query at the target scale
  * factor and prints ONE JSON line for the driver.
  *
  * Timing methodology: each query's result is written to the `noop` sink,
  * which materializes every row and column through the full plan (a bare
  * `count()` would let Catalyst prune projections and short-circuit scans
  * via parquet metadata — see round-1 VERDICT "What's wrong" #2). Failures
  * are reported per-query in the `ok` map rather than silently folded into
  * the timings (#3).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup: initializes codegen, parquet readers and the shuffle
    // machinery so the first timed query isn't charged for JVM spin-up.
    try {
      spark.read.parquet(s"$sfDir/lineitem.parquet")
        .groupBy("l_returnflag").count()
        .write.format("noop").mode("overwrite").save()
    } catch { case _: Throwable => () }
    // Optional args beyond the sf dir: a query-name subset for targeted
    // perf iteration (the driver passes only the dir → full suite).
    val subset = args.drop(1).toSet
    val selected =
      if (subset.isEmpty) SparkEntry.queries
      else SparkEntry.queries.view.filterKeys(subset).toMap
    val results = selected.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok =
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
            false
        }
      (name, (System.nanoTime() - t0) / 1e9, ok)
    }
    val qs = results.map { case (k, v, _) => s""""$k":$v""" }.mkString("{", ",", "}")
    val oks = results.map { case (k, _, ok) => s""""$k":$ok""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val nFailed = results.count(!_._3)
    println(
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"ok":$oks,"failed":$nFailed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
