package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.concurrent.TrieMap

/** r20 scratch: per-JOB wall-clock attribution for registry queries (not
  * part of any query path; delete after the round).
  * Usage: tools/runjava.sh graft.ScratchJobs <sfDir> <query> [query...]
  * Prints every Spark job the query triggers (construction-time collects,
  * checkpoints, the final noop write) with duration and call site. */
object ScratchJobs {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1)
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
    if (names.exists(_.startsWith("c5")))
      QueriesEval.seedServingFixtures(spark, d)
    val starts = TrieMap.empty[Int, (Long, String)]
    val lines = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    @volatile var epoch = System.nanoTime()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val site = Option(j.properties)
          .flatMap(p => Option(p.getProperty("callSite.long")))
          .map(_.linesIterator.take(3).mkString(" <- "))
          .getOrElse("?")
        starts.put(j.jobId, (System.nanoTime(), site))
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val si = s.stageInfo
        val dur = (for {a <- si.completionTime; b <- si.submissionTime}
          yield (a - b) / 1e3).getOrElse(-1.0)
        if (dur >= 0.3) {
          val at = (System.nanoTime() - epoch) / 1e9
          val tm = si.taskMetrics
          lines.add(f"[stage] ${si.stageId}%4d at $at%6.2f dur $dur%6.2f " +
            f"tasks=${si.numTasks} run=${tm.executorRunTime / 1e3}%5.2f " +
            f"cpu=${tm.executorCpuTime / 1e9}%5.2f " +
            f"deser=${tm.executorDeserializeTime / 1e3}%5.2f " +
            f"${si.name.take(70)}")
        }
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = {
        starts.remove(j.jobId).foreach { case (t0, site) =>
          val s = (System.nanoTime() - t0) / 1e9
          val at = (t0 - epoch) / 1e9
          lines.add(f"[job] ${j.jobId}%4d at $at%6.2f dur $s%6.2f  $site")
        }
      }
    })
    names.foreach { n =>
      (1 to 2).foreach { i =>
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        spark.catalog.clearCache()
        System.gc()
        lines.clear()
        epoch = System.nanoTime()
        val t0 = epoch
        SparkEntry.queries(n)(spark, d)
          .write.format("noop").mode("overwrite").save()
        val total = (System.nanoTime() - t0) / 1e9
        Thread.sleep(300)
        println(f"==== $n run$i total ${total}%.2f s")
        lines.forEach(l => println(l))
      }
    }
    spark.stop()
  }
}
