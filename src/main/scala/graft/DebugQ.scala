package graft

import org.apache.spark.sql.SparkSession

/** Scratch: run one registry query with a full stack trace (the bench
  * and verify mains print only getMessage). */
object DebugQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      if (args.contains("--show")) df.show(100, truncate = false)
      else df.write.format("noop").mode("overwrite").save()
      println(s"[debugq] $name OK")
    } catch {
      case e: Throwable => e.printStackTrace()
    }
    spark.stop()
  }
}
