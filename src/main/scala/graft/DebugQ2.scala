package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Scratch: find (id1,id2) rows whose Jaccard denominator is <= 0 in the
  * token-posting join at a given sf dir. */
object DebugQ2 {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val spark = SparkSession.builder()
      .master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val toks = docs.select(col("doc_id"), col("lang"), col("source"),
      array_distinct(Dedup.tokens(col("text"))).as("__t"))
      .withColumn("__n", size(col("__t")))
    println("[dbg] n range: " +
      toks.agg(min("__n"), max("__n"), count(lit(1))).head())
    val posting = toks.select(col("doc_id"), col("__n"), col("lang"),
      col("source"), explode(col("__t")).as("__tok"))
    val p1 = posting.select(col("doc_id").as("id1"), col("__n").as("n1"),
      col("lang"), col("source"), col("__tok"))
    val p2 = posting.select(col("doc_id").as("id2"), col("__n").as("n2"),
      col("lang"), col("source"), col("__tok"))
    val bad = p1.join(p2, Seq("__tok", "lang", "source"))
      .filter(col("id1") < col("id2"))
      .groupBy(col("id1"), col("id2"), col("n1"), col("n2"))
      .agg(count(lit(1)).as("common"))
      .filter(col("n1") + col("n2") - col("common") <= 0)
    println("[dbg] bad rows:")
    bad.show(10, false)
    spark.stop()
  }
}
