package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.multimodal.Multimodal

/** Multimodal binary-column plumbing invariants. */
class MultimodalSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("chunkMedia: exact chunk count and byte coverage; empty payload → 0 chunks") {
    val df = Seq("", "a", "x" * 256, "y" * 257).toDF("text")
    val got = Multimodal.attachFakeMedia(df, "text")
      .select(length(col("media")).as("bytes"),
        size(Multimodal.chunkMedia(col("media"), 256)).as("n_chunks"))
      .as[(Int, Int)].collect().toSeq
    assert(got === Seq((0, 0), (1, 1), (256, 1), (257, 2)))
  }

  test("chunkMedia: concatenated chunks reassemble the payload") {
    val df = Seq("hello world, this is a payload longer than the chunk size")
      .toDF("text")
    val back = Multimodal.attachFakeMedia(df, "text")
      .select(col("text"),
        // BinaryType chunks → strings → concat reassembles the original
        concat_ws("", transform(Multimodal.chunkMedia(col("media"), 8),
          c => c.cast("string"))).as("rt"))
      .filter(col("text") =!= col("rt")).count()
    assert(back === 0L)
  }
}
