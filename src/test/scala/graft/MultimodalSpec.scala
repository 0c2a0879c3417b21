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

  test("resizeDims: fit-within-box goldens, never upscales, aspect held") {
    val metas = Seq(
      (1L, 640, 480),  // downscale: bound by width -> 224 x 168
      (2L, 100, 100),  // already inside the box -> unchanged
      (3L, 100, 400),  // bound by height -> 56 x 224
      (4L, 448, 224))  // bound by width -> 224 x 112
      .toDF("id", "w", "h")
      .select(col("id"), struct(lit("fake/raw").as("format"),
        col("w").cast("int").as("width"),
        col("h").cast("int").as("height")).as("media_meta"))
    val got = metas.select(col("id"),
        Multimodal.resizeDims(col("media_meta"), 224, 224).as("rd"))
      .select(col("id"), col("rd.width"), col("rd.height"))
      .as[(Long, Int, Int)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) === ((224, 168)))
    assert(got(2L) === ((100, 100))) // scale capped at 1.0 — no upscale
    assert(got(3L) === ((56, 224)))
    assert(got(4L) === ((224, 112)))
  }
}
