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

  test("blockHash64: codegen equals interpreted eval; null/empty/constant contract") {
    val texts = Seq("", "a", "constant", "x" * 500,
      "The quick brown fox jumps over the lazy dog. " * 20)
    val df = texts.toDF("text")
    val viaDf = Multimodal.attachFakeMedia(df, "text")
      .select(col("text"), Multimodal.blockHash64(col("media")).as("fp"))
      .as[(String, Long)].collect().toMap
    // interpreted path: nullSafeEval on the raw bytes
    texts.foreach { t =>
      val interp = graft.functions.expr.BlockHash64(
        org.apache.spark.sql.catalyst.expressions.Literal(
          t.getBytes("UTF-8"))).eval(null).asInstanceOf[Long]
      assert(viaDf(t) === interp, s"codegen/interp divergence for '$t'")
    }
    assert(viaDf("") === 0L)          // empty payload → 0
    // constant payload: all segment means equal the median → no bit set
    assert(viaDf("x" * 500) === 0L)
    // null payload → null fingerprint
    val nulls = Seq((1L, null: Array[Byte])).toDF("id", "media")
      .select(Multimodal.blockHash64(col("media")).as("fp"))
      .filter(col("fp").isNull).count()
    assert(nulls === 1L)
  }

  test("blockHash64 locality: length-preserving overwrite flips few bits; " +
    "length-changing append scrambles (the documented alignment limit)") {
    val docs = SparkEntry.T(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.attachFakeMedia(docs, "text")
      .select(col("doc_id"), col("media"))
      .filter(length(col("media")) >= 64)
    def mutOverwrite(c: org.apache.spark.sql.Column) = concat(
      c.substr(lit(1), length(c) / 3), lit(Array[Byte](0)),
      c.substr(length(c) / 3 + 2, length(c)))
    val hams = media.select(
        ops.Dedup.hamming64(Multimodal.blockHash64(col("media")),
          Multimodal.blockHash64(mutOverwrite(col("media")))).as("ho"),
        ops.Dedup.hamming64(Multimodal.blockHash64(col("media")),
          Multimodal.blockHash64(concat(col("media"),
            lit(Array[Byte](7, 7))))).as("ha"))
      .agg(max(col("ho")), avg(col("ha"))).head
    // one overwritten byte perturbs ONE segment mean directly, but can
    // also MOVE the median, flipping every mean sitting between old and
    // new median (measured max 6 on this corpus — tight ASCII means).
    // The operative bound is the radius-8 banding gate planted copies
    // must stay inside.
    assert(hams.getInt(0) <= 8,
      s"overwrite flipped ${hams.getInt(0)} bits — outside the radius-8 " +
        "gate, locality broken")
    // append shifts every segment boundary: byte-aligned means scramble.
    // This is the signature's documented edit-class boundary, pinned so
    // a future 'fix' that silently changes the contract fails here.
    assert(hams.getDouble(1) > 8.0,
      f"append avg hamming ${hams.getDouble(1)}%.1f — expected the " +
        "alignment limitation; if this improved, update the contract docs")
  }

  test("mediaNearDups: complete recall vs brute-force within-radius ground " +
    "truth; planted length-preserving near-copies all recovered") {
    val docs = SparkEntry.T(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.attachFakeMedia(docs, "text")
      .select(col("doc_id"), col("media"))
    val planted = media.filter(col("doc_id") < 10)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("media").substr(lit(1), length(col("media")) / 3),
          lit(Array[Byte](0)),
          col("media").substr(length(col("media")) / 3 + 2,
            length(col("media")))).as("media"))
    val corpus = media.unionByName(planted).localCheckpoint()
    val got = Multimodal.mediaNearDups(corpus, "doc_id", "media",
      maxHamming = 8)
      .select(col("id1"), col("id2"), col("hamming"))
      .as[(Long, Long, Int)].collect()
    got.foreach { case (a, b, h) =>
      assert(a < b, s"pair order ($a, $b)")
      assert(h <= 8, s"hamming $h above radius for ($a, $b)")
    }
    // banding is pigeonhole-COMPLETE: the pair set must equal the
    // brute-force within-radius set exactly (small corpus, all-pairs ok)
    val fps = corpus.select(col("doc_id"),
      Multimodal.blockHash64(col("media")).as("fp"))
      .as[(Long, Long)].collect()
    val truth = (for {
      (a, fa) <- fps; (b, fb) <- fps if a < b
      if java.lang.Long.bitCount(fa ^ fb) <= 8
    } yield (a, b)).toSet
    assert(got.map(p => (p._1, p._2)).toSet === truth,
      "banded pair set differs from brute-force ground truth")
    // every planted pair is in-radius (locality) and therefore recovered
    val gotSet = got.map(p => (p._1, p._2)).toSet
    (0L until 10L).foreach(i =>
      assert(gotSet.contains((i, i + 1000000L)), s"planted pair $i lost"))
  }

  test("cdcChunkHashes: codegen equals interpreted; append preserves all " +
    "non-final chunks; empty/null contract") {
    val texts = Seq("", "tiny", ("payload " * 64).trim,
      "The quick brown fox jumps over the lazy dog. " * 30)
    val df = texts.toDF("text")
    val viaDf = Multimodal.attachFakeMedia(df, "text")
      .select(col("text"),
        Multimodal.cdcChunkHashes(col("media"), 5).as("ch"))
      .as[(String, Seq[Long])].collect().toMap
    texts.foreach { t =>
      val interp = graft.functions.expr.GearChunkHashes(
        org.apache.spark.sql.catalyst.expressions.Literal(
          t.getBytes("UTF-8")), 5).eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
      assert(viaDf(t) === interp, s"codegen/interp divergence for '$t'")
    }
    assert(viaDf("").isEmpty)
    assert(viaDf("tiny").length === 1) // sub-chunk payload → one hash
    val nulls = Seq((1L, null: Array[Byte])).toDF("id", "media")
      .select(Multimodal.cdcChunkHashes(col("media")).as("ch"))
      .filter(col("ch").isNull).count()
    assert(nulls === 1L)
    // THE CDC property: boundaries are a pure function of content since
    // the previous boundary, so appending can only change the LAST chunk
    val base = ("The quick brown fox jumps over the lazy dog. " * 30)
      .getBytes("UTF-8")
    def chunks(b: Array[Byte]): Seq[Long] =
      graft.functions.expr.GearChunkHashes(
        org.apache.spark.sql.catalyst.expressions.Literal(b), 5)
        .eval(null)
        .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toLongArray.toSeq
    val c0 = chunks(base)
    val c1 = chunks(base ++ Array[Byte](7, 7, 7))
    assert(c0.length > 5, s"corpus too short for the invariant: ${c0.length}")
    assert(c0.dropRight(1) === c1.take(c0.length - 1),
      "append changed a non-final chunk — CDC boundary property broken")
  }

  test("mediaNearDupsCdc: planted INSERT+APPEND near-copies recovered (the " +
    "edit class blockHash64 cannot reach); jaccard verified, ordered pairs") {
    val docs = SparkEntry.T(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.attachFakeMedia(docs, "text")
      .select(col("doc_id"), col("media"))
      .filter(length(col("media")) >= 200) // enough chunks for resolution
    val planted = media.filter(col("doc_id") < 30)
      .select((col("doc_id") + 1000000L).as("doc_id"),
        concat(col("media").substr(lit(1), length(col("media")) / 2),
          lit(Array[Byte](42)),
          col("media").substr(length(col("media")) / 2 + 1,
            length(col("media"))),
          lit(Array[Byte](7, 7))).as("media"))
    val nPlanted = planted.count()
    assert(nPlanted > 0)
    val corpus = media.unionByName(planted).localCheckpoint()
    val got = Multimodal.mediaNearDupsCdc(corpus, "doc_id", "media",
      avgBits = 4, bands = 32, threshold = 0.5)
      .select(col("id1"), col("id2"), col("jaccard"))
      .as[(Long, Long, Double)].collect()
    got.foreach { case (a, b, j) =>
      assert(a < b); assert(j >= 0.5 && j <= 1.0)
    }
    val gotSet = got.map(p => (p._1, p._2)).toSet
    val wanted = media.filter(col("doc_id") < 30)
      .select(col("doc_id")).as[Long].collect()
    wanted.foreach(i =>
      assert(gotSet.contains((i, i + 1000000L)),
        s"planted insert+append pair $i lost — CDC robustness broken"))
  }

  test("dedup resolution composition: candidates → chunk-Jaccard verify → " +
    "CC transitive collapse → min-id keeper (the m_dedup_resolve pipeline)") {
    val docs = SparkEntry.T(spark, "/root/testdata/sf0.001", "documents")
    val media = Multimodal.attachFakeMedia(docs, "text")
      .select(col("doc_id"), col("media"))
    val eligible = media.filter(length(col("media")) >= 200)
      .orderBy(col("doc_id")).limit(10).localCheckpoint()
    val off = 1000000L
    def overwriteAt(den: Int) = concat(
      col("media").substr(lit(1), length(col("media")) / den),
      lit(Array[Byte](0)),
      col("media").substr(length(col("media")) / den + 2,
        length(col("media"))))
    val copyA = eligible.select((col("doc_id") + off).as("doc_id"),
      overwriteAt(3).as("media"))
    val copyB = eligible.select((col("doc_id") + 2 * off).as("doc_id"),
      overwriteAt(2).as("media"))
    val corpus = media.unionByName(copyA).unionByName(copyB)
      .localCheckpoint()
    val cand = Multimodal.mediaNearDups(corpus, "doc_id", "media",
      maxHamming = 4)
    // verify: planted pairs survive the content check, and every
    // surviving pair's jaccard is a true exact chunk-set Jaccard
    val verified = Multimodal.verifyPairsChunkJaccard(corpus, "doc_id",
      "media", cand, threshold = 0.5, avgBits = 4)
      .as[(Long, Long, Double)].collect()
    verified.foreach { case (a, b, j) =>
      assert(a < b); assert(j >= 0.5 && j <= 1.0)
    }
    val vset = verified.map(p => (p._1, p._2)).toSet
    val origs = eligible.select(col("doc_id")).as[Long].collect()
    origs.foreach { i =>
      assert(vset.contains((i, i + off)),
        s"planted overwrite pair ($i, A) lost in verify")
      assert(vset.contains((i, i + 2 * off)),
        s"planted overwrite pair ($i, B) lost in verify")
    }
    // CC: each planted trio collapses into ONE component even when
    // copyA–copyB was never a direct candidate pair (transitivity
    // through orig), and the min-id keeper is the orig (or a lower-id
    // real dup it merged with)
    val cc = ops.Dedup.connectedComponents(
      verified.toSeq.toDF("id1", "id2", "j").select(col("id1"), col("id2")),
      "id1", "id2")
      .select(col("id"), col("component")).as[(Long, Long)].collect().toMap
    origs.foreach { i =>
      val c = cc(i)
      assert(cc(i + off) === c && cc(i + 2 * off) === c,
        s"trio of $i did not collapse transitively: " +
          s"${cc(i)}, ${cc(i + off)}, ${cc(i + 2 * off)}")
      assert(c <= i, s"component label $c must be a min id <= $i")
    }
    // keeper semantics: every planted copy is dropped, keepers kept
    val dropped = cc.filter { case (id, comp) => id != comp }.keySet
    origs.foreach { i =>
      assert(dropped.contains(i + off) && dropped.contains(i + 2 * off),
        s"planted copies of $i survived the keeper")
    }
  }
}
