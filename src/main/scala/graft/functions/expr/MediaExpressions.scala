package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._

/** Perceptual 64-bit block hash over an opaque `binary` payload — the
  * byte-domain analogue of image blockhash (Yang et al.'s blockhash
  * method / pHash's aHash family): the payload is split into 64 equal
  * byte segments, each segment's MEAN byte value is compared to the
  * MEDIAN of the 64 means, and bit i is set iff mean_i > median. The
  * property that makes it a perceptual (not cryptographic) hash:
  * a LOCAL edit perturbs one segment's mean, flipping at most the bits
  * whose means sit at the median — so near-copies (small overwrites,
  * short appends, metadata patches) land within small Hamming distance
  * and the SimHash banding machinery ([[SimHashBands]] pigeonhole
  * buckets) finds them without any pairwise scan. A real image pHash
  * (DCT of decoded pixels) would replace the byte-segment means with
  * DCT coefficients of the decoded frame — the decode step is the
  * environment-stubbed part (see graft.multimodal.Multimodal); the
  * signature/banding/verify plumbing is identical.
  *
  * Contract: null payload → null; EMPTY payload → 0L (all-empty
  * segments, all means equal to the median ⇒ no bit set — empty
  * payloads therefore pair with each other and with constant payloads,
  * the exact-dup semantics for contentless blobs). Deterministic, one
  * pass over the bytes plus a 64-element sort; same single-traversal
  * kernel shape as [[SimHash64]]. Interpreted and codegen paths are
  * asserted equal in MultimodalSpec.
  */
case class BlockHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"block_hash64 needs binary, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val n = b.length
    val means = new Array[Double](64)
    var i = 0
    while (i < 64) {
      val lo = ((i.toLong * n) / 64).toInt
      val hi = (((i + 1).toLong * n) / 64).toInt
      var s = 0.0
      var j = lo
      while (j < hi) { s += (b(j) & 0xFF); j += 1 }
      means(i) = if (hi > lo) s / (hi - lo) else 0.0
      i += 1
    }
    val srt = java.util.Arrays.copyOf(means, 64)
    java.util.Arrays.sort(srt)
    val med = (srt(31) + srt(32)) / 2.0
    var fp = 0L
    i = 0
    while (i < 64) { if (means(i) > med) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val lo = ctx.freshName("lo")
      val hi = ctx.freshName("hi")
      val s = ctx.freshName("s")
      val means = ctx.freshName("means")
      val srt = ctx.freshName("srt")
      val med = ctx.freshName("med")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $b.length;
         |double[] $means = new double[64];
         |for (int $i = 0; $i < 64; $i++) {
         |  int $lo = (int) (((long) $i * $n) / 64);
         |  int $hi = (int) (((long) ($i + 1) * $n) / 64);
         |  double $s = 0.0;
         |  for (int $j = $lo; $j < $hi; $j++) $s += ($b[$j] & 0xFF);
         |  $means[$i] = $hi > $lo ? $s / ($hi - $lo) : 0.0;
         |}
         |double[] $srt = java.util.Arrays.copyOf($means, 64);
         |java.util.Arrays.sort($srt);
         |double $med = ($srt[31] + $srt[32]) / 2.0;
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($means[$i] > $med) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): BlockHash64 = copy(child = newChild)
}

object GearChunkHashes {
  /** Fixed 256-entry gear table (Gear hash / FastCDC family), derived
    * deterministically via splitmix64 so the chunking is identical on
    * every JVM — no RNG, no seed plumbing. */
  private[graft] val Gear: Array[Long] = Array.tabulate(256) { i =>
    var z = i.toLong + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
}

/** Content-defined chunking (LBFS/Rabin family) of an opaque binary
  * payload into per-chunk FNV-1a 64 hashes — the INSERT-ROBUST media
  * signature [[BlockHash64]] cannot be (its fixed byte segments shift
  * with any length change). Boundaries come from a TRUE
  * fixed-window polynomial rolling hash: h = Σ_{k<W} B^k·gear(b[i−k])
  * mod 2^64 (incoming byte multiplied in, the aged byte's B^W·gear
  * term subtracted out), window W = 2^(avgBits−1) bytes, boundary
  * when the HIGH avgBits bits are zero (expected chunk ≈ 2^avgBits
  * bytes). Because h is a pure function of the last W CONTENT bytes —
  * never reset at boundaries — an insert/delete corrupts boundaries
  * only within W bytes of the edit and the chunk stream
  * RESYNCHRONIZES immediately after (the LBFS property). The
  * corruption radius SCALES WITH the chunk size, which matters at
  * small payloads: the first cut of this kernel used `(h << 1) +
  * gear` judged on high bits — a fixed ~64-byte window that wrecked
  * every chunk of a 215-byte payload after one mid-insert (measured
  * Jaccard 0.0); and judging LOW bits instead would shrink the window
  * to avgBits bytes — degenerate on periodic content (measured: a
  * 46-byte-period text produced ONE chunk in 1350 bytes). `minLen =
  * 2^(avgBits−2)` suppresses confetti; a FORCED cut at `maxLen =
  * 2^(avgBits+2)` bounds chunks on boundary-starved content (forced
  * cuts are not content-aligned — exactly-periodic payloads trade
  * back some insert-robustness; documented, inherent to CDC). Jaccard
  * over the chunk-hash sets then survives the length-changing edit
  * class, and the output feeds the MinHash-LSH banding machinery
  * unchanged. Null payload → null; empty → empty array; payloads
  * shorter than a chunk → one whole-content hash (CDC degenerates to
  * exact-dup for tiny blobs). Interp/codegen parity + the
  * append-prefix invariant are pinned in MultimodalSpec. */
case class GearChunkHashes(child: Expression, avgBits: Int)
    extends UnaryExpression {
  // upper bound 20: maxLen = 2^(avgBits+2) must stay in Int (29/30 would
  // overflow to a negative/1 threshold and force a cut on EVERY byte),
  // and polyBW's window loop is 2^(avgBits-1) iterations — 2^19 at the
  // bound, driver-trivial; media chunks past 1 MB have no use here anyway
  require(avgBits >= 2 && avgBits <= 20,
    s"gear_chunk_hashes: avgBits=$avgBits outside [2, 20]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"gear_chunk_hashes needs binary, got ${dt.catalogString}")
    }

  private def shift: Int = 64 - avgBits
  private def minLen: Int = math.max(1, 1 << (avgBits - 2))
  private def maxLen: Int = 1 << (avgBits + 2)
  private def window: Int = math.max(4, 1 << (avgBits - 1))
  private val PolyB: Long = 0x100000001B3L
  /** B^window mod 2^64 — the aged byte's removal coefficient. */
  private lazy val polyBW: Long = {
    var r = 1L; var i = 0
    while (i < window) { r *= PolyB; i += 1 }
    r
  }

  override def nullSafeEval(v: Any): Any = {
    val b = v.asInstanceOf[Array[Byte]]
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    val bw = polyBW
    var h = 0L
    var fnv = 0xCBF29CE484222325L
    var chunkLen = 0
    var i = 0
    while (i < b.length) {
      val x = b(i) & 0xFF
      h = h * PolyB + GearChunkHashes.Gear(x)
      if (i >= window) h -= bw * GearChunkHashes.Gear(b(i - window) & 0xFF)
      fnv = (fnv ^ x) * 0x100000001B3L
      chunkLen += 1
      if ((chunkLen >= minLen && (h >>> shift) == 0L) ||
          chunkLen >= maxLen) {
        out += fnv
        fnv = 0xCBF29CE484222325L
        chunkLen = 0
      }
      i += 1
    }
    if (chunkLen > 0) out += fnv
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, b => {
      val gear = ctx.addReferenceObj("gear", GearChunkHashes.Gear,
        "long[]")
      val out = ctx.freshName("out")
      val h = ctx.freshName("h")
      val fnv = ctx.freshName("fnv")
      val clen = ctx.freshName("clen")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      s"""
         |java.util.ArrayList<Long> $out = new java.util.ArrayList<Long>();
         |long $h = 0L;
         |long $fnv = 0xCBF29CE484222325L;
         |int $clen = 0;
         |for (int $i = 0; $i < $b.length; $i++) {
         |  int $x = $b[$i] & 0xFF;
         |  $h = $h * ${PolyB}L + $gear[$x];
         |  if ($i >= $window) {
         |    $h -= ${polyBW}L * $gear[$b[$i - $window] & 0xFF];
         |  }
         |  $fnv = ($fnv ^ $x) * 0x100000001B3L;
         |  $clen++;
         |  if (($clen >= $minLen && (($h >>> $shift) == 0L)) ||
         |      $clen >= $maxLen) {
         |    $out.add($fnv);
         |    $fnv = 0xCBF29CE484222325L;
         |    $clen = 0;
         |  }
         |}
         |if ($clen > 0) $out.add($fnv);
         |long[] arr_${ev.value} = new long[$out.size()];
         |for (int $i = 0; $i < $out.size(); $i++) {
         |  arr_${ev.value}[$i] = ((Long) $out.get($i)).longValue();
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions
         |  .UnsafeArrayData.fromPrimitiveArray(arr_${ev.value});
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): GearChunkHashes = copy(child = newChild)
}
