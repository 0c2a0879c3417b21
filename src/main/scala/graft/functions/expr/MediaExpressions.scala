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
