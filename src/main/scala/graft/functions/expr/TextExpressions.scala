package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** SimHash 64-bit fingerprint over an `array<bigint>` of token hashes as a
  * single native codegen'd pass (SURVEY §2.12 U4 escalation; companion to
  * [[VectorDot]]).
  *
  * The HOF form (`Dedup.simHash64FromHashes`) is 64 interpreted `aggregate`
  * folds per row — one full array traversal per output bit — and was the
  * bench suite's slowest kernel. This expression makes ONE traversal,
  * counting all 64 bit lanes in a local int[64], then packs the fingerprint.
  *
  * Bit-for-bit equal to the HOF form, including its null-element behavior
  * (a null token hash contributes −1 to every bit lane, because the HOF's
  * `when(... === 1L, 1L).otherwise(-1L)` sends the null comparison to the
  * otherwise branch). Equivalence is asserted in DedupTextSpec.
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sim_hash64 needs array<bigint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val counts = new Array[Int](64)
    var j = 0
    while (j < n) {
      if (a.isNullAt(j)) {
        var i = 0
        while (i < 64) { counts(i) -= 1; i += 1 }
      } else {
        val h = a.getLong(j)
        var i = 0
        while (i < 64) {
          counts(i) += (((h >>> i) & 1L).toInt * 2) - 1
          i += 1
        }
      }
      j += 1
    }
    var fp = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) fp |= (1L << i); i += 1 }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val fp = ctx.freshName("fp")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $n; $j++) {
         |  if ($a.isNullAt($j)) {
         |    for (int $i = 0; $i < 64; $i++) $counts[$i]--;
         |  } else {
         |    long $h = $a.getLong($j);
         |    for (int $i = 0; $i < 64; $i++) {
         |      $counts[$i] += ((int) (($h >>> $i) & 1L)) * 2 - 1;
         |    }
         |  }
         |}
         |long $fp = 0L;
         |for (int $i = 0; $i < 64; $i++) {
         |  if ($counts[$i] > 0) $fp |= (1L << $i);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** MinHash signature over an `array<bigint>` of (pre-reduced, < p) shingle
  * hashes as a single native codegen'd pass — companion to [[SimHash64]],
  * same escalation rationale: the HOF form
  * (`Dedup.minHashSignatureFromHashes`) is `numHashes` interpreted
  * `array_min(transform(...))` folds, one full array traversal per
  * permutation. This expression traverses ONCE, maintaining all lane
  * minimums in a local long[].
  *
  * Math is exactly the HOF's: lane j = min over hashes h of
  * `(a_j*h + b_j) mod p`, p = 2^31−1. The kernel computes Java `%` and
  * adds p when the remainder is negative — identical to Spark's `pmod` on
  * the same (64-bit-wrapped) product for ALL inputs, so callers of the SQL
  * surface `min_hash_signature` who pass raw `xxhash64` values (not
  * pre-reduced mod p, as `Dedup.shingleHashes` does) still get the
  * documented pmod math rather than silently-negative lanes.
  * Null-element and empty-array semantics mirror
  * `array_min`+`transform`: null hashes are skipped; if no non-null hash
  * exists every lane is null (null input array → null result).
  * Bit-for-bit equivalence is asserted in DedupTextSpec.
  *
  * `as`/`bs` are the affine parameters (derived from a seed by the caller;
  * kept as explicit data so equality/serialization of the expression tree
  * stay structural).
  */
case class MinHashSignature(child: Expression, as: Seq[Long], bs: Seq[Long])
    extends UnaryExpression {

  require(as.nonEmpty && as.length == bs.length,
    s"minhash params mismatch: ${as.length} vs ${bs.length}")

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"min_hash_signature needs array<bigint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val k = as.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var nonNull = 0
    var j = 0
    while (j < n) {
      if (!arr.isNullAt(j)) {
        nonNull += 1
        val h = arr.getLong(j)
        var i = 0
        while (i < k) {
          var m = (aArr(i) * h + bArr(i)) % P
          if (m < 0) m += P // Java % → pmod (raw-xxhash64 inputs go negative)
          if (m < mins(i)) mins(i) = m
          i += 1
        }
      }
      j += 1
    }
    if (nonNull == 0)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        new Array[Any](k))
    else
      new org.apache.spark.sql.catalyst.util.GenericArrayData(mins)
  }

  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("mhAs", aArr, "long[]")
    val bRef = ctx.addReferenceObj("mhBs", bArr, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val m = ctx.freshName("m")
      val k = ctx.freshName("k")
      val mins = ctx.freshName("mins")
      val nonNull = ctx.freshName("nonNull")
      val out = ctx.freshName("out")
      s"""
         |int $n = $arr.numElements();
         |int $k = $aRef.length;
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $nonNull = 0;
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$arr.isNullAt($j)) {
         |    $nonNull++;
         |    long $h = $arr.getLong($j);
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $m = ($aRef[$i] * $h + $bRef[$i]) % ${P}L;
         |      if ($m < 0) $m += ${P}L;
         |      if ($m < $mins[$i]) $mins[$i] = $m;
         |    }
         |  }
         |}
         |Object[] $out = null;
         |if ($nonNull == 0) {
         |  $out = new Object[$k];
         |} else {
         |  $out = new Object[$k];
         |  for (int $i = 0; $i < $k; $i++) $out[$i] = $mins[$i];
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MinHashSignature = copy(child = newChild)
}
