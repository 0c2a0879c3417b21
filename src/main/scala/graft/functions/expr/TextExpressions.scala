package graft.functions.expr

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
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

/** All pigeonhole-banding combo keys of a SimHash fingerprint in ONE native
  * expression — the structural fix for the whole-stage-codegen 64 KB method
  * overflow in the banding explode (VERDICT r10 "What's wrong #1").
  *
  * The previous column-expression form built
  * `explode(array(<C(b,c) structs of fold-packed shift/mask exprs>))`; at
  * radius-16-class configs (C(18,2)=153 combos, ~6 sub-expressions each)
  * janino's `generate_doConsume_0` exceeded the JVM's 64 KB method limit and
  * Spark silently dropped the hottest stage of the dedup family to
  * interpreted eval. This expression computes every packed key in a data
  * loop over reference-object arrays, so generated code size is CONSTANT in
  * both radius and combo count.
  *
  * Input: `array<bigint>` of fingerprint lanes (1 lane for the 64-bit form,
  * 2 for the 128-bit struct's (l0, l1)). `blocks(i) = (lane, bitOffset,
  * width)`; `combos` lists the block indices of each bucket key, in packing
  * order. Output: `array<bigint>`, element `ci` = the key of combo `ci`
  * (callers `posexplode` to recover the (block, key) pairs), packed exactly
  * as the old fold: `key = (key << width(blk)) | ((lane >> off) & mask)` —
  * Java `<<`/`>>` semantics match Spark's `shiftleft`/`shiftright` bit for
  * bit here (the mask keeps only bits below `width ≤ 64 − off`, so
  * arithmetic-shift sign-extension never reaches a kept bit; width 64 only
  * occurs as a combo's FIRST block where the accumulator is 0).
  *
  * Null handling: a null lane ARRAY — or ANY null lane element a block
  * references — yields a null result (no banding rows after the explode —
  * the same pair set as the old column form, whose null fingerprints
  * produced null keys that never equi-join). Without the element rule a
  * null lane would read as 0 and silently band every null-lane doc into
  * the same buckets — wrong for any caller that has not pre-filtered
  * null fingerprints (graft's own call sites do, but the expression is
  * public via Dedup.simHashBandsNative).
  */
case class SimHashBands(child: Expression, blocks: Seq[(Int, Int, Int)],
                        combos: Seq[Seq[Int]])
    extends UnaryExpression {

  require(combos.nonEmpty && blocks.nonEmpty, "empty banding spec")
  require(combos.forall(_.forall(b => b >= 0 && b < blocks.length)),
    "combo references a block index out of range")

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sim_hash_bands needs array<bigint> of lanes, got ${dt.catalogString}")
    }

  // Flattened per-step banding spec: step s belongs to the combo whose
  // [comboStart(ci), comboStart(ci+1)) range contains it. Kept as plain
  // arrays so both eval and the generated code loop over data, not over
  // unrolled expressions.
  @transient private lazy val comboStart: Array[Int] =
    combos.map(_.length).scanLeft(0)(_ + _).toArray
  @transient private lazy val stepLane: Array[Int] =
    combos.flatten.map(blocks(_)._1).toArray
  @transient private lazy val stepOff: Array[Int] =
    combos.flatten.map(blocks(_)._2).toArray
  @transient private lazy val stepWidth: Array[Int] =
    combos.flatten.map(blocks(_)._3).toArray
  @transient private lazy val stepMask: Array[Long] =
    combos.flatten.map { b =>
      val w = blocks(b)._3
      if (w == 64) -1L else (1L << w) - 1L
    }.toArray

  override def nullSafeEval(v: Any): Any = {
    val lanes = v.asInstanceOf[ArrayData]
    val nSteps = stepLane.length
    var s0 = 0
    while (s0 < nSteps) { // any referenced null lane → null result
      if (lanes.isNullAt(stepLane(s0))) return null
      s0 += 1
    }
    val nc = combos.length
    val out = new Array[Long](nc)
    var ci = 0
    while (ci < nc) {
      var key = 0L
      var s = comboStart(ci)
      val end = comboStart(ci + 1)
      while (s < end) {
        val lane = lanes.getLong(stepLane(s))
        key = (key << stepWidth(s)) | ((lane >> stepOff(s)) & stepMask(s))
        s += 1
      }
      out(ci) = key
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val startRef = ctx.addReferenceObj("shbStart", comboStart, "int[]")
    val laneRef = ctx.addReferenceObj("shbLane", stepLane, "int[]")
    val offRef = ctx.addReferenceObj("shbOff", stepOff, "int[]")
    val widthRef = ctx.addReferenceObj("shbWidth", stepWidth, "int[]")
    val maskRef = ctx.addReferenceObj("shbMask", stepMask, "long[]")
    nullSafeCodeGen(ctx, ev, lanes => {
      val ci = ctx.freshName("ci")
      val s = ctx.freshName("s")
      val key = ctx.freshName("key")
      val lane = ctx.freshName("lane")
      val out = ctx.freshName("out")
      // janino misparses `x << ((int[]) references[k])[i]` (the cast-then-
      // index inside a shift reads as a type token), so the reference
      // arrays are hoisted into plain locals first.
      val st = ctx.freshName("st")
      val ln = ctx.freshName("ln")
      val of = ctx.freshName("of")
      val wd = ctx.freshName("wd")
      val mk = ctx.freshName("mk")
      val nc = combos.length
      val nSteps = stepLane.length
      val anyNull = ctx.freshName("anyNull")
      s"""
         |int[] $st = $startRef;
         |int[] $ln = $laneRef;
         |int[] $of = $offRef;
         |int[] $wd = $widthRef;
         |long[] $mk = $maskRef;
         |boolean $anyNull = false;
         |for (int $s = 0; $s < $nSteps; $s++) {
         |  if ($lanes.isNullAt($ln[$s])) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long[] $out = new long[$nc];
         |  for (int $ci = 0; $ci < $nc; $ci++) {
         |    long $key = 0L;
         |    for (int $s = $st[$ci]; $s < $st[$ci + 1]; $s++) {
         |      long $lane = $lanes.getLong($ln[$s]);
         |      $key = ($key << $wd[$s]) | (($lane >> $of[$s]) & $mk[$s]);
         |    }
         |    $out[$ci] = $key;
         |  }
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): SimHashBands = copy(child = newChild)
}

/** OR of the `c` LOWEST-indexed agreeing-block bits between two banded
  * fingerprints (r20 — the first-witness dedup kernel for uncapped
  * combination banding): block b agrees when both fingerprints carry the
  * same `(lane >> off) & mask` value; the result is the bitmask of the c
  * smallest agreeing block indices, i.e. the block set of the
  * LEXICOGRAPHICALLY FIRST agreeing c-combo. Constant generated-code
  * size at any radius (a data loop over the block spec, the
  * [[SimHashBands]] device — an unrolled expression form overflowed
  * janino's 64 KB method limit at C(18,3) = 816 combos inside the
  * shuffled-hash-join consume). Null lanes → null. Inputs: two
  * array<bigint> lane arrays. */
case class AgreeLowestMask(left: Expression, right: Expression,
                           blocks: Seq[(Int, Int, Int)], c: Int)
    extends BinaryExpression {

  require(blocks.nonEmpty && c >= 1 && c <= blocks.length,
    s"AgreeLowestMask: c=$c over ${blocks.length} blocks")

  override def nullable: Boolean = true
  override def dataType: DataType = LongType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"agree_lowest_mask needs two array<bigint> lane arrays, got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  @transient private lazy val blkLane: Array[Int] = blocks.map(_._1).toArray
  @transient private lazy val blkOff: Array[Int] = blocks.map(_._2).toArray
  @transient private lazy val blkMask: Array[Long] = blocks.map { b =>
    if (b._3 == 64) -1L else (1L << b._3) - 1L
  }.toArray

  override def nullSafeEval(lv: Any, rv: Any): Any = {
    val a = lv.asInstanceOf[ArrayData]
    val b = rv.asInstanceOf[ArrayData]
    val n = blkLane.length
    var i = 0
    while (i < n) {
      if (a.isNullAt(blkLane(i)) || b.isNullAt(blkLane(i))) return null
      i += 1
    }
    var agree = 0L
    i = 0
    while (i < n) {
      val off = blkOff(i); val m = blkMask(i); val ln = blkLane(i)
      if (((a.getLong(ln) >> off) & m) == ((b.getLong(ln) >> off) & m))
        agree |= 1L << i
      i += 1
    }
    var ideal = 0L
    var k = 0
    while (k < c && agree != 0L) {
      val low = agree & -agree
      ideal |= low
      agree ^= low
      k += 1
    }
    java.lang.Long.valueOf(ideal)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val laneRef = ctx.addReferenceObj("almLane", blkLane, "int[]")
    val offRef = ctx.addReferenceObj("almOff", blkOff, "int[]")
    val maskRef = ctx.addReferenceObj("almMask", blkMask, "long[]")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val ln = ctx.freshName("ln")
      val of = ctx.freshName("of")
      val mk = ctx.freshName("mk")
      val i = ctx.freshName("i")
      val k = ctx.freshName("k")
      val agree = ctx.freshName("agree")
      val ideal = ctx.freshName("ideal")
      val low = ctx.freshName("low")
      val anyNull = ctx.freshName("anyNull")
      val n = blkLane.length
      s"""
         |int[] $ln = $laneRef;
         |int[] $of = $offRef;
         |long[] $mk = $maskRef;
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.isNullAt($ln[$i]) || $b.isNullAt($ln[$i])) {
         |    $anyNull = true; break;
         |  }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $agree = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ((($a.getLong($ln[$i]) >> $of[$i]) & $mk[$i]) ==
         |        (($b.getLong($ln[$i]) >> $of[$i]) & $mk[$i])) {
         |      $agree |= 1L << $i;
         |    }
         |  }
         |  long $ideal = 0L;
         |  for (int $k = 0; $k < $c && $agree != 0L; $k++) {
         |    long $low = $agree & -$agree;
         |    $ideal |= $low;
         |    $agree ^= $low;
         |  }
         |  ${ev.value} = $ideal;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AgreeLowestMask =
    copy(left = newLeft, right = newRight)
}
