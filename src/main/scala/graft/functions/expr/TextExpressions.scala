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
