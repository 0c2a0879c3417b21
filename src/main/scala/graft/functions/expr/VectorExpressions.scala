package graft.functions.expr

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd vector kernels (SURVEY §2.12 U4, §4.2 "custom
  * Expressions — the one place a custom expression genuinely pays").
  *
  * The higher-order-function forms (`aggregate(zip_with(...))`) are correct
  * but interpret a lambda per element and fall out of whole-stage codegen;
  * these expressions compile to a tight primitive loop over the unsafe array
  * data instead — the hot kernel of every n²-pair similarity stage.
  *
  * Accumulation is Double in array order, matching the HOF fold
  * bit-for-bit, so swapping implementations cannot change oracle results.
  */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  private def elemType(e: Expression): DataType =
    e.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(dt: DataType) = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"vector_dot needs array<float|double>, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    (elemType(left), elemType(right)) match {
      case (FloatType, FloatType) =>
        while (i < n) {
          acc += a.getFloat(i).toDouble * b.getFloat(i).toDouble; i += 1
        }
      case (DoubleType, DoubleType) =>
        while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
      case (FloatType, DoubleType) =>
        while (i < n) { acc += a.getFloat(i).toDouble * b.getDouble(i); i += 1 }
      case (DoubleType, FloatType) =>
        while (i < n) { acc += a.getDouble(i) * b.getFloat(i).toDouble; i += 1 }
      case _ => throw new IllegalStateException("unreachable")
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    def getter(e: Expression, arr: String, i: String): String =
      elemType(e) match {
        case FloatType => s"(double) $arr.getFloat($i)"
        case _ => s"$arr.getDouble($i)"
      }
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(left, a, i)} * ${getter(right, b, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** Squared L2 norm as a native loop (companion kernel to [[VectorDot]]). */
case class VectorNormSq(child: Expression) extends UnaryExpression {

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vector_norm_sq needs array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    var acc = 0.0
    var i = 0
    elemType match {
      case FloatType =>
        while (i < n) {
          val x = a.getFloat(i).toDouble; acc += x * x; i += 1
        }
      case _ =>
        while (i < n) { val x = a.getDouble(i); acc += x * x; i += 1 }
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val x = ctx.freshName("x")
      s"""
         |int $n = $a.numElements();
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = ${get(a, i)};
         |  $acc += $x * $x;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorNormSq =
    copy(child = newChild)
}

/** Shared selection kernel for the nearest-centroid expressions: the
  * engine ordering is (l2 distance ASC, centroid id ASC) with NaN
  * distances LAST — exactly the `orderBy(__d, centroid_id)` contract of
  * the old window-argmin form (Spark sorts NaN greatest-last ascending),
  * including the sqrt: distances are compared as `Math.sqrt(Σ(x−c)²)`
  * with the same left-to-right double fold as `Vectors.l2Distance`, so
  * swapping implementations cannot reorder a tie. */
object NearestKernel {
  def isBetter(d: Double, id: Long, bd: Double, bid: Long): Boolean =
    d < bd || (d == bd && id < bid) ||
      (java.lang.Double.isNaN(bd) && !java.lang.Double.isNaN(d))

  /** Insert candidate (d, id) into the running top-`probe` selection
    * (bd/bi sorted best-first, `kept` valid entries). Returns new kept. */
  def insert(d: Double, id: Long, bd: Array[Double], bi: Array[Long],
             kept: Int, probe: Int): Int = {
    if (kept < probe || isBetter(d, id, bd(kept - 1), bi(kept - 1))) {
      var pos = if (kept < probe) kept else probe - 1
      while (pos > 0 && isBetter(d, id, bd(pos - 1), bi(pos - 1))) {
        bd(pos) = bd(pos - 1); bi(pos) = bi(pos - 1); pos -= 1
      }
      bd(pos) = d; bi(pos) = id
      if (kept < probe) kept + 1 else kept
    } else kept
  }

  /** Driver-side nearest-centroid id (used for the two-level fine→coarse
    * cell map — nlist·√nlist·d flops, trivially driver-sized). Same
    * ordering contract as the expressions. */
  def nearestId(vec: Array[Double], ids: Array[Long],
                vecs: Array[Array[Double]]): Long = {
    var bestD = Double.NaN
    var bestId = Long.MinValue
    var first = true
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val m = math.min(vec.length, cv.length)
      var s = 0.0
      var j = 0
      while (j < m) { val t = vec(j) - cv(j); s += t * t; j += 1 }
      val d = math.sqrt(s)
      if (first || isBetter(d, ids(c), bestD, bestId)) {
        bestD = d; bestId = ids(c); first = false
      }
      c += 1
    }
    bestId
  }
}

/** The `probe` nearest centroids of a vector against a driver-collected
  * centroid table, as ONE native expression — the structural replacement
  * for the `crossJoin(broadcast(centroids))` + window-argmin assignment,
  * whose n·nlist intermediate rows (each carrying the full embedding
  * array) had to be materialized and sorted map-side: at a 1 M × 1000
  * geometry that is ~10⁹ array-bearing rows through a WindowGroupLimit
  * sort — the measured wall in `c5_serving_ivf`'s first build. Here the
  * centroid table rides along as a reference object (nlist·d doubles —
  * broadcast-sized by the same argument that justified broadcasting it
  * before) and assignment is a pure projection: no join, no shuffle, no
  * intermediate rows, Θ(nlist·d) fused flops per row inside whole-stage
  * codegen.
  *
  * Output: array<bigint> of the `min(probe, nlist)` nearest centroid
  * ids, best first, ordered by (l2 distance, id) with NaN last
  * ([[NearestKernel]] — bit-compatible with the old window form's
  * `orderBy(sqrt-dist, id)` including tie behavior). Null vector — or
  * any null lane element — yields null (the old form ranked null-lane
  * rows arbitrarily; callers must pre-filter, as every graft call site
  * does). */
case class NearestCentroids(child: Expression, ids: Array[Long],
                            vecs: Array[Array[Double]], probe: Int)
    extends UnaryExpression {

  require(probe >= 1, s"nearest_centroids: probe=$probe")
  require(ids.length == vecs.length && ids.nonEmpty,
    s"nearest_centroids: ${ids.length} ids vs ${vecs.length} vectors")

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"nearest_centroids needs array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val x = new Array[Double](n)
    elemType match {
      case FloatType =>
        var i = 0; while (i < n) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      case _ =>
        var i = 0; while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    }
    val p = math.min(probe, ids.length)
    val bd = new Array[Double](p)
    val bi = new Array[Long](p)
    var kept = 0
    var c = 0
    while (c < ids.length) {
      val cv = vecs(c)
      val m = math.min(n, cv.length)
      var s = 0.0
      var i = 0
      while (i < m) { val t = x(i) - cv(i); s += t * t; i += 1 }
      kept = NearestKernel.insert(math.sqrt(s), ids(c), bd, bi, kept, p)
      c += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, kept))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val idsRef = ctx.addReferenceObj("ncIds", ids, "long[]")
    val vecsRef = ctx.addReferenceObj("ncVecs", vecs, "double[][]")
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      val kept = ctx.freshName("kept")
      val pos = ctx.freshName("pos")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val idsL = ctx.freshName("idsL")
      val vecsL = ctx.freshName("vecsL")
      val anyNull = ctx.freshName("anyNull")
      val p = ctx.freshName("p")
      s"""
         |long[] $idsL = $idsRef;
         |double[][] $vecsL = $vecsRef;
         |int $n = $arr.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $p = java.lang.Math.min($probe, $idsL.length);
         |  double[] $bd = new double[$p];
         |  long[] $bi = new long[$p];
         |  int $kept = 0;
         |  for (int $c = 0; $c < $idsL.length; $c++) {
         |    double[] $cv = $vecsL[$c];
         |    int $m = java.lang.Math.min($n, $cv.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $m; $i++) {
         |      double $t = ${get(arr, i)} - $cv[$i];
         |      $s += $t * $t;
         |    }
         |    double $d = java.lang.Math.sqrt($s);
         |    long $cid = $idsL[$c];
         |    if ($kept < $p ||
         |        graft.functions.expr.NearestKernel.isBetter(
         |          $d, $cid, $bd[$kept - 1], $bi[$kept - 1])) {
         |      int $pos = $kept < $p ? $kept : $p - 1;
         |      while ($pos > 0 &&
         |          graft.functions.expr.NearestKernel.isBetter(
         |            $d, $cid, $bd[$pos - 1], $bi[$pos - 1])) {
         |        $bd[$pos] = $bd[$pos - 1]; $bi[$pos] = $bi[$pos - 1]; $pos--;
         |      }
         |      $bd[$pos] = $d; $bi[$pos] = $cid;
         |      if ($kept < $p) $kept++;
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
         |    .toArrayData(java.util.Arrays.copyOf($bi, $kept));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): NearestCentroids = copy(child = newChild)
}

/** Maximum dot product of a vector against a driver-collected vector set,
  * as ONE native expression — the hot kernel of the exact semantic-
  * decontamination pass ([[graft.ops.Similarity.semanticDecontaminate]]),
  * where every corpus row scores against the whole (benchmark-sized,
  * broadcast-justified by the [[NearestCentroids]] argument) test set.
  * The HOF form (`array_max(transform(tvs, tv -> dot))`) interprets a
  * lambda per test vector and falls out of whole-stage codegen — measured
  * 11.5 s for 200 K × 50 at sf10 vs a native fused loop; this is the same
  * rewrite [[NearestCentroids]] applied to assignment.
  *
  * Contract: per-pair dot accumulates Double left-to-right (bit-equal to
  * [[VectorDot]], hence to the HOF form); the max is NaN-greatest (Spark
  * `array_max` ordering) so swapping implementations cannot change a
  * result even on degenerate inputs; `round` being monotone, callers may
  * round after the max and get exactly `array_max` of rounded per-pair
  * values. Null vector — or any null lane element — yields null, the
  * [[NearestCentroids]] rule. */
case class MaxVectorDot(child: Expression, vecs: Array[Array[Double]])
    extends UnaryExpression {

  require(vecs.nonEmpty, "max_vector_dot: empty vector set")

  private def elemType: DataType =
    child.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"max_vector_dot needs array<float|double>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val x = new Array[Double](n)
    elemType match {
      case FloatType =>
        var i = 0; while (i < n) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      case _ =>
        var i = 0; while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    }
    var best = Double.NegativeInfinity
    var c = 0
    while (c < vecs.length) {
      val tv = vecs(c)
      val m = math.min(n, tv.length)
      var s = 0.0
      var i = 0
      while (i < m) { s += x(i) * tv(i); i += 1 }
      if (java.lang.Double.isNaN(s) || s > best) best = s
      c += 1
    }
    best
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("mvdVecs", vecs, "double[][]")
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, arr => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val s = ctx.freshName("s")
      val m = ctx.freshName("m")
      val tv = ctx.freshName("tv")
      val best = ctx.freshName("best")
      val vecsL = ctx.freshName("vecsL")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |double[][] $vecsL = $vecsRef;
         |int $n = $arr.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $best = java.lang.Double.NEGATIVE_INFINITY;
         |  for (int $c = 0; $c < $vecsL.length; $c++) {
         |    double[] $tv = $vecsL[$c];
         |    int $m = java.lang.Math.min($n, $tv.length);
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $m; $i++) {
         |      $s += ${get(arr, i)} * $tv[$i];
         |    }
         |    if (java.lang.Double.isNaN($s) || $s > $best) $best = $s;
         |  }
         |  ${ev.value} = $best;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): MaxVectorDot = copy(child = newChild)
}

/** Two-level fine stage as a native expression: `cells` (the coarse-probe
  * output of [[NearestCentroids]]) selects centroid GROUPS from a
  * driver-built cell→fine map, and the top-`probe` selection runs over
  * the union of those groups' centroids — same ordering contract as
  * [[NearestCentroids]]. Replaces the rowCells ⋈ fineByCell join + window
  * (n·coarseProbe·(nlist/√nlist) materialized array-bearing rows) with a
  * pure projection. Null vector, null lane, or null cells → null. */
case class NearestCentroidsInCells(vec: Expression, cells: Expression,
                                   cellKeys: Array[Long],
                                   groupIds: Array[Array[Long]],
                                   groupVecs: Array[Array[Array[Double]]],
                                   probe: Int)
    extends BinaryExpression {

  require(probe >= 1, s"nearest_in_cells: probe=$probe")
  require(cellKeys.length == groupIds.length &&
    cellKeys.length == groupVecs.length && cellKeys.nonEmpty,
    "nearest_in_cells: cell map arity mismatch")

  override def left: Expression = vec
  override def right: Expression = cells

  @transient private lazy val cellIndex: java.util.HashMap[java.lang.Long, Integer] = {
    val m = new java.util.HashMap[java.lang.Long, Integer]()
    var i = 0
    while (i < cellKeys.length) { m.put(cellKeys(i), i); i += 1 }
    m
  }

  private def elemType: DataType =
    vec.dataType.asInstanceOf[ArrayType].elementType

  override def nullable: Boolean = true

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (vec.dataType, cells.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (v, c) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          "nearest_in_cells needs (array<float|double>, array<bigint>), " +
            s"got ${v.catalogString} / ${c.catalogString}")
    }

  override def nullSafeEval(v: Any, cl: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val cellsArr = cl.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var j = 0
    while (j < n) { if (arr.isNullAt(j)) return null; j += 1 }
    val x = new Array[Double](n)
    elemType match {
      case FloatType =>
        var i = 0; while (i < n) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      case _ =>
        var i = 0; while (i < n) { x(i) = arr.getDouble(i); i += 1 }
    }
    val bd = new Array[Double](probe)
    val bi = new Array[Long](probe)
    var kept = 0
    var ci = 0
    val nc = cellsArr.numElements()
    while (ci < nc) {
      if (!cellsArr.isNullAt(ci)) {
        val gi = cellIndex.get(cellsArr.getLong(ci))
        if (gi != null) {
          val gIds = groupIds(gi)
          val gVecs = groupVecs(gi)
          var c = 0
          while (c < gIds.length) {
            val cv = gVecs(c)
            val m = math.min(n, cv.length)
            var s = 0.0
            var i = 0
            while (i < m) { val t = x(i) - cv(i); s += t * t; i += 1 }
            kept = NearestKernel.insert(math.sqrt(s), gIds(c), bd, bi,
              kept, probe)
            c += 1
          }
        }
      }
      ci += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      java.util.Arrays.copyOf(bi, kept))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    // RAW HashMap, not HashMap<Long, Integer>: janino has no generics,
    // so a parameterized local would make get() return Object and fail
    // "assignment conversion not possible" — caught by the VectorSpec
    // codegen.fallback=false pin (the default config was silently
    // dropping this expression to interpreted eval).
    val idxRef = ctx.addReferenceObj("nicIdx", cellIndex,
      "java.util.HashMap")
    val gIdsRef = ctx.addReferenceObj("nicIds", groupIds, "long[][]")
    val gVecsRef = ctx.addReferenceObj("nicVecs", groupVecs, "double[][][]")
    val get = elemType match {
      case FloatType => (arr: String, i: String) => s"(double) $arr.getFloat($i)"
      case _ => (arr: String, i: String) => s"$arr.getDouble($i)"
    }
    nullSafeCodeGen(ctx, ev, (arr, cellsArr) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val c = ctx.freshName("c")
      val ci = ctx.freshName("ci")
      val gi = ctx.freshName("gi")
      val s = ctx.freshName("s")
      val t = ctx.freshName("t")
      val d = ctx.freshName("d")
      val cid = ctx.freshName("cid")
      val cv = ctx.freshName("cv")
      val m = ctx.freshName("m")
      val kept = ctx.freshName("kept")
      val pos = ctx.freshName("pos")
      val bd = ctx.freshName("bd")
      val bi = ctx.freshName("bi")
      val gIds = ctx.freshName("gIds")
      val gVecs = ctx.freshName("gVecs")
      val idsL = ctx.freshName("idsL")
      val vecsL = ctx.freshName("vecsL")
      val anyNull = ctx.freshName("anyNull")
      s"""
         |java.util.HashMap $gi = $idxRef;
         |long[][] $gIds = $gIdsRef;
         |double[][][] $gVecs = $gVecsRef;
         |int $n = $arr.numElements();
         |boolean $anyNull = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($arr.isNullAt($i)) { $anyNull = true; break; }
         |}
         |if ($anyNull) {
         |  ${ev.isNull} = true;
         |} else {
         |  double[] $bd = new double[$probe];
         |  long[] $bi = new long[$probe];
         |  int $kept = 0;
         |  for (int $ci = 0; $ci < $cellsArr.numElements(); $ci++) {
         |    if ($cellsArr.isNullAt($ci)) continue;
         |    Integer $c =
         |      (Integer) $gi.get(java.lang.Long.valueOf($cellsArr.getLong($ci)));
         |    if ($c == null) continue;
         |    long[] $idsL = $gIds[$c.intValue()];
         |    double[][] $vecsL = $gVecs[$c.intValue()];
         |    for (int $pos = 0; $pos < $idsL.length; $pos++) {
         |      double[] $cv = $vecsL[$pos];
         |      int $m = java.lang.Math.min($n, $cv.length);
         |      double $s = 0.0;
         |      for (int $i = 0; $i < $m; $i++) {
         |        double $t = ${get(arr, i)} - $cv[$i];
         |        $s += $t * $t;
         |      }
         |      double $d = java.lang.Math.sqrt($s);
         |      long $cid = $idsL[$pos];
         |      $kept = graft.functions.expr.NearestKernel.insert(
         |        $d, $cid, $bd, $bi, $kept, $probe);
         |    }
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData
         |    .toArrayData(java.util.Arrays.copyOf($bi, $kept));
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): NearestCentroidsInCells =
    copy(vec = newLeft, cells = newRight)
}
