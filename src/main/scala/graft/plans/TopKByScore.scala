package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences,
  Cast, Expression, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples,
  ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.DoubleType

/** Whole-operator Catalyst escalation (SURVEY §7.3 path (c)): per-group
  * top-k-by-score as a first-class logical operator with a two-phase
  * physical plan — partial top-k per input partition, shuffle ONLY the
  * survivors (≤ k rows per group per partition), exact top-k after
  * clustering. This is the plan Spark's own WindowGroupLimit rewrite
  * produces for `row_number() ≤ k`, expressed as a dedicated operator:
  * the heap kernel replaces the per-group sort, no rank column is ever
  * materialized, and the shuffled volume is bounded by k·partitions per
  * group regardless of group size.
  *
  * Semantics: the k highest-score rows per group (score cast to double).
  * Ties at the cut are broken arbitrarily — callers needing deterministic
  * tie-breaks should fold the tiebreak into the score or use the window
  * form; null scores rank lowest (kept only if a group has fewer than k
  * non-null-score rows). Output columns = input columns, order unspecified
  * (it's a set operator, like an aggregation before a sort).
  *
  * The reference's equivalent is the per-user candidate truncation inside
  * retrieval/ranking (`src/serving/retrieval.py:170-197` top-k slice);
  * the relational form (`w3_topk_per_group`) stays the oracle — this
  * operator is differential-tested against it (TopKPlanSpec).
  */
case class TopKPerGroupNode(groupExprs: Seq[Expression], scoreExpr: Expression,
                            k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, s"k must be >= 1, got $k")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(
      newChild: LogicalPlan): TopKPerGroupNode = copy(child = newChild)
}

/** Shared heap kernel: one pass over a partition keeping a size-k min-heap
  * per group key. Rows and group keys are copied before retention (the
  * input iterator reuses row buffers). */
private[plans] trait TopKHeapKernel { self: UnaryExecNode =>
  def groupExprs: Seq[Expression]
  def scoreExpr: Expression
  def k: Int

  override def output: Seq[Attribute] = child.output

  protected def topKIter(iter: Iterator[InternalRow]): Iterator[InternalRow] = {
    val groupProj = UnsafeProjection.create(groupExprs, child.output)
    val score = BindReferences.bindReference(scoreExpr, child.output)
    val ord = Ordering.by[(Double, InternalRow), Double](_._1)
    val heaps =
      new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[(Double, InternalRow)]]()
    while (iter.hasNext) {
      val row = iter.next()
      // null scores sort below every real score
      val s = score.eval(row) match {
        case null => Double.NegativeInfinity
        case v: Double => v
      }
      val key = groupProj(row)
      var heap = heaps.get(key)
      if (heap == null) {
        heap = new java.util.PriorityQueue[(Double, InternalRow)](k + 1, ord)
        heaps.put(key.copy(), heap)
      }
      if (heap.size < k) heap.add((s, row.copy()))
      else if (heap.peek()._1 < s) { heap.poll(); heap.add((s, row.copy())) }
    }
    heaps.values().iterator().asScala.flatMap(_.iterator().asScala.map(_._2))
  }
}

/** Phase 1: per-input-partition top-k (no distribution requirement) —
  * the map-side combine of the operator. At most k rows per (group,
  * partition) survive to the shuffle. */
case class TopKPerGroupPartialExec(groupExprs: Seq[Expression],
                                   scoreExpr: Expression, k: Int,
                                   child: SparkPlan)
    extends UnaryExecNode with TopKHeapKernel {
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKIter)
  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupPartialExec = copy(child = newChild)
}

/** Phase 2: exact top-k after clustering on the group key (the planner
  * inserts the exchange to satisfy the required distribution). */
case class TopKPerGroupFinalExec(groupExprs: Seq[Expression],
                                 scoreExpr: Expression, k: Int,
                                 child: SparkPlan)
    extends UnaryExecNode with TopKHeapKernel {
  // Empty grouping = global top-k: every partial survivor must land on ONE
  // task (AllTuples, the same requirement Spark's BaseAggregateExec states
  // for an empty grouping) or each partition would emit its own k rows.
  override def requiredChildDistribution: Seq[Distribution] =
    if (groupExprs.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(groupExprs) :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def doExecute(): RDD[InternalRow] =
    child.execute().mapPartitions(topKIter)
  override protected def withNewChildInternal(
      newChild: SparkPlan): TopKPerGroupFinalExec = copy(child = newChild)
}

/** Plans [[TopKPerGroupNode]] as partial → (exchange) → final. */
object TopKByScoreStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroupNode(g, s, k, child) =>
      TopKPerGroupFinalExec(g, s, k,
        TopKPerGroupPartialExec(g, s, k, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing entry point. */
object TopK {

  /** The k highest-`scoreCol` rows per `groupCols` group, via the custom
    * operator (see [[TopKPerGroupNode]] for semantics and caveats).
    * Installs [[TopKByScoreStrategy]] on the session if absent. */
  def topKByScore(df: DataFrame, groupCols: Seq[String], scoreCol: String,
                  k: Int): DataFrame = {
    val spark = df.sparkSession
    installStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute = analyzed.output
      .find(a => a.name.equalsIgnoreCase(n))
      .getOrElse(throw new IllegalArgumentException(
        s"column $n not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val scoreAttr = attr(scoreCol)
    val score: Expression =
      if (scoreAttr.dataType == DoubleType) scoreAttr
      else Cast(scoreAttr, DoubleType)
    org.apache.spark.sql.graftshim.ColumnBridge.dataFrame(spark,
      TopKPerGroupNode(groupCols.map(attr), score, k, analyzed))
  }

  /** Idempotently add the strategy to an existing session (the
    * `spark.sql.extensions=graft.GraftExtensions` route covers cluster
    * submission; this covers already-running sessions). */
  def installStrategy(spark: SparkSession): Unit = {
    val cs = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    if (!cs.experimental.extraStrategies.contains(TopKByScoreStrategy))
      cs.experimental.extraStrategies =
        cs.experimental.extraStrategies :+ TopKByScoreStrategy
  }
}
