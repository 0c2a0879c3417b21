package graft.functions.expr

import java.io.{ByteArrayInputStream, ByteArrayOutputStream,
  DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters summary as a native mergeable aggregate — the
  * fourth Catalyst extension surface in this repo (beside codegen
  * expressions, the TopKByScore strategy, and the BandJoinRewrite rule).
  *
  * Finds every item whose frequency exceeds n/k using AT MOST k−1 counters
  * of state per partition, merged associatively (Agarwal et al.,
  * "Mergeable Summaries", PODS'12) — the sketch to reach for when the
  * domain is too large for a full `groupBy(term).count()` shuffle (corpus
  * vocabularies, URL hosts, user agents at 100 TB): state is O(k), the
  * shuffle carries one k-entry summary per partition, and the result is a
  * deterministic guarantee, not a sample.
  *
  * Estimates are lower bounds with error ≤ n/k (true_freq − n/k ≤ est ≤
  * true_freq); any item with true_freq > n/k is GUARANTEED present. When
  * the number of distinct items is < k the counts are exact and
  * order-independent (no decrement ever fires) — that regime is
  * DuckDB-oracle-gated; the approximate regime is invariant-checked
  * against exact counts.
  *
  * eval returns `array<struct<item string, est bigint>>` sorted by
  * (est desc, item asc).
  */
case class HeavyHittersAgg(child: Expression, k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]]
  with UnaryLike[Expression] {

  require(k >= 2, "heavy_hitters needs k >= 2")

  override def dataType: DataType = ArrayType(
    new StructType().add("item", StringType).add("est", LongType),
    containsNull = false)

  override def nullable: Boolean = false

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty[String, Long]

  override def update(buf: mutable.HashMap[String, Long],
                      input: InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val key = v.toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < k - 1) buf.update(key, 1L)
          else {
            // decrement-all: the Misra-Gries step that buys the n/k bound
            val dead = mutable.ArrayBuffer.empty[String]
            buf.foreach { case (ky, c) =>
              if (c == 1L) dead += ky else buf.update(ky, c - 1)
            }
            dead.foreach(buf.remove)
          }
      }
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    other.foreach { case (ky, c) =>
      buf.update(ky, buf.getOrElse(ky, 0L) + c)
    }
    if (buf.size > k - 1) {
      // keep the k−1 largest after subtracting the k-th largest count —
      // the mergeable-summaries reduction preserving the n/k error bound
      val kth = buf.values.toArray.sorted(Ordering[Long].reverse)(k - 1)
      val dead = mutable.ArrayBuffer.empty[String]
      buf.foreach { case (ky, c) =>
        if (c - kth <= 0L) dead += ky else buf.update(ky, c - kth)
      }
      dead.foreach(buf.remove)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val sorted = buf.toArray.sortBy { case (item, est) => (-est, item) }
    new GenericArrayData(sorted.map { case (item, est) =>
      InternalRow(UTF8String.fromString(item), est)
    })
  }

  // Items are length-prefixed UTF-8 byte arrays, not writeUTF: writeUTF
  // caps entries at 65535 encoded bytes and throws UTFDataFormatException
  // past it — and the vocab queries feed raw corpus tokens, where one
  // pathological >64 KB "token" would kill the job at shuffle time.
  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (ky, c) =>
      val b = ky.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length)
      out.write(b)
      out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      val ky = new String(b, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(ky, in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): HeavyHittersAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildInternal(newChild: Expression): HeavyHittersAgg =
    copy(child = newChild)

  override def prettyName: String = "heavy_hitters"
}

object HeavyHittersAgg {
  import org.apache.spark.sql.Column
  import org.apache.spark.sql.graftshim.ColumnBridge

  /** DataFrame-facing heavy_hitters(col, k) aggregate column. */
  def heavyHitters(c: Column, k: Int): Column =
    ColumnBridge.column(
      HeavyHittersAgg(ColumnBridge.expression(c), k)
        .toAggregateExpression())
}
