package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.Relational

/** Differential fuzzing of the round-7 parallel-rank / candidate-join
  * devices against plain-Scala references: random multisets through
  * globalRowNumber and rankInGroups, random interval sets through
  * intervalJoin. Fixed scalacheck seeds (same offline-sampling pattern as
  * MetricsPropertySpec) keep runs reproducible. */
class ParallelRankPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val rowsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 400)
    // small value domain → heavy ties, incl. ties spanning range bounds
    vals <- Gen.listOfN(n, Gen.choose(0L, 12L))
  } yield vals.zipWithIndex.map { case (v, i) => (v, i.toLong) }

  test("globalRowNumber = sorted-order permutation on random multisets") {
    (1 to 4).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(100L + batch))
      val df = rows.toDF("v", "id")
      val got = Relational.globalRowNumber(
          df, Seq(col("v"), col("id")), rnCol = "rn")
        .select(col("id"), col("rn")).as[(Long, Long)].collect()
        .sortBy(_._2).map(_._1).toSeq
      val want = rows.sortBy { case (v, id) => (v, id) }.map(_._2)
      assert(got === want, s"batch $batch")
    }
  }

  test("rankGuard invariant detects a non-reused range exchange") {
    // globalRowNumber's correctness hinges on the offsets subtree and the
    // main subtree hanging off ONE reused range exchange (identical
    // spark_partition_id on both sides). This rebuilds the device with the
    // failure the scaladoc warns about — two INDEPENDENT exchanges with
    // different widths, the situation a caller-inserted persist() between
    // the branches (or a future loss of ReuseExchange) would create — and
    // asserts the guard's dense-1..n invariant catches the corruption.
    import org.apache.spark.sql.expressions.Window
    val df = (0L until 1000L).map(i => (i % 13, i)).toDF("v", "id")
    val sortCols = Seq(col("v"), col("id"))
    def branch(width: Int) = df.repartitionByRange(width, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
    val offsets = branch(3).groupBy(col("__pid"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__offset",
        coalesce(sum(col("__n")).over(
          Window.partitionBy(pmod(col("__pid"), lit(1))).orderBy(col("__pid"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val corrupted = branch(5)
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("__pid")).orderBy(sortCols: _*)).cast("long") +
        col("__offset"))
    val Seq((mn, mx, n)) = corrupted
      .agg(min(col("rn")), max(col("rn")), count(lit(1)))
      .as[(Long, Long, Long)].collect().toSeq
    // the exact corruption shape varies with AQE coalescing, but a dense
    // 1..n rank is impossible when the two subtrees disagree on pids
    assert(!(mn == 1L && mx == n),
      s"mismatched exchanges unexpectedly produced dense ranks (n=$n)")
    // and the real device, guard ON (TestSpark sets spark.graft.rankGuard),
    // passes its own invariant on the same input
    val ok = Relational.globalRowNumber(df, sortCols, rnCol = "rn")
    assert(ok.count() === 1000L)
  }

  test("rankInGroups = reference rank() on random grouped multisets") {
    (1 to 4).foreach { batch =>
      val rows = rowsGen
        .pureApply(Gen.Parameters.default, Seed(200L + batch))
        .map { case (v, id) => (s"g${id % 3}", v, id) }
      val df = rows.toDF("g", "v", "id")
      val got = Relational.rankInGroups(df, "g", "v", "rk")
        .select(col("id"), col("rk")).as[(Long, Long)].collect().toMap
      val want = rows.groupBy(_._1).flatMap { case (_, grp) =>
        val sorted = grp.sortBy(_._2)
        sorted.zipWithIndex.map { case ((_, v, id), i) =>
          // SQL rank(): 1 + count of strictly-smaller values in the group
          id -> (sorted.count(_._2 < v) + 1).toLong
        }
      }
      assert(got === want, s"batch $batch")
    }
  }

  private val intervalCase: Gen[(List[(Long, Long)], List[(Long, Long, Long)])] =
    for {
      np <- Gen.choose(0, 150)
      pts <- Gen.listOfN(np, Gen.choose(0L, 300L))
      ni <- Gen.choose(0, 25)
      ivs <- Gen.listOfN(ni, for {
        s <- Gen.choose(-20L, 310L)
        w <- Gen.choose(-5L, 80L) // negative width → inverted interval
      } yield (s, s + w))
    } yield (pts.zipWithIndex.map { case (p, i) => (i.toLong, p) },
      ivs.zipWithIndex.map { case ((s, e), i) => (i.toLong, s, e) })

  test("intervalJoin = naive BETWEEN on random points and intervals") {
    (1 to 4).foreach { batch =>
      val (pts, ivs) = intervalCase
        .pureApply(Gen.Parameters.default, Seed(300L + batch))
      val got = Relational.intervalJoin(
          pts.toDF("pid", "p"), "p",
          ivs.toDF("iid", "s", "e"), "s", "e", bucketWidth = 13L)
        .select(col("pid"), col("iid")).as[(Long, Long)].collect().toSet
      val want = (for {
        (pid, p) <- pts; (iid, s, e) <- ivs if p >= s && p <= e
      } yield (pid, iid)).toSet
      assert(got === want, s"batch $batch")
    }
  }

  test("dedupPassages = plain-Scala first-occurrence reference on random corpora") {
    // Small token domain + short passages force cross-doc AND within-doc
    // passage collisions; size=3 keeps ragged tails frequent.
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 60)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("t0", "t1", "t2", "t3"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 4).foreach { batch =>
      val rows = corpusGen.pureApply(Gen.Parameters.default, Seed(500L + batch))
      val got = graft.ops.TextAnalysis.dedupPassages(
          rows.toDF("doc_id", "text"), "doc_id", "text", size = 3)
        .as[(Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      // reference: segment every doc into 3-token passages, elect the
      // lexicographically-first (doc_id, idx) per content, reassemble
      val segs = rows.flatMap { case (id, t) =>
        t.split(" ").grouped(3).zipWithIndex
          .map { case (p, i) => (id, i.toLong, p.mkString(" ")) }
      }
      val keeper = segs.groupBy(_._3).map { case (p, occ) =>
        p -> occ.map(x => (x._1, x._2)).min
      }
      rows.foreach { case (id, _) =>
        val mine = segs.filter(_._1 == id)
        val kept = mine.filter(s => keeper(s._3) == ((s._1, s._2)))
        val want = (id, mine.size.toLong, kept.size.toLong,
          kept.sortBy(_._2).map(_._3).mkString(" "))
        assert(got(id) === want, s"batch $batch doc $id")
      }
    }
  }

  test("bpeMerges = list-based greedy BPE reference on random corpora") {
    // The engine's merge device is a padded-STRING replace; the reference
    // here is a direct token-LIST walk — two genuinely different
    // implementations of "merge every non-overlapping (l,r) left to
    // right". Small vocab forces dense pair collisions and repeated
    // tokens (the overlap cases).
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 40)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 12)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    def referenceBpe(docs0: List[List[String]],
                     k: Int): List[(String, String, Long)] = {
      var docs = docs0
      val out = scala.collection.mutable.ListBuffer.empty[(String, String, Long)]
      var step = 0
      while (step < k) {
        val counts = docs.flatMap(d =>
          d.iterator.sliding(2).withPartial(false).map(p => (p(0), p(1))))
          .groupBy(identity).map { case (p, o) => (p, o.size.toLong) }
        if (counts.isEmpty) return out.toList
        val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
        docs = docs.map { d =>
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < d.length) {
            if (i + 1 < d.length && d(i) == l && d(i + 1) == r) {
              buf += (l + "\u0001" + r); i += 2
            } else { buf += d(i); i += 1 }
          }
          buf.toList
        }
        out += ((l, r, c))
        step += 1
      }
      out.toList
    }
    (1 to 4).foreach { batch =>
      val rows = corpusGen.pureApply(Gen.Parameters.default, Seed(1300L + batch))
      val got = graft.ops.TextAnalysis.bpeMerges(
          rows.toDF("doc_id", "text"), "text", iterations = 3)
        .as[(Long, String, String, Long)].collect().toSeq
        .map(r => (r._2, r._3, r._4))
      val want = referenceBpe(rows.map(_._2.split(" ").toList), 3)
      assert(got === want, s"batch $batch")
      // the checkpointing form must learn the IDENTICAL table (same
      // counts, same tiebreak, same greedy merge — only the state
      // materialization differs)
      val mat = graft.ops.TextAnalysis.bpeMergesMaterialized(
          rows.toDF("doc_id", "text"), "text", iterations = 3)
        .as[(Long, String, String, Long)].collect().toSeq
        .map(r => (r._2, r._3, r._4))
      assert(mat === want, s"batch $batch (materialized)")
    }
  }

  test("bpeEncode = iterative lowest-rank-first apply on unseen corpora " +
    "(tables learned on a different corpus)") {
    // The engine applies the table as ONE ordered pass of replaces; the
    // reference here is the classic tokenizer-apply loop — repeatedly
    // find the lowest-RANK pair present in the doc and merge all its
    // non-overlapping occurrences left to right, until no table pair is
    // present. Equal outputs on tables learned on corpus A applied to
    // fresh corpus B is exactly the "one ordered pass IS BPE apply"
    // property the operator's scaladoc claims.
    def minRankApply(doc0: List[String],
                     merges: List[(String, String)]): List[String] = {
      val rank = merges.zipWithIndex.toMap
      var doc = doc0
      var done = false
      while (!done) {
        val present = doc.iterator.sliding(2).withPartial(false)
          .map(p => (p(0), p(1))).filter(rank.contains).toList
        if (present.isEmpty) done = true
        else {
          val (l, r) = present.minBy(rank)
          val buf = scala.collection.mutable.ListBuffer.empty[String]
          var i = 0
          while (i < doc.length) {
            if (i + 1 < doc.length && doc(i) == l && doc(i + 1) == r) {
              buf += (l + "\u0001" + r); i += 2
            } else { buf += doc(i); i += 1 }
          }
          doc = buf.toList
        }
      }
      doc
    }
    val corpusGen: Gen[List[(Long, String)]] = for {
      n <- Gen.choose(1, 30)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 14)
        toks <- Gen.listOfN(len, Gen.oneOf("a", "b", "c", "d"))
      } yield toks.mkString(" "))
    } yield docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    (1 to 4).foreach { batch =>
      val trainRows = corpusGen.pureApply(Gen.Parameters.default,
        Seed(2600L + batch))
      val applyRows = corpusGen.pureApply(Gen.Parameters.default,
        Seed(2700L + batch))
      val table = graft.ops.TextAnalysis.bpeMergesMaterialized(
          trainRows.toDF("doc_id", "text"), "text", iterations = 4)
        .orderBy(col("step"))
        .as[(Long, String, String, Long)].collect().toList
        .map(r => (r._2, r._3))
      val got = graft.ops.TextAnalysis.bpeEncode(
          applyRows.toDF("doc_id", "text"), "doc_id", "text", table)
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> r).toMap
      applyRows.foreach { case (id, text) =>
        val doc0 = text.split(" ").filter(_.nonEmpty).toList
        val want = minRankApply(doc0, table)
        val (gid, nw, nb, nm, enc) = got(id)
        assert(gid === id)
        assert(enc === want.mkString(" "), s"batch $batch doc $id")
        assert(nw === doc0.length.toLong)
        assert(nb === want.length.toLong)
        assert(nm === want.count(_.contains("\u0001")).toLong)
      }
    }
  }

  test("MaxVectorDot = HOF array_max(transform(dot)) on random vector sets") {
    import org.apache.spark.sql.graftshim.ColumnBridge
    val setGen: Gen[(Array[Array[Double]], List[List[Float]])] = for {
      dim <- Gen.choose(1, 9)
      nSet <- Gen.choose(1, 12)
      set <- Gen.listOfN(nSet, Gen.listOfN(dim,
        Gen.choose(-4.0, 4.0)))
      nRows <- Gen.choose(1, 120)
      rows <- Gen.listOfN(nRows, Gen.listOfN(dim,
        Gen.choose(-4.0f, 4.0f)))
    } yield (set.map(_.toArray).toArray, rows)
    (1 to 4).foreach { batch =>
      val (set, rows) = setGen
        .pureApply(Gen.Parameters.default, Seed(1700L + batch))
      val df = rows.zipWithIndex.map { case (v, i) => (i.toLong, v) }
        .toDF("id", "v")
      val tvsCol = array(set.map(tv => array(tv.map(lit): _*)): _*)
      val hof = df.select(col("id"), array_max(transform(tvsCol,
          tv => graft.functions.Vectors.vecDotNative(col("v"), tv))).as("m"))
        .as[(Long, Double)].collect().toMap
      val native = df.select(col("id"), ColumnBridge.column(
          graft.functions.expr.MaxVectorDot(
            ColumnBridge.expression(col("v")), set)).as("m"))
        .as[(Long, Double)].collect().toMap
      hof.keys.foreach(i => assert(native(i) === hof(i),
        s"batch $batch row $i: native ${native(i)} vs hof ${hof(i)}"))
    }
  }

  test("upsampleMix = per-row closed form on random weights") {
    val wGen: Gen[List[Double]] = for {
      n <- Gen.choose(1, 300)
      ws <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0.0, 3.5),
        Gen.oneOf(0.0, 1.0, 2.0))) // mix continuous and exact-integer
    } yield ws
    def md5hex(k: Long): String = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(k.toString.getBytes("UTF-8"))
      d.take(4).map(b => f"${b & 0xff}%02x").mkString
    }
    (1 to 3).foreach { batch =>
      val ws = wGen.pureApply(Gen.Parameters.default, Seed(900L + batch))
        .zipWithIndex.map { case (w, i) => (i.toLong, w) }
      val got = graft.ops.Relational.upsampleMix(
          ws.toDF("id", "w"), col("id"), col("w"))
        .groupBy("id").count().as[(Long, Long)].collect().toMap
      ws.foreach { case (id, w) =>
        val frac = w - math.floor(w)
        val th = math.min(math.floor(frac * 4294967296.0), 4294967295.0).toLong
        val extra = if (md5hex(id) < f"$th%08x") 1L else 0L
        val want = math.floor(w).toLong + extra
        assert(got.getOrElse(id, 0L) === want, s"batch $batch id $id w $w")
      }
    }
  }
}
