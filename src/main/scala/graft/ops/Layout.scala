package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout tools for the 100 TB posture (SURVEY §4.2 / builder
  * brief: "co-locate joins via bucketing, salting for skew").
  *
  * These are the knobs a 1000-executor deployment turns that local
  * correctness tests can't show: bucketed tables make repeated big-big
  * joins shuffle-free, and salted aggregation keeps one hot key from
  * serializing a stage.
  */
object Layout {

  /** Write a bucketed (and bucket-sorted) table: joins and aggregations on
    * `bucketCols` against tables bucketed the same way need NO exchange and
    * NO sort — the shuffle is paid once at write time instead of per query.
    * (Bucketing requires the table catalog, hence `saveAsTable`.) */
  def writeBucketed(df: DataFrame, tableName: String, numBuckets: Int,
                    bucketCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(tableName)

  /** Write hive-style partitioned parquet: queries filtering on
    * `partitionCols` scan only the matching directories (partition
    * pruning — the scan's `PartitionFilters`, distinct from row-group
    * `PushedFilters`). THE layout lever for a 100 TB corpus keyed by
    * coarse dimensions (lang, source, date): a per-language job reads
    * 1/N of the data without any index. Keep partition cardinality
    * bounded (≲ 10⁴ directories) — high-cardinality keys belong in
    * bucketing, not partitioning. */
  def writePartitioned(df: DataFrame, path: String,
                       partitionCols: Seq[String]): Unit =
    df.write
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Compact a fragmented parquet directory into ≈`targetRowsPerFile`
    * outputs — the small-files remedy for streaming / per-batch
    * incremental sinks, whose many tiny files degrade every later scan
    * (task-per-file scheduling, no row-group locality). One count (cheap:
    * parquet footer metadata), one round-robin repartition, one rewrite —
    * to a FRESH directory, never in place, so concurrent readers of the
    * old path stay consistent and the swap is an atomic rename/pointer
    * flip. Returns the row count written. */
  def compact(spark: org.apache.spark.sql.SparkSession, inPath: String,
              outPath: String, targetRowsPerFile: Long): Long = {
    require(targetRowsPerFile > 0, "targetRowsPerFile must be positive")
    val df = spark.read.parquet(inPath)
    val n = df.count()
    val nFiles = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    df.repartition(nFiles.toInt).write.mode("overwrite").parquet(outPath)
    n
  }

  /** 2-D Z-value (Morton code): interleaves the low 16 bits of two
    * non-negative integer columns, bit i of `a` landing at bit 2i and bit
    * i of `b` at bit 2i+1. Sorting by the Z-value clusters rows that are
    * close in BOTH dimensions — the multi-column analogue of a sort key.
    * Where a linear sort gives parquet min/max pruning on its leading
    * column only, a Z-ordered layout gives usable min/max ranges on both,
    * so scans filtering on EITHER dimension skip row groups. Pure
    * bit-arithmetic column expression (the classic parallel-prefix bit
    * spread) — whole-stage-codegen'd, no UDF. */
  def zValue2(a: Column, b: Column): Column = {
    def spread(x: Column): Column = {
      val v0 = x.cast("long").bitwiseAND(lit(0xFFFFL))
      val v1 = v0.bitwiseOR(shiftleft(v0, 8)).bitwiseAND(lit(0x00FF00FFL))
      val v2 = v1.bitwiseOR(shiftleft(v1, 4)).bitwiseAND(lit(0x0F0F0F0FL))
      val v3 = v2.bitwiseOR(shiftleft(v2, 2)).bitwiseAND(lit(0x33333333L))
      v3.bitwiseOR(shiftleft(v3, 1)).bitwiseAND(lit(0x55555555L))
    }
    spread(a).bitwiseOR(shiftleft(spread(b), 1))
  }

  /** Z-order-clustered parquet write: range-partition + locally sort by
    * [[zValue2]] over the two cluster columns, drop the scratch key,
    * write `nFiles` outputs. Each file then covers a compact rectangle of
    * the (a, b) space, so min/max footer stats prune scans filtering on
    * either column — the layout lever for a 100 TB table queried along
    * two independent dimensions (e.g. documents by (lang-bucket,
    * length-bucket), events by (user-bucket, day)). */
  def zorderWrite(df: DataFrame, aCol: String, bCol: String, path: String,
                  nFiles: Int): Unit =
    df.withColumn("__z", zValue2(col(aCol), col(bCol)))
      .repartitionByRange(nFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Per-file layout statistics: row count and min/max of the given
    * columns for every file in a parquet directory — the manifest a
    * data-skipping table format (Delta/Iceberg-style) maintains, computed
    * here from the data in one scan. Two uses: (a) quantify a layout's
    * pruning power (what fraction of files a predicate could skip — how
    * LayoutSpec grades [[zorderWrite]]), (b) audit ingest output for
    * accidental full-domain files that defeat min/max skipping. One scan,
    * one shuffle on file name (#files rows). */
  def statsManifest(spark: org.apache.spark.sql.SparkSession, path: String,
                    cols: Seq[String]): DataFrame = {
    val df = spark.read.parquet(path)
    df.groupBy(input_file_name().as("file"))
      .agg(count(lit(1)).as("rows"),
        cols.flatMap(c =>
          Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))): _*)
  }

  /** Fraction of files a min/max-skippable equality/range predicate on
    * `c` ∈ [lo, hi] can prune, given a [[statsManifest]] frame — the
    * number a layout change (sort, Z-order, partition) should move. */
  def pruneFraction(manifest: DataFrame, c: String,
                    lo: Column, hi: Column): Double = {
    val total = manifest.count()
    if (total == 0L) 0.0
    else {
      val hit = manifest
        .filter(col(s"max_$c") >= lo && col(s"min_$c") <= hi).count()
      (total - hit).toDouble / total
    }
  }

  /** Two-phase salted aggregation for skewed keys: phase 1 pre-aggregates
    * on (key, salt) so a hot key spreads over `saltBuckets` reducers; phase
    * 2 merges the partials per key. Exactly the same sums/counts as a
    * direct groupBy — the salt only reshapes the shuffle.
    *
    * (AQE's skew-join handling covers joins; this is the aggregation-side
    * equivalent for when a single group dwarfs the rest.) */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBuckets: Int): DataFrame = {
    val salted = df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(saltBuckets.toLong)))
    val partial = salted
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(col(valueCol)).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__psum")).as(s"sum_$valueCol"),
        sum(col("__pcnt")).as("cnt"))
  }
}
