package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-store semantics (SURVEY §2.1 S8/S9, §2.3 J8, §2.5 W7):
  * Feast-style feature views re-expressed as Spark relational contracts.
  *
  * A feature view is (entity key columns, event-time column, TTL); the
  * reference declares these in `src/features/feature_definitions.py:45-63`
  * and mocks the lookups in `src/features/simple_feature_store.py:17-90`.
  * Here the DECLARED contract is implemented for real:
  *  - online lookup  = latest row per entity within TTL of "now"
  *  - historical     = point-in-time-correct as-of join (no feature leakage:
  *    each entity row sees only feature rows at or before its own timestamp,
  *    and not older than ttl)
  */
object FeatureStore {

  /** A feature view registration (ref `feature_definitions.py:45-63`). */
  case class FeatureView(name: String, entityCols: Seq[String],
                         tsCol: String, ttlSeconds: Long)

  /** W7/S8: latest row per entity key — `row_number() = 1` over ts desc.
    * `tiebreakCol` makes latest-wins deterministic on ts ties. One shuffle
    * on the entity key; rides WindowGroupLimit (rank-limit pushdown). */
  def latestPerKey(df: DataFrame, keyCols: Seq[String], tsCol: String,
                   tiebreakCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol).desc, col(tiebreakCol).desc)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** S8: online point lookup — latest feature row per requested entity,
    * subject to TTL freshness vs the injected `now`
    * (ref `simple_feature_store.py:17-50`; TTLs `feature_definitions.py:48`).
    * Request keys are typically tiny → broadcast semi-join, then latest-wins.
    */
  def onlineLookup(features: DataFrame, view: FeatureView,
                   requestKeys: DataFrame, now: Column,
                   tiebreakCol: String): DataFrame = {
    val fresh = features.filter(
      col(view.tsCol) <= now &&
      col(view.tsCol) >= now - expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
    val scoped = fresh.join(broadcast(requestKeys), view.entityCols, "left_semi")
    latestPerKey(scoped, view.entityCols, view.tsCol, tiebreakCol)
  }

  /** S9/J8: historical (point-in-time) feature retrieval — the as-of join.
    * For each entity row (key, t), attach the latest feature row with
    * `feature.ts ∈ [t - ttl, t]`; nulls where none qualifies (left join).
    *
    * Implementation: range-condition join + latest-wins dedup keyed by a
    * unique entity row id. At scale the range predicate bounds the join
    * fan-out to ttl-width slices; skewed hot entities can be salted upstream.
    * (ref contract: `simple_feature_store.py:52-71` + `feature_definitions.py`
    * TTLs; this is the real semantics the reference mocks.)
    */
  def asOfJoin(entityDf: DataFrame, entityKeyCols: Seq[String],
               entityTsCol: String, features: DataFrame, view: FeatureView,
               featureTiebreak: String): DataFrame = {
    val entity = entityDf.withColumn("__row_id", monotonically_increasing_id())
    // Prefix feature columns so the joined schema is unambiguous.
    val feats = features.columns.foldLeft(features) { (f, c) =>
      f.withColumnRenamed(c, s"f_$c")
    }
    val joinCond = view.entityCols.zip(entityKeyCols)
      .map { case (fk, ek) => col(s"f_$fk") === col(ek) }
      .reduce(_ && _) &&
      col(s"f_${view.tsCol}") <= col(entityTsCol) &&
      col(s"f_${view.tsCol}") >= col(entityTsCol) -
        expr(s"INTERVAL ${view.ttlSeconds} SECONDS")
    val joined = entity.join(feats, joinCond, "left")
    val w = Window.partitionBy(col("__row_id"))
      .orderBy(col(s"f_${view.tsCol}").desc, col(s"f_$featureTiebreak").desc)
    joined.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn", "__row_id")
      .drop(view.entityCols.map(c => s"f_$c"): _*)
  }

  /** S9/J8 at 100 TB: the as-of join as a union + single window pass ("sort
    * merge as-of") instead of a range-condition join. The range form's
    * fan-out is bounded only by the TTL width — a hot entity with a wide
    * TTL joins against every feature row in the window before dedup; this
    * form unions feature and entity rows per key, sorts once by
    * (ts, kind, tiebreak) with feature rows ordered before entity rows at
    * equal ts (as-of is inclusive), and takes the running `last_value`
    * (ignoring nulls) of the feature payload — each entity row sees exactly
    * the latest feature at-or-before its timestamp. One shuffle + sort,
    * zero join fan-out. TTL is applied afterward by nulling payloads older
    * than `entityTs − ttl`. Result row-for-row equal to [[asOfJoin]]
    * (asserted differentially in SourcesSpec; both forms are oracle-checked
    * by the same DuckDB SQL). */
  def asOfJoinSorted(entityDf: DataFrame, entityKeyCols: Seq[String],
                     entityTsCol: String, features: DataFrame,
                     view: FeatureView, featureTiebreak: String): DataFrame = {
    val featPayloadCols = features.columns
      .filterNot(view.entityCols.contains)
    // Entity rows carry their FULL original row through the union as a
    // struct — no row-id tagging, no re-attach join. (An earlier form
    // tagged with monotonically_increasing_id and self-joined on it; the
    // id is nondeterministic under re-evaluation after a shuffle, so the
    // two branches could disagree and drop/misattach payloads.)
    val payloadType = org.apache.spark.sql.types.StructType(
      featPayloadCols.map(c => features.schema(c)))
    val eTagged = entityDf.select(
      entityKeyCols.zip(view.entityCols).map { case (ek, fk) =>
        col(ek).as(fk)
      } ++ Seq(
        col(entityTsCol).as("__ts"),
        lit(null).cast(features.schema(featureTiebreak).dataType).as("__tb"),
        lit(1).as("__kind"),
        lit(null).cast(payloadType).as("__payload"),
        struct(entityDf.columns.map(col): _*).as("__erow")): _*)
    // Null-key feature rows are dropped before the union: the window
    // partitions group NULLs together, so a null-key feature payload could
    // otherwise attach to a null-key entity row — the range-join form's SQL
    // equality never matches on NULL, and the two forms must agree.
    val fTagged = features
      .filter(view.entityCols.map(col(_).isNotNull).reduce(_ && _))
      .select(
        view.entityCols.map(col) ++ Seq(
          col(view.tsCol).as("__ts"),
          col(featureTiebreak).as("__tb"),
          lit(0).as("__kind"),
          struct(featPayloadCols.map(col): _*).as("__payload"),
          lit(null).cast(eTagged.schema("__erow").dataType).as("__erow")): _*)
    val unioned = fTagged.unionByName(eTagged)
    // feature rows first at equal ts (inclusive as-of); among same-ts
    // features the highest tiebreak sorts last and wins last_value
    val w = Window
      .partitionBy(view.entityCols.map(col): _*)
      .orderBy(col("__ts").asc, col("__kind").asc, col("__tb").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = unioned
      .withColumn("__f", last(
        when(col("__kind") === 0,
          struct(col("__ts").as("fts"), col("__payload").as("p"))),
        ignoreNulls = true).over(w))
      .filter(col("__kind") === 1)
      .withColumn("__fresh",
        col("__f").isNotNull &&
        col("__f.fts") >= col("__ts") -
          expr(s"INTERVAL ${view.ttlSeconds} SECONDS"))
    val withPayload = featPayloadCols.foldLeft(carried) { (df, c) =>
      df.withColumn(s"f_$c", when(col("__fresh"), col(s"__f.p.$c")))
    }
    // unpack the carried entity row; column order matches [[asOfJoin]]
    withPayload.select(
      entityDf.columns.map(c => col(s"__erow.$c").as(c)) ++
        featPayloadCols.map(c => col(s"f_$c")): _*)
  }

  /** Skew-salted [[asOfJoin]]: a hot entity key (one user generating a
    * large share of rows) serializes its whole TTL window through one
    * reducer in the plain form. Salting widens the join key to
    * (key…, __salt): each ENTITY row deterministically hashes to one of
    * `salts` salts (derived from its key + timestamp, no nondeterministic
    * ids), and every FEATURE row is replicated once per salt — so the hot
    * key's entity rows spread across `salts` reducers while each still
    * sees the full feature history it needs. Cost: features scan ×salts
    * (features are the small side of a skewed as-of join); result is
    * row-for-row equal to the unsalted form (asserted differentially in
    * SourcesSpec). */
  def saltedAsOf(entityDf: DataFrame, entityKeyCols: Seq[String],
                 entityTsCol: String, features: DataFrame, view: FeatureView,
                 featureTiebreak: String, salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1, got $salts")
    val entityS = entityDf.withColumn("__salt",
      pmod(xxhash64(entityKeyCols.map(col) :+ col(entityTsCol): _*),
        lit(salts)).cast("int"))
    val featS = features.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    val viewS = view.copy(entityCols = view.entityCols :+ "__salt")
    asOfJoin(entityS, entityKeyCols :+ "__salt", entityTsCol, featS, viewS,
      featureTiebreak)
      .drop("__salt")
  }

  /** T10: materialization — recompute a view's feature table over an event
    * range and emit the latest-per-key online snapshot
    * (ref `simple_feature_store.py:82-90`). */
  def materialize(events: DataFrame, view: FeatureView, from: Column,
                  to: Column, tiebreakCol: String): DataFrame = {
    val ranged = events.filter(col(view.tsCol) >= from && col(view.tsCol) <= to)
    latestPerKey(ranged, view.entityCols, view.tsCol, tiebreakCol)
  }
}
