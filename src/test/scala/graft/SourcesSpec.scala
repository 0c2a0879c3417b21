package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{FeatureStore, Features}
import graft.sources.{Readers, SyntheticData}

/** S1 `.dat` scan golden tests (FIXTURES.md §1.1 micro-files), synthetic
  * generator invariants (S10), and feature-store semantics (S8/S9/J8). */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def writeFixture(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-dat")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test(".dat ratings scan: schema + epoch decode (test_data_loading.py:60-96)") {
    val p = writeFixture("ratings.dat",
      "1::1::5::978300760\n1::2::3::978300760\n2::1::4::978300760\n2::3::5::978300760\n")
    val df = Readers.loadRatings(spark, p)
    assert(df.count() === 4)
    assert(df.columns.toSeq === Seq("user_id", "movie_id", "rating", "timestamp", "datetime"))
    val first = df.orderBy("user_id", "movie_id").head()
    assert(first.getAs[Long]("user_id") === 1L)
    assert(first.getAs[Int]("rating") === 5)
    assert(first.getAs[java.sql.Timestamp]("datetime").toInstant.getEpochSecond === 978300760L)
  }

  test(".dat movies scan: year extraction + genre multi-hot (movielens.py:143-157)") {
    val p = writeFixture("movies.dat",
      "1::Toy Story (1995)::Animation|Children's|Comedy\n" +
        "2::Jumanji (1995)::Action|Adventure\n" +
        "3::Heat (1995)::Action|Crime|Thriller\n")
    val df = Readers.loadMovies(spark, p)
    val toy = df.filter($"movie_id" === 1).head()
    assert(toy.getAs[Int]("year") === 1995)
    assert(toy.getAs[String]("title_clean") === "Toy Story")
    assert(toy.getAs[Int]("genre_animation") === 1)
    assert(toy.getAs[Int]("genre_comedy") === 1)
    assert(toy.getAs[Int]("genre_action") === 0)
    assert(toy.getAs[Int]("num_genres") === 3)
  }

  test("synthetic generator: deterministic per seed, correct domains (synthetic.py:18-111)") {
    val a = SyntheticData.interactions(spark, 50, 20, 500, 0.3, 42)
    val b = SyntheticData.interactions(spark, 50, 20, 500, 0.3, 42)
    assert(a.agg(sum("label")).head().getLong(0) ===
      b.agg(sum("label")).head().getLong(0))
    val users = SyntheticData.users(spark, 100, 4, 42)
    val ages = users.agg(min("age"), max("age")).head()
    assert(ages.getInt(0) >= 18 && ages.getInt(1) <= 70)
    assert(users.columns.count(_.startsWith("user_feat_")) === 4)
  }

  test("online lookup: latest-within-TTL per key (simple_feature_store.py:17-50)") {
    val feats = Seq(
      (1L, 100L, "old"), (1L, 200L, "new"),
      (2L, 10L, "stale")) // user 2's row is older than the TTL window
      .toDF("user_id", "ts_s", "v")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val keys = Seq(1L, 2L).toDF("user_id")
    val view = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 100L)
    val got = FeatureStore.onlineLookup(feats, view, keys,
      timestamp_seconds(lit(250L)), "ts_s")
      .select("user_id", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "new")) // user 2 expired (250-10 > 100)
  }

  test("as-of join: latest feature at-or-before entity time within TTL (simple_feature_store.py:52-71)") {
    val entity = Seq((1L, 300L), (1L, 150L), (2L, 300L))
      .toDF("user_id", "ets")
      .withColumn("ts", timestamp_seconds(col("ets")))
    val feats = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 10L, "c"))
      .toDF("user_id", "fts", "v")
      .withColumn("ts", timestamp_seconds(col("fts")))
    val view = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 120L)
    val got = FeatureStore.asOfJoin(entity, Seq("user_id"), "ts", feats,
      view, "fts")
      .select(col("user_id"), col("ets"), col("f_v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(got === Set(
      (1L, 300L, Some("b")), // 200 within [180, 300]
      (1L, 150L, Some("a")), // 100 within [30, 150]; 200 is in the future
      (2L, 300L, None)))     // 10 is outside [180, 300]
  }

  test("as-of join sorted form equals the range-join form (goldens + random)") {
    val view = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 120L)
    val entity = Seq((1L, 300L), (1L, 150L), (2L, 300L))
      .toDF("user_id", "ets")
      .withColumn("ts", timestamp_seconds(col("ets")))
    val feats = Seq((1L, 100L, "a"), (1L, 200L, "b"), (2L, 10L, "c"))
      .toDF("user_id", "fts", "v")
      .withColumn("ts", timestamp_seconds(col("fts")))
    val sorted = FeatureStore.asOfJoinSorted(entity, Seq("user_id"), "ts",
      feats, view, "fts")
      .select(col("user_id"), col("ets"), col("f_v"))
      .as[(Long, Long, Option[String])].collect().toSet
    assert(sorted === Set(
      (1L, 300L, Some("b")), (1L, 150L, Some("a")), (2L, 300L, None)))
    // differential on a larger deterministic random frame, incl. ties at
    // equal timestamps (tiebreak must pick the same winner in both forms)
    val rnd = new scala.util.Random(7)
    val e2 = (1 to 400).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user_id", "ets", "eid")
      .withColumn("ts", timestamp_seconds(col("ets")))
    val f2 = (1 to 600).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user_id", "fts_s", "fid")
      .withColumn("ts", timestamp_seconds(col("fts_s")))
    val view2 = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 200L)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("user_id"), col("eid"), col("f_fid"))
      .as[(Long, Long, Option[Long])].collect().toSet
    val a = norm(FeatureStore.asOfJoin(e2, Seq("user_id"), "ts", f2, view2, "fid"))
    val b = norm(FeatureStore.asOfJoinSorted(e2, Seq("user_id"), "ts", f2, view2, "fid"))
    assert(a === b, s"diff: ${(a.diff(b) ++ b.diff(a)).take(5)}")
    // null keys: SQL equality never matches NULL, so a null-key entity row
    // must get a null payload in BOTH forms (the sorted form's window would
    // otherwise group null keys together and leak a null-key feature row)
    val e3 = Seq((Some(1L), 300L, 1L), (None, 300L, 2L))
      .toDF("user_id", "ets", "eid")
      .withColumn("ts", timestamp_seconds(col("ets")))
    val f3 = Seq((Some(1L), 200L, 10L), (None, 250L, 11L))
      .toDF("user_id", "fts_s", "fid")
      .withColumn("ts", timestamp_seconds(col("fts_s")))
    def norm3(df: org.apache.spark.sql.DataFrame) = df
      .select(col("eid"), col("f_fid"))
      .as[(Long, Option[Long])].collect().toSet
    val expected = Set((1L, Some(10L)), (2L, None))
    assert(norm3(FeatureStore.asOfJoin(
      e3, Seq("user_id"), "ts", f3, view2, "fid")) === expected)
    assert(norm3(FeatureStore.asOfJoinSorted(
      e3, Seq("user_id"), "ts", f3, view2, "fid")) === expected)
  }

  test("salted as-of join equals the unsalted form on a 90%-one-key frame " +
    "and widens the join key with the salt") {
    val rnd = new scala.util.Random(11)
    // 90% of entity rows on key 7 (the hot entity), the rest spread
    val e = (1 to 500).map { i =>
      val k = if (i <= 450) 7L else rnd.nextInt(20).toLong
      (k, rnd.nextInt(1000).toLong, i.toLong)
    }.toDF("user_id", "ets", "eid")
      .withColumn("ts", timestamp_seconds(col("ets")))
    val f = (1 to 300).map(i =>
      (rnd.nextInt(20).toLong, rnd.nextInt(1000).toLong, i.toLong))
      .toDF("user_id", "fts_s", "fid")
      .withColumn("ts", timestamp_seconds(col("fts_s")))
    val view = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 200L)
    def norm(df: org.apache.spark.sql.DataFrame) = df
      .select(col("eid"), col("f_fid"))
      .as[(Long, Option[Long])].collect().toSet
    val plain = FeatureStore.asOfJoin(e, Seq("user_id"), "ts", f, view, "fid")
    val salted = FeatureStore.saltedAsOf(e, Seq("user_id"), "ts", f, view,
      "fid", salts = 8)
    assert(norm(salted) === norm(plain),
      "salted as-of diverged from the unsalted form")
    assert(salted.columns.toSeq === plain.columns.toSeq)
    // the widened key reaches the physical join
    val plan = salted.queryExecution.executedPlan.toString
    assert(plan.contains("__salt"), s"salt missing from the plan:\n$plan")
    // and the salt actually spreads the hot key across several salt values
    val spread = e.withColumn("__salt",
        pmod(xxhash64(col("user_id"), col("ts")), lit(8)))
      .filter(col("user_id") === 7L)
      .select(countDistinct(col("__salt"))).as[Long].head()
    assert(spread >= 4, s"hot key only reached $spread of 8 salts")
  }

  test("request-time source: one-row frame of request literals (S7, feature_definitions.py:259-272)") {
    val req = Readers.requestSource(spark,
      Map("device_type" -> "mobile", "time_of_day" -> 14, "is_weekend" -> false))
    assert(req.count() === 1)
    val row = req.head()
    assert(row.getAs[String]("device_type") === "mobile")
    assert(row.getAs[Int]("time_of_day") === 14)
    assert(row.getAs[Boolean]("is_weekend") === false)
    // request-time join shape: cross join against an entity frame
    val joined = Seq(1L, 2L).toDF("user_id").crossJoin(req)
    assert(joined.count() === 2 && joined.columns.contains("device_type"))
  }

  test("JSON sink round-trip (S11, evaluate_model.py:334-346)") {
    val dir = Files.createTempDirectory("graft-json").toString + "/out"
    val metrics = Seq(("recall_at_10", 0.0136), ("mrr", 0.1524))
      .toDF("metric", "value")
    Readers.writeJson(metrics, dir)
    val back = spark.read.json(dir)
    val got = back.select("metric", "value").as[(String, Double)]
      .collect().toMap
    assert(got === Map("recall_at_10" -> 0.0136, "mrr" -> 0.1524))
  }

  test("materialization: offline range → latest-per-key online snapshot (T10, simple_feature_store.py:82-90)") {
    val events = Seq(
      (1L, 100L, 1.0), (1L, 200L, 2.0), (1L, 900L, 9.0), (2L, 150L, 5.0))
      .toDF("user_id", "ts_s", "value")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val view = FeatureStore.FeatureView("f", Seq("user_id"), "ts", 3600L)
    val snap = FeatureStore.materialize(events, view,
      timestamp_seconds(lit(0L)), timestamp_seconds(lit(500L)), "ts_s")
    val got = snap.select("user_id", "value").as[(Long, Double)]
      .collect().toMap
    // ts=900 is outside the materialization range; latest within range wins
    assert(got === Map(1L -> 2.0, 2L -> 5.0))
  }

  test("sessionize: gap splits sessions (Features.sessionize)") {
    val ev = Seq((1L, 0L), (1L, 100L), (1L, 2000L), (1L, 2100L), (2L, 0L))
      .toDF("user_id", "ts_s")
      .withColumn("ts", timestamp_seconds(col("ts_s")))
    val sess = Features.sessionize(ev, "user_id", "ts", 1800L)
    val counts = sess.groupBy("user_id")
      .agg(max("session_idx").as("n")).as[(Long, Long)].collect().toMap
    assert(counts === Map(1L -> 2L, 2L -> 1L))
  }

  test("ewma golden: ordered fold, single-event key, storage-order blind") {
    // user 1: [10, 20, 30] in ts order; α=0.5 → 10, 15, 22.5
    val ev = Seq((1L, 2L, 20.0), (1L, 3L, 30.0), (1L, 1L, 10.0), (2L, 1L, 7.0))
      .toDF("user_id", "e", "value")
      .withColumn("ts", timestamp_seconds(col("e")))
    def run(df: org.apache.spark.sql.DataFrame) =
      Features.ewma(df, "user_id", "ts", "e", "value", 0.5)
        .as[(Long, Long, Double)].collect().toSet
    val got = run(ev)
    assert(got === Set((1L, 3L, 22.5), (2L, 1L, 7.0)))
    assert(got === run(ev.orderBy(col("e").desc).repartition(5)))
  }

  test("schema evolution: mergeSchema reads across drifting partition schemas") {
    // a corpus written over months gains columns; old partitions must stay
    // readable with the union schema, new columns null-filled backward
    val dir = java.nio.file.Files.createTempDirectory("graft-evolve").toString
    Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
      .write.parquet(s"$dir/batch=1")
    Seq((3L, "gamma", "en")).toDF("doc_id", "text", "lang")
      .write.parquet(s"$dir/batch=2")
    val merged = spark.read.option("mergeSchema", "true").parquet(dir)
    assert(merged.columns.toSet === Set("doc_id", "text", "lang", "batch"))
    val rows = merged.select("doc_id", "lang")
      .as[(Long, Option[String])].collect().toMap
    assert(rows(1L).isEmpty && rows(2L).isEmpty && rows(3L).contains("en"))
    // the default (no mergeSchema) picks ONE file's schema — documented
    // footgun: reading evolved corpora needs the option (or a catalog)
    val plain = spark.read.parquet(dir)
    assert(plain.columns.length <= merged.columns.length)
  }
}
