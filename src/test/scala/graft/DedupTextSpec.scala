package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.{Dedup, TextAnalysis}

/** Dedup + text-analysis invariants (builder-brief north-star components).
  * LSH correctness is asserted as recall against exact Jaccard on planted
  * near-duplicates — the standard validation for banded MinHash. */
class DedupTextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "THE QUICK  BROWN FOX jumps over the lazy dog"), // exact dup after normalize
    (3L, "the quick brown fox jumps over the lazy cat"),  // near dup of 1
    (4L, "completely different text about spark engines and shuffles"),
    (5L, "another unrelated document mentioning feature stores"))
    .toDF("doc_id", "text")

  test("exact dedup keeps min-id per normalized content group") {
    val kept = Dedup.exactDedup(docs, "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept === Set(1L, 3L, 4L, 5L)) // 2 collapses into 1
  }

  test("word shingles golden") {
    val df = Seq("a b c d").toDF("t")
    val sh = df.select(Dedup.wordShingles(col("t"), 3)).head().getSeq[String](0)
    assert(sh === Seq("a b c", "b c d"))
  }

  test("char shingles golden: distinct 3-grams of normalized text") {
    val df = Seq("abcabc").toDF("t")
    val sh = df.select(Dedup.charShingles(col("t"), 3)).head().getSeq[String](0)
    assert(sh === Seq("abc", "bca", "cab")) // distinct, first-occurrence order
    val short = Seq("ab").toDF("t")
    assert(short.select(Dedup.charShingles(col("t"), 3))
      .head().getSeq[String](0) === Seq("ab"))
  }

  test("diversity ratio golden (F21, feature_engineering.py:311-315)") {
    import graft.ops.Features
    val df = Seq(
      (Seq("a", "b", "a", "c")), (Seq.empty[String])).toDF("arr")
    val got = df.select(Features.diversityRatio(col("arr"))).as[Double]
      .collect().toSeq
    assert(got.head === 0.75) // 3 distinct of 4
    assert(got(1) === 0.0)    // empty list → 0/max(0,1)
  }

  test("minhash LSH finds planted near-duplicates (recall vs exact jaccard)") {
    val exact = Dedup.tokenJaccardPairs(docs, "doc_id", "text", 0.7)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    assert(exact.contains((1L, 3L))) // sanity: the planted near-dup pair
    val lsh = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleLen = 2, numHashes = 64, bands = 32, threshold = 0.5)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // every high-jaccard pair must be recalled by LSH at these band settings
    assert(exact.diff(lsh).isEmpty, s"LSH missed pairs: ${exact.diff(lsh)}")
  }

  test("minhash LSH: hot-bucket cap is a no-op when buckets are small") {
    def pairs(cap: Int) = Dedup.minHashNearDups(docs, "doc_id", "text",
      shingleLen = 2, numHashes = 64, bands = 32, threshold = 0.5,
      maxBucketSize = cap)
      .select("id1", "id2").as[(Long, Long)].collect().toSet
    // buckets in this corpus are far below the cap → capped == uncapped
    assert(pairs(64) === pairs(0))
  }

  test("simhash banding is COMPLETE vs brute force at the requested radius (sf0.001)") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val fp = docs.select(col("doc_id").as("id"),
      Dedup.simHash64(col("text")).as("fp"))
    for (radius <- Seq(3, 8)) {
      val brute = fp.select(col("id").as("id1"), col("fp").as("fp1"))
        .crossJoin(fp.select(col("id").as("id2"), col("fp").as("fp2")))
        .filter(col("id1") < col("id2"))
        .filter(Dedup.hamming64(col("fp1"), col("fp2")) <= radius)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      val banded = Dedup.simHashNearDups(docs, "doc_id", "text",
        maxHamming = radius)
        .select("id1", "id2").as[(Long, Long)].collect().toSet
      assert(banded === brute,
        s"radius $radius: banded ${banded.size} vs brute ${brute.size}; " +
          s"missed=${brute.diff(banded).take(5)} extra=${banded.diff(brute).take(5)}")
    }
  }

  test("simhash rejects radii beyond the banding's useful range") {
    intercept[IllegalArgumentException] {
      Dedup.simHashNearDups(docs, "doc_id", "text", maxHamming = 16)
    }
  }

  test("simhash: identical docs → hamming 0; near-dups closer than unrelated") {
    val fp = docs.select(col("doc_id"), Dedup.simHash64(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) === fp(2L)) // normalization makes them identical
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(1L), fp(3L)) < ham(fp(1L), fp(4L)))
  }

  test("token stats golden") {
    val df = Seq("Hello world, hello Spark!").toDF("t")
    val row = TextAnalysis.documentStats(
      df.withColumn("id", lit(1L)), "id", "t", Seq("hello")).head()
    assert(row.getAs[Int]("n_tokens") === 4)
    // tokens: [hello, world,, hello, spark!] — bare "hello" matches twice
    assert(row.getAs[Double]("stopword_ratio") === 0.5)
  }

  test("fingerprint: deterministic and content-sensitive") {
    val df = Seq((1L, "abc"), (2L, "abc"), (3L, "abd")).toDF("id", "t")
    val fps = df.select(col("id"), TextAnalysis.fingerprint(col("t")).as("fp"))
      .as[(Long, Long)].collect().toMap
    assert(fps(1L) === fps(2L))
    assert(fps(1L) !== fps(3L))
    // golden: ((7*31+97)%p *31+98)%p *31+99 % p
    val expected = ((((7L * 31 + 97) * 31) + 98) * 31 + 99) % 2147483647L
    assert(fps(1L) === expected)
  }

  test("langId picks the profile with most marker hits, alpha tiebreak") {
    val profiles = Seq(
      "en" -> Seq("hello", "world"),
      "fr" -> Seq("bonjour", "monde"))
    val df = Seq("bonjour le monde", "hello big world", "nothing matches")
      .toDF("t")
    val got = df.select(
      TextAnalysis.langIdByProfiles(col("t"), profiles)).as[String]
      .collect().toSeq
    assert(got === Seq("fr", "en", "en")) // tie (0,0) → alphabetically first
  }
}
