package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{RollingHash, SimHash64, WordNGrams}

/** Property-style checks of the native Expressions against
  * straightforward reference implementations (scalacheck generators,
  * fixed seeds — no scalatestplus bridge in the offline cache).
  */
class PropertySpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  private def samples[T](gen: Gen[T], n: Int): Seq[T] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(42L + i)))

  test("RollingHash == byte-wise modular polynomial for arbitrary strings") {
    val asciiText = Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.const(' '))).map(_.mkString)
    val texts = samples(asciiText, 200)
    val got = texts.toDF("t").select(RollingHash(col("t"))).as[Long].collect()
    val exp = texts.map { t =>
      t.getBytes("UTF-8").foldLeft(0L)((acc, b) => (acc * 31 + (b & 0xff)) % 1000000007L)
    }
    assert(got.toSeq == exp)
  }

  test("WordNGrams == naive sliding-window distinct n-grams") {
    val tokensGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd", "ee"))
    for (n <- 1 to 4) {
      val docs = samples(tokensGen, 100)
      val got = docs.toDF("toks")
        .select(WordNGrams(col("toks"), n)).as[Seq[String]].collect()
      val exp = docs.map(ts => ts.sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq.distinct)
      assert(got.map(_.toSeq).toSeq == exp, s"n=$n")
    }
  }

  test("WordNGrams counting mode == naive sliding window with duplicates") {
    val tokensGen = Gen.listOf(Gen.oneOf("a", "b", "c", "dd"))
    val docs = samples(tokensGen, 100)
    val got = docs.toDF("toks")
      .select(WordNGrams(col("toks"), 2, distinct = false)).as[Seq[String]].collect()
    val exp = docs.map(ts => ts.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq)
    assert(got.map(_.toSeq).toSeq == exp)
  }

  test("SimHash64: deterministic, and near-identical docs are close in hamming") {
    val tokensGen = Gen.nonEmptyListOf(Gen.oneOf("x", "y", "z", "w", "qq", "rr"))
    val docs = samples(tokensGen, 50)
    val twice = (docs ++ docs).toDF("t").select(SimHash64(col("t"))).as[Long].collect()
    assert(twice.take(docs.size).toSeq == twice.drop(docs.size).toSeq)
    // flipping one token of a long doc moves few bits
    val base = List.fill(200)("x") ++ List("y", "z", "w")
    val mut = base.updated(0, "qq")
    val sigs = Seq(base, mut).toDF("t").select(SimHash64(col("t"))).as[Long].collect()
    assert(java.lang.Long.bitCount(sigs(0) ^ sigs(1)) <= 16)
  }

  test("results are invariant to shuffle width (partial-agg order independence)") {
    // The decimal-aggregation discipline exists so a 1000-executor
    // cluster and local[4] produce BIT-IDENTICAL floats. Re-running
    // representative float-heavy queries under a different shuffle
    // width reorders every partial aggregation — results must not move.
    val names = Seq("q01_pricing_summary", "q56_mc_bias", "q79_bigram_lm",
      // round 5: the generated-oracle LSH pipeline (array-key buckets),
      // decimal threshold routing, and the offset-table id assignment
      // must all be width-independent or the cluster story is fiction
      "q93_minhash_lsh_exact", "q96_ccnet_admission", "q98_stable_ids")
    def run(name: String) =
      SparkEntry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    val before = names.map(n => n -> run(n)).toMap
    val orig = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.shuffle.partitions", "17")
      // drop any frames the first runs persisted (e.g. q56's byUser):
      // CacheManager would otherwise substitute the cached relation
      // and the width-17 partial aggs would never actually execute
      spark.catalog.clearCache()
      names.foreach(n => assert(run(n) == before(n), s"$n moved with shuffle width"))
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", orig)
      spark.catalog.clearCache()
    }
  }

  test("ElemProduct == zip_with cast-and-multiply for arbitrary float vectors") {
    val vecGen = Gen.listOfN(16, Gen.chooseNum(-10.0f, 10.0f))
    val pairs = samples(Gen.zip(vecGen, vecGen), 50)
    val df = pairs.toDF("a", "b")
    val native = df.select(graft.plans.VecExprs.elemProduct(col("a"), col("b")))
      .as[Seq[Double]].collect()
    val hof = df.select(zip_with(col("a"), col("b"),
      (x, y) => x.cast("double") * y.cast("double")))
      .as[Seq[Double]].collect()
    assert(native.toSeq == hof.toSeq) // bit-identical, not approx
  }

  test("Pairing.buckets: pinned at test SFs, linear with bounded width at scale") {
    import graft.operators.Pairing
    // every driver corpus keeps the fixed 25-bucket candidate set
    for (n <- Seq(500L, 2000L, 5000L, 6400L)) assert(Pairing.buckets(n) == 25)
    // monotonic in corpus size
    val sizes = samples(Gen.chooseNum(1L, 10_000_000_000L), 300).sorted
    val ks = sizes.map(n => Pairing.buckets(n))
    assert(ks == ks.sorted)
    // expected bucket width stays bounded once the policy engages:
    // n/K ≤ 2×targetWidth for any corpus above the floor regime
    for (n <- sizes if n > 25L * 256 * 2)
      assert(n.toDouble / Pairing.buckets(n) <= 2 * 256, s"n=$n")
  }

  test("PostingPairs == naive i<j pair enumeration for arbitrary posting arrays") {
    import org.apache.spark.sql.functions._
    // postings of 0..12 distinct ids (incl. empty and singleton —
    // the explode edge cases every dedup path hits)
    val gen = Gen.listOf(Gen.choose(0L, 30L)).map(_.distinct.sorted.take(12))
    val arrays = samples(gen, 150)
    val df = arrays.zipWithIndex
      .map { case (a, i) => (i.toLong, a.map(id => (id, id * 7L + 1L))) }
      .toDF("row_id", "raw")
      .select(col("row_id"), transform(col("raw"),
        x => struct(x.getField("_1").as("id"), x.getField("_2").as("w"))).as("docs"))
    val got = df
      .select(col("row_id"),
        explode(graft.plans.PairExprs.postingPairs(col("docs"))).as("p"))
      .select(col("row_id"), col("p.doc_a"), col("p.doc_b"), col("p.na"), col("p.nb"))
      .collect()
      .groupBy(_.getLong(0))
      .view.mapValues(_.map(r =>
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq.sorted)
      .toMap
    val exp = arrays.zipWithIndex.flatMap { case (a, i) =>
      val ws = a.map(id => id -> (id * 7L + 1L)).toMap
      for (x <- a.indices; y <- x + 1 until a.size)
        yield i.toLong -> (a(x), a(y), ws(a(x)), ws(a(y)))
    }.groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(got == exp)
    // rows with <2 postings contribute no pairs (explode drops them)
    val expEmpty = arrays.zipWithIndex.filter(_._1.size < 2).map(_._2.toLong).toSet
    assert(expEmpty.intersect(got.keySet).isEmpty)
  }

  test("session registries hook the context and evict its entries on application end") {
    // populate at least one registry through a real operator
    operators.Dedup.jaccardPairs(spark, sf).count()
    assert(SessionRegistry.isHooked(spark.sparkContext))
    assert(SessionRegistry.liveKeyCount(spark) > 0)
    // the pair artifact is on DISK and must die with its entry
    def pairDirs = java.nio.file.Files.list(java.nio.file.Paths.get("/tmp"))
      .toArray.map(_.toString)
      .filter(_.startsWith(
        s"/tmp/graft_pairs_${spark.sparkContext.applicationId}_"))
    assert(pairDirs.nonEmpty, "pair disk artifact missing before evict")
    // drive the listener body directly — stopping the suite's shared
    // context would kill every other test; the listener is one line
    // that calls exactly this
    SessionRegistry.evictContext(spark.sparkContext)
    assert(SessionRegistry.liveKeyCount(spark) == 0,
      "stopped context's registry entries must be gone")
    assert(pairDirs.isEmpty, "evicted context's disk artifacts must be deleted")
    // a live session re-populates (and re-hooks) on next access
    operators.Dedup.jaccardPairs(spark, sf).count()
    assert(SessionRegistry.liveKeyCount(spark) > 0)
    assert(SessionRegistry.isHooked(spark.sparkContext))
  }

  test("collected-rows registries honor the declared ceiling at sf0.1") {
    // drive the two collected-rows registries at the BENCH scale —
    // the bound must hold where it matters, not only on the tiny spec
    // corpus. mad thresholds: exactly one row per event type;
    // experiments: an eval-summary table. Graph results moved to disk
    // artifacts in round 6, so these two are the only rows registries.
    val sf01 = "/root/testdata/sf0.1"
    import org.apache.spark.sql.functions.col
    val mad = operators.FrameOps.madThresholds(spark, sf01)
    val nTypes = Tables.events(spark, sf01)
      .select(col("event_type")).distinct().count()
    assert(mad.count() == nTypes)
    ml.MlOps.fmRegression(spark, sf01).count() // one deterministic experiment
    val entries = operators.FrameOps.collectedRegistryRows(spark) ++
      ml.MlOps.collectedRegistryRows(spark)
    assert(entries.nonEmpty, "registries not populated")
    entries.foreach(n =>
      assert(n > 0 && n <= SessionRegistry.CollectedRowsCeiling,
        s"collected-rows entry of $n rows breaks the declared ceiling"))
  }

  test("cutTop + exact window == plain global window, including boundary ties") {
    // the q121/q157 scale guard: the heap pre-cut must never change
    // the SELECTED set — in particular when score ties straddle the
    // K boundary (the heap's id-hash tie order differs from the
    // declarative (score desc, id asc) order; only the CUT VALUE is
    // taken from it, so the window's verdict is unchanged)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val df = (1 to 200).map(i => (s"id_$i", rnd.nextInt(12).toDouble))
      .toDF("id", "score") // 12 distinct scores over 200 rows: dense ties
    def ranked(in: org.apache.spark.sql.DataFrame) = in
      .withColumn("rank", row_number().over(
        Window.orderBy(col("score").desc, col("id"))))
      .filter(col("rank") <= 10)
      .select("rank", "id", "score").collect().toSeq
    val full = ranked(df)
    val cut = ranked(graft.plans.TopKByKey.cutTop(df, col("score"), 10))
    assert(cut == full, s"cutTop changed the selection:\n$cut\nvs\n$full")
    // degenerate: fewer rows than K -> cut is -inf, nothing dropped
    val tiny = Seq(("a", 1.0), ("b", 2.0)).toDF("id", "score")
    assert(graft.plans.TopKByKey.cutTop(tiny, col("score"), 10).count() == 2)
  }
}
