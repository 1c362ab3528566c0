package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextFns
import graft.plans.RollingHash

class TextOpsSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  test("rolling hash matches the byte-wise reference formula") {
    val got = Seq("hello world").toDF("t")
      .select(RollingHash(col("t")).as("fp")).head.getLong(0)
    var exp = 0L
    "hello world".getBytes("UTF-8").foreach { b =>
      exp = (exp * 31 + (b & 0xff)) % 1000000007L
    }
    assert(got == exp)
    assert(got == 204910434L) // cross-checked against DuckDB list_reduce
  }

  test("rolling hash stays inside whole-stage codegen") {
    val plan = Tables.documents(spark, sf).select(RollingHash(col("text")))
      .queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the plan string
    assert(plan.contains("*(1) Project"), plan)
  }

  test("char shingles are distinct n-grams") {
    val row = Seq("abcab").toDF("t")
      .select(TextFns.charShingles(col("t"), 3).as("s"))
      .head.getSeq[String](0)
    assert(row == Seq("abc", "bca", "cab"))
  }

  test("word shingles join consecutive tokens") {
    val row = Seq(Seq("a", "b", "c")).toDF("t")
      .select(TextFns.wordShingles(col("t"), 2).as("s"))
      .head.getSeq[String](0)
    assert(row == Seq("a b", "b c"))
  }

  test("tfidf ranks at most 3 terms per doc, rank deterministic") {
    val out = operators.TextOps.tfidf(spark, sf)
    val perDoc = out.groupBy("doc_id").count().agg(max("count")).head.getLong(0)
    assert(perDoc <= 3)
  }

  test("dictionary ids are dense from 0") {
    val ids = operators.TextOps.dictionary(spark, sf)
      .select("token_id").as[Long].collect().sorted
    assert(ids.headOption.contains(0L))
    assert(ids.sameElements(ids.indices.map(_.toLong)))
  }

  test("langid covers every document exactly once in the confusion matrix") {
    val n = operators.TextOps.langId(spark, sf)
      .agg(sum("n_docs")).head.getLong(0)
    assert(n == Tables.documents(spark, sf).count())
  }

  test("misra-gries heavy hitters: estimates are lower bounds; exact at large k") {
    import graft.operators.TextOps
    import graft.plans.WordNGrams
    val toks = TextFns.tokens(col("text"))
    val exact = Tables.documents(spark, sf)
      .select(explode(WordNGrams(toks, 3, distinct = false)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    // small k: every reported weight is a valid lower bound on the
    // true count (the MG invariant survives the per-partition merge)
    val sketch = TextOps.heavyHitterGrams(spark, sf, mgK = 32, topN = 50)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(sketch.nonEmpty)
    sketch.foreach { case (g, est) =>
      assert(est <= exact(g), s"gram '$g' est $est > true ${exact(g)}")
    }
    // k >= distinct grams per partition: MG never evicts, so the
    // sketch degenerates to the exact top-N (plumbing correctness)
    val full = TextOps.heavyHitterGrams(spark, sf, mgK = 1 << 20, topN = 10)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val trueTop = exact.toSeq.sortBy { case (g, c) => (-c, g) }.take(10)
    assert(full.toSeq == trueTop)
  }

  test("bm25 returns a descending top-10 with positive scores and dense ranks") {
    val rows = operators.TextOps.bm25(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.map(_.getLong(2)).toSeq == (1L to 10L))
    val scores = rows.map(_.getDouble(1))
    assert(scores.forall(_ > 0))
    assert(scores.sameElements(scores.sortBy(-_)))
  }

  test("q193 nfc: planting arithmetic is ground truth; NFC is idempotent; ASCII is fixed") {
    import operators.TextOps
    val ids = Tables.documents(spark, sf).select("doc_id").collect()
      .map(_.getLong(0))
    val rows = TextOps.unicodeNorm(spark, sf).collect()
    // changed docs == docs that received a plant (ASCII corpus is an
    // NFC fixed point — equality also PROVES that)
    val expectedChanged = ids.count(id =>
      id % TextOps.NfcMod1 == 0 || id % TextOps.NfcMod2 == 0)
    assert(rows.map(_.getLong(2)).sum == expectedChanged)
    assert(expectedChanged > 0)
    // each plant carries exactly 2 combining marks -> 2 cps saved
    val expectedSaved = 2L * ids.count(_ % TextOps.NfcMod1 == 0) +
      2L * ids.count(_ % TextOps.NfcMod2 == 0)
    assert(rows.map(_.getLong(3)).sum == expectedSaved)
    // the plants really are decomposed in source (no editor silently
    // composed them), and NFC composes + is idempotent
    import java.text.Normalizer
    assert(Normalizer.normalize(TextOps.NfcPlant1, Normalizer.Form.NFC)
      != TextOps.NfcPlant1)
    val once = Normalizer.normalize(TextOps.NfcPlant2, Normalizer.Form.NFC)
    assert(Normalizer.normalize(once, Normalizer.Form.NFC) == once)
  }
}
