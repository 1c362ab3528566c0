package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.Tables
import graft.functions.TextFns
import graft.plans.RollingHash

/** Text-analysis operator block — the Spark-native re-expression of
  * the reference's dictionary/TF-IDF stack
  * (/root/reference/redshells/train/train_dictionary.py,
  * /root/reference/redshells/model/tfidf.py) plus the text-quality /
  * language-ID / fingerprint ops a training-data pipeline needs.
  */
object TextOps {

  private def toks = TextFns.tokens(col("text"))

  /** Per-language token statistics. No explode: token counts are
    * array lengths computed row-local, then a tiny groupBy on lang. */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("lang"), TextFns.tokenCount(col("text")).as("n_tokens"))
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tokens")).as("total_tokens"),
        (sum(col("n_tokens")).cast("double") / count(lit(1))).as("avg_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("lang"))

  /** Quality scoring per source: stopword ratio (pooled — exact
    * integer sums, one final division, so the result is
    * order-independent) and short-doc counts. Everything before the
    * final small groupBy is row-local higher-order functions. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = Tables.documents(spark, dir).select(
      col("source"),
      TextFns.tokenCount(col("text")).as("n_tok"),
      TextFns.countIn(toks, TextFns.Stopwords).as("n_stop"))
    perDoc.groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_tok")).as("total_tokens"),
        (sum(col("n_stop")).cast("double") / sum(col("n_tok"))).as("stop_ratio"),
        sum(when(col("n_tok") < 60, 1L).otherwise(0L)).as("n_short"))
      .orderBy(col("source"))
  }

  /** Corpus term statistics (tf + df) — the one place explode is the
    * right tool; two-level aggregation combines map-side so the
    * shuffle carries (term, partial) not (term, doc). */
  def topTerms(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("tf"), countDistinct(col("doc_id")).as("df"))
      .orderBy(col("tf").desc, col("term"))
      .limit(20)

  /** TrainDictionary (train/train_dictionary.py:9, gensim
    * filter_extremes): vocabulary filtered to df ∈ [5, 0.9·N], ids
    * assigned deterministically by (df desc, term asc). The global
    * row_number window runs on the already-tiny vocab table, not the
    * corpus. */
  def dictionary(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val df = docs.select(col("doc_id"), explode(toks).as("term"))
      .groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    df.crossJoin(broadcast(nDocs))
      .filter(col("df") >= 5 && col("df") <= lit(0.9) * col("n_docs"))
      .select(col("term"), col("df"),
        (row_number().over(Window.orderBy(col("df").desc, col("term"))) - 1)
          .cast("long").as("token_id"))
      .orderBy(col("token_id"))
  }

  /** Tfidf.apply (model/tfidf.py:19): tf·idf with gensim's
    * log2(N/df) idf and the keep-top-rate cut re-expressed as a
    * per-doc top-3 rank. df/idf is a vocab-sized table broadcast back
    * against the (doc, term) tf aggregate — the corpus shuffles once,
    * on (doc_id, term). Values rounded to 6dp so ranking and output
    * are stable across engines. */
  def tfidf(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val terms = docs.select(col("doc_id"), explode(toks).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("tf"))
    val df = terms.groupBy(col("term")).agg(countDistinct(col("doc_id")).as("df"))
    val scored = tf
      .join(broadcast(df.crossJoin(broadcast(nDocs))), Seq("term"))
      .withColumn("tfidf",
        round(col("tf") * log2(col("n_docs").cast("double") / col("df")), 6))
    scored
      .withColumn("rank",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("tfidf").desc, col("term"))).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("tfidf"), col("rank"))
      .orderBy(col("doc_id"), col("rank"))
  }

  /** BPE-ish token counting: the subword-style regex pass (runs of
    * letters, runs of digits, single punctuation) a training pipeline
    * uses for budget accounting. regexp_count is codegen'd — one scan,
    * no explode; per-source totals only shuffle the tiny group keys. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("source"),
        regexp_count(col("text"), lit("[a-z]+|[0-9]+|[^a-z0-9\\s]")).cast("long")
          .as("n_bpe"),
        TextFns.tokenCount(col("text")).as("n_ws"))
      .groupBy(col("source"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_bpe")).as("total_bpe_tokens"),
        sum(col("n_ws")).as("total_ws_tokens"),
        (sum(col("n_bpe")).cast("double") / sum(col("n_ws"))).as("bpe_per_word"))
      .orderBy(col("source"))

  /** Language-ID by stopword-profile vote: profile table is broadcast
    * against exploded tokens; prediction = argmax hits per doc;
    * output is the lang × predicted confusion matrix. Rows-only check
    * (the heuristic itself isn't ANSI-SQL-portable). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val profiles = Seq(
      ("en", "the"), ("en", "a"), ("en", "of"), ("en", "and"), ("en", "is"),
      ("fr", "le"), ("fr", "la"), ("fr", "et"), ("fr", "les"), ("fr", "des"),
      ("es", "el"), ("es", "la"), ("es", "de"), ("es", "y"), ("es", "los"),
      ("de", "der"), ("de", "die"), ("de", "und"), ("de", "das"), ("de", "ist"),
    ).toDF("plang", "word")
    val docs = Tables.documents(spark, dir)
    val hits = docs.select(col("doc_id"), col("lang"), explode(toks).as("word"))
      .join(broadcast(profiles), Seq("word"))
      .groupBy(col("doc_id"), col("lang"), col("plang"))
      .agg(count(lit(1)).as("hits"))
    val best = hits.withColumn("rn",
        row_number().over(Window.partitionBy(col("doc_id"))
          .orderBy(col("hits").desc, col("plang"))))
      .filter(col("rn") === 1)
      .select(col("doc_id"), col("lang"), col("plang").as("predicted"))
    docs.select(col("doc_id"), col("lang"))
      .join(best.drop("lang"), Seq("doc_id"), "left")
      .na.fill("unknown", Seq("predicted"))
      .groupBy(col("lang"), col("predicted"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("predicted"))
  }

  /** Document fingerprinting with the native rolling-hash Expression
    * (plans/RollingHash.scala) — codegen'd polynomial hash, plus the
    * duplicate-cluster size per fingerprint. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame = {
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"), RollingHash(col("text")).as("fp"))
    val clusters = fp.groupBy(col("fp")).agg(count(lit(1)).as("cluster_size"))
    fp.join(clusters, Seq("fp"))
      .select(col("doc_id"), col("fp"), col("cluster_size"))
      .orderBy(col("doc_id"))
  }
}
