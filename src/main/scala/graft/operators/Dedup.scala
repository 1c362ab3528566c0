package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.{TextFns, VecFns}
import graft.plans.SimHash64

/** Deduplication operator block over the `documents` corpus — the
  * large-scale training-data ops (exact, n-gram Jaccard, MinHash+LSH,
  * SimHash, embedding-cosine). The reference dedups driver-side with
  * pandas keep-first (/root/reference/redshells/data/
  * data_frame_utils.py:31,47); here every variant is a distributed
  * plan whose joins are inverted-index/bucket joins, never O(n²)
  * cross products.
  */
object Dedup {

  /** Canonical text form shared by exact-dedup variants. */
  private def normText: Column =
    regexp_replace(lower(trim(col("text"))), "\\s+", " ")

  private def toks = TextFns.tokens(col("text"))

  /** Exact dedup: hash-groupBy on normalized text. Keeps the min
    * doc_id per cluster (deterministic keep-first). One shuffle on
    * the 128-bit digest; at 100 TB the shuffle carries (hash, id)
    * pairs, never the text. */
  def exact(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), md5(normText).as("content_hash"))
      .groupBy(col("content_hash"))
      .agg(
        min(col("doc_id")).as("keep_doc_id"),
        count(lit(1)).as("cluster_size"))
      .orderBy(col("content_hash"))

  /** Per-doc distinct word-3-shingle set (the unit of Jaccard). */
  private def shingled(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), TextFns.wordShingles(toks, 3).as("shingles"))

  /** n-gram Jaccard near-dup via shingle inverted index: explode
    * shingles → self-join on the shingle (equi-join, shuffles on the
    * shingle key) → per-pair intersection counts → Jaccard from
    * |A|+|B|−|A∩B|. The candidate set is only pairs sharing ≥1
    * shingle. At 100 TB you'd additionally cap hot shingles (drop
    * shingles occurring in >p% of docs) — same plan shape. */
  def jaccard(spark: SparkSession, dir: String): DataFrame = {
    val sh = shingled(spark, dir)
      .select(col("doc_id"), explode(col("shingles")).as("sh"))
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = sh.as("a")
      .join(sh.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    pairs
      .join(sizes.as("sa"), col("doc_a") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("doc_b") === col("sb.doc_id"))
      .withColumn("jaccard", round(
        col("inter").cast("double") /
          (col("sa.n_sh") + col("sb.n_sh") - col("inter")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash + LSH (Broder 1997): K=64 signature from one xxhash64
    * base hash per shingle expanded by 64 affine derivations; 16
    * bands × 4 rows; docs sharing a band bucket become candidates;
    * candidates verified with exact set Jaccard (array_intersect on
    * the per-doc shingle arrays — row-local, no second shuffle pass
    * over the corpus). Probabilistic → rows-only check; recall vs
    * exact Jaccard asserted in DedupSpec. */
  def minhash(spark: SparkSession, dir: String): DataFrame = {
    val K = 64
    val r = 4 // rows per band → 16 bands
    val docs = shingled(spark, dir)
    // base hash reduced mod p so the affine family (2i+1)·x + i·c
    // stays within long range under ANSI arithmetic (no overflow).
    val p = 1000000007L
    val sh = docs.select(col("doc_id"), explode(col("shingles")).as("sh"))
      .withColumn("x", pmod(xxhash64(col("sh")), lit(p)))
    val hashes = sh.select(
      col("doc_id"),
      posexplode(transform(
        sequence(lit(0), lit(K - 1)),
        i => pmod(
          col("x") * (i.cast("long") * 2 + 1) + i.cast("long") * lit(2654435761L),
          lit(p)))))
      .toDF("doc_id", "i", "h")
    val sig = hashes.groupBy(col("doc_id"), col("i")).agg(min(col("h")).as("mh"))
    val bands = sig
      .withColumn("band", (col("i") / r).cast("int"))
      .groupBy(col("doc_id"), col("band"))
      .agg(md5(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("mh")))),
          s => s.getField("mh").cast("string")))).as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docs.select(col("doc_id").as("doc_a"), col("shingles").as("sha")), "doc_a")
      .join(docs.select(col("doc_id").as("doc_b"), col("shingles").as("shb")), "doc_b")
      .withColumn("jaccard", round(
        size(array_intersect(col("sha"), col("shb"))).cast("double") /
          size(array_union(col("sha"), col("shb"))), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** SimHash near-dup: 64-bit signature per doc via the native
    * SimHash64 Expression, then 4×16-bit band bucketing (pigeonhole:
    * Hamming ≤ 3 ⟹ at least one equal band) and an exact Hamming
    * check on candidates. */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val sigs = Tables.documents(spark, dir)
      .select(col("doc_id"), SimHash64(toks).as("sig"))
    val bandCols = array((0 until 4).map { j =>
      struct(lit(j).as("band"),
        shiftrightunsigned(col("sig"), j * 16).bitwiseAND(lit(0xffffL)).as("key"))
    }: _*)
    val bands = sigs
      .select(col("doc_id"), col("sig"), explode(bandCols).as("bk"))
      .select(col("doc_id"), col("sig"),
        col("bk.band").as("band"), col("bk.key").as("band_key"))
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(
        col("a.doc_id").as("doc_a"), col("a.sig").as("sig_a"),
        col("b.doc_id").as("doc_b"), col("b.sig").as("sig_b"))
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("long").as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** Embedding-cosine near-dup via multi-table random-hyperplane LSH:
    * 12 tables × 6 hyperplanes → 12 6-bit bucket keys per vector;
    * pairs colliding in ANY table become candidates; only candidates
    * get the exact cosine. Multi-table trades a constant factor of
    * shuffle volume for recall — at a real near-dup threshold
    * (cos ≥ 0.9, sign-agreement p ≈ 0.9) recall is ≈1−(1−p⁶)¹² > 0.99;
    * the synthetic corpus is near-orthogonal (max cos ≈ 0.5) so the
    * spec asserts recall against the brute-force baseline instead of
    * an oracle. */
  def embedNearDup(spark: SparkSession, dir: String): DataFrame = {
    val nTables = 12
    val bitsPerTable = 6
    val planes = Dedup.hyperplanes(nPlanes = nTables * bitsPerTable, dim = 64, seed = 42)
    val emb = Tables.embeddings(spark, dir)
    val tableCols = array((0 until nTables).map { t =>
      val bucket = (0 until bitsPerTable).map { j =>
        val pc = array(planes(t * bitsPerTable + j).map(lit): _*)
        when(VecFns.dot(col("embedding"), pc) > 0, 1 << j).otherwise(0)
      }.reduce(_ + _)
      struct(lit(t).as("t"), bucket.as("bucket"))
    }: _*)
    val bucketed = emb
      .select(col("vec_id"), col("embedding"), explode(tableCols).as("tb"))
      .select(col("vec_id"), col("embedding"),
        col("tb.t").as("t"), col("tb.bucket").as("bucket"))
    bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.t") === col("b.t") && col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.embedding").as("ea"), col("b.embedding").as("eb"))
      .dropDuplicates("vec_a", "vec_b")
      .withColumn("cos", round(VecFns.cosine(col("ea"), col("eb")), 6))
      .filter(col("cos") >= 0.4)
      .select(col("vec_a"), col("vec_b"), col("cos"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  /** Seed-fixed pseudo-random unit-free hyperplanes (deterministic
    * across JVMs: scala.util.Random is a fixed LCG). */
  def hyperplanes(nPlanes: Int, dim: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(nPlanes, dim)(rnd.nextGaussian())
  }
}
