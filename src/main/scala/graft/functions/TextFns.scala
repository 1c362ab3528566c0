package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text primitives shared by the text-analysis and dedup operator
  * blocks. Everything here is pure `functions._` composition —
  * codegen'd, no UDFs — so the hot path of a 100 TB text scan stays
  * inside WholeStageCodegen.
  *
  * Reference behavior: tokenization mirrors the whitespace
  * tokenization feeding redshells' dictionary/TF-IDF stack
  * (/root/reference/redshells/train/utils/token_iterator.py).
  */
object TextFns {

  /** Whitespace tokenizer (the BPE-ish regex fallback for corpora
    * without pre-tokenization). NFC normalization runs FIRST — the
    * CCNet/Dolma ingest ordering — so every downstream token hash,
    * shingle, and fingerprint sees one canonical form of "café"
    * regardless of how the crawl encoded it (graft.plans.NfcExprs;
    * ASCII fast-path, so the gate corpora are bit-identical). Every
    * oracle fragment mirrors this with DuckDB `nfc_normalize` —
    * OracleDisciplineSpec enforces the pairing. */
  def tokens(text: Column): Column =
    split(trim(graft.plans.NfcExprs.nfcNormalize(text)), "\\s+")

  /** Word-level tokenization on lowercased alphanumerics. */
  def words(text: Column): Column =
    filter(split(lower(text), "[^a-z0-9]+"), w => length(w) > 0)

  /** Token count without exploding — array length, zero shuffle. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Count of tokens that belong to `set` (higher-order filter — per
    * row, no explode/shuffle). */
  def countIn(toks: Column, set: Seq[String]): Column =
    size(filter(toks, t => t.isin(set.map(x => x: Any): _*))).cast("long")

  /** Character n-gram shingles of a string (for Jaccard/MinHash). */
  def charShingles(text: Column, n: Int): Column = {
    val t = trim(text)
    array_distinct(transform(
      sequence(lit(0), greatest(length(t) - n, lit(0))),
      i => substring(t, lit(1) + i, lit(n))))
  }

  /** Word n-gram shingles, joined by a space. Native Expression —
    * the higher-order formulation (transform+slice+concat_ws) runs
    * interpreted and dominated dedup profiles; see
    * graft.plans.WordNGrams. */
  def wordShingles(toks: Column, n: Int): Column =
    graft.plans.WordNGrams(toks, n)

  /** English-ish stopwords present in the synthetic corpus. */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
}
