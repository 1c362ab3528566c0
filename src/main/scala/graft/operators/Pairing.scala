package graft.operators

/** Candidate-pair bucketing policy shared by the pair-feature
  * pipelines (q43 pairwiseSimilarity, q64 featureAggSimilarity):
  * candidate pairs are the pairs sharing pmod(id, K). With K buckets
  * over n ids the expected bucket width is n/K, pairs per bucket
  * O((n/K)²/2), total candidates O(n²/2K) — so K must GROW with the
  * corpus to keep the candidate set linear. This policy scales K so
  * the expected bucket width stays ≤ targetWidth: total candidates ≈
  * n·targetWidth/2, linear at any corpus size, and each bucket's
  * pair explosion is bounded (no single-task blowup at 100 TB).
  *
  * The floor of 25 pins the test-SF behavior: every driver corpus
  * (n ≤ 6400) yields exactly the fixed 25-bucket candidate set the
  * round-1/2 specs and oracles were built against.
  */
object Pairing {
  def buckets(corpusSize: Long, targetWidth: Int = 256): Int =
    math.max(25L, corpusSize / targetWidth).toInt
}
