package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew handling for hot join keys.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most
  * cases at runtime; `saltedJoin` is the explicit form for when the
  * skew is known up front (e.g. a null-heavy or celebrity key): the
  * fact side gets a random-ish but DETERMINISTIC salt (hash of a
  * second column, not rand() — reproducible retries), the dimension
  * side is exploded ×salt, and the join key becomes (key, salt), so
  * one hot key spreads over `buckets` reducers.
  */
object Skew {

  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      saltSource: Column, buckets: Int): DataFrame = {
    require(buckets >= 1, s"saltedJoin: buckets must be >= 1, got $buckets")
    val salted = fact.withColumn("__salt", pmod(hash(saltSource), lit(buckets)))
    val expanded = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(buckets - 1))))
    salted.join(expanded, Seq(key, "__salt")).drop("__salt")
  }
}
