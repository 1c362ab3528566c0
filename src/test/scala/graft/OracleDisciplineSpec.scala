package graft

import org.scalatest.funsuite.AnyFunSuite

/** Executable shared-rule discipline for the oracle SQL surface:
  * every DuckDB fragment that tokenizes or canonicalizes raw `text`
  * must run `nfc_normalize` FIRST, mirroring the NFC front wired
  * into TextFns.tokens and Dedup.normText (round 7). A future
  * fragment written without the mirror would silently diverge from
  * the Spark side on any non-ASCII corpus — this spec turns the
  * pairing into a compile-ish gate instead of a review convention.
  */
class OracleDisciplineSpec extends AnyFunSuite {

  // the two ingest-entry shapes a fragment may take; z-renamed
  // compositions (lever d) rename the column but keep the function
  // nest, so a whole-word column rename still matches here.
  private val splitNoNfc = """string_split_regex\(trim\((?!nfc_normalize\()""".r
  private val normNoNfc = """regexp_replace\(lower\(trim\((?!nfc_normalize\()""".r

  test("every oracle tokenizer/normalizer fragment applies nfc_normalize first") {
    val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      val bad =
        splitNoNfc.findFirstIn(sql).map(m => s"$name: $m...") ++
          normNoNfc.findFirstIn(sql).map(m => s"$name: $m...")
      bad
    }
    assert(offenders.isEmpty,
      s"oracle fragments tokenizing raw text without nfc_normalize:\n${offenders.mkString("\n")}")
  }

  test("the NFC-fronted fragments actually exist (the check is not vacuous)") {
    val n = SparkEntry.oracleSql.values
      .count(_.contains("string_split_regex(trim(nfc_normalize("))
    assert(n >= 40, s"expected >=40 NFC-fronted tokenizer fragments, found $n")
  }

  test("every char-fold feeds ord() only through the empty-char guard") {
    // DuckDB: string_split('', '') = [''] and ord('') = -1, so a raw
    // list_transform(string_split(x, ''), c -> ord(c)) poisons the
    // poly-31 fold on EMPTY strings (-1 vs the Spark kernel's 0 —
    // found by the round-8 degenerate full-surface sweep: q26/q171/
    // q175/q182/q193 split). The canonical spelling wraps the split
    // in list_filter(..., fc -> fc != '') — a no-op on every
    // non-empty string, identity 0 on the empty one, matching the
    // Spark fold over zero chars. This pins the spelling so a new
    // fragment written without the guard fails the suite.
    val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      val flat = sql.replaceAll("\\s+", " ")
      if (flat.contains("list_transform(string_split(")) Some(name) else None
    }
    assert(offenders.isEmpty,
      s"oracle char-folds missing the empty-char guard: ${offenders.mkString(", ")}")
    val guarded = SparkEntry.oracleSql.values.count(
      _.replaceAll("\\s+", " ")
        .contains("list_transform(list_filter(string_split("))
    assert(guarded >= 12, s"expected >=12 guarded char-folds, found $guarded")
  }

  test("every click-payload extraction is THE canonical fragment (no copy drift)") {
    // the item rule mirrors WordItemApp.itemFromProps (get_json_object
    // '$.k'); its SQL mirror appears in several oracles as a literal —
    // this pins every copy to the one canonical spelling, so an edit
    // to any single copy fails the suite instead of silently forking
    // the extraction rule
    val canon =
      """CAST(NULLIF(regexp_extract(props, '"k": (\d+)', 1), '') AS BIGINT)"""
    val offenders = SparkEntry.oracleSql.flatMap { case (name, sql) =>
      sql.linesIterator.filter(_.contains("regexp_extract(props"))
        .filterNot(_.contains(canon))
        .map(l => s"$name: ${l.trim.take(90)}")
    }
    assert(offenders.isEmpty,
      s"non-canonical click extraction:\n${offenders.mkString("\n")}")
    val n = SparkEntry.oracleSql.values.count(_.contains(canon))
    assert(n >= 8, s"expected >=8 canonical click extractions, found $n")
  }
}
