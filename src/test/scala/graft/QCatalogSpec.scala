package graft

import org.scalatest.funsuite.AnyFunSuite

/** Consistency guards over the query catalog itself: since round 4 every
  * query carries a DuckDB oracle (zero weaker rows-only checks), and the
  * driver keys results by name — a duplicate name would silently shadow a
  * query out of the correctness gate, and a missing oracle would downgrade
  * it. These are CI tripwires for future additions, not behavior tests.
  */
class QCatalogSpec extends AnyFunSuite {

  test("every query has a unique, well-formed name") {
    val names = SparkEntry.queries.keys.toSeq
    assert(names.nonEmpty)
    assert(names.distinct.size == names.size, "duplicate query names shadow each other in the Map")
    val malformed = names.filterNot(_.matches("^q\\d+_[a-z0-9_]+$"))
    assert(malformed.isEmpty, s"non-conforming query names: $malformed")
  }

  test("every query carries a DuckDB oracle (the all-machine-checked invariant)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracles would get only the weaker rows-only check: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracles for non-existent queries: $orphaned")
    val blank = SparkEntry.oracleSql.filter(_._2.trim.isEmpty).keys
    assert(blank.isEmpty, s"blank oracle SQL: $blank")
  }

  test("query numbering is dense enough to spot accidental drops") {
    val nums = SparkEntry.queries.keys.map(_.drop(1).takeWhile(_.isDigit).toInt).toSeq.sorted
    assert(nums.head == 1 && nums.last == nums.size,
      s"expected q1..q${nums.size} with no gaps, got range ${nums.head}..${nums.last} over ${nums.size} queries")
  }
}
