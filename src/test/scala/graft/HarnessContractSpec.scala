package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract invariants of the parity surface itself: a
  * duplicate query name would silently collapse in the Map (one of the
  * two implementations would never be verified), an oracle without a
  * query would never run, and a malformed name would break the driver's
  * reporting. Cheap, and exactly the class of bug a 94-query surface
  * grows by copy-paste. */
class HarnessContractSpec extends AnyFunSuite with SparkTestBase {

  test("query names are unique, well-formed, and every oracle has a query") {
    val names = SparkEntry.allSpecs.map(_.name)
    val dups = names.groupBy(identity).collect { case (n, g) if g.size > 1 => n }
    assert(dups.isEmpty, s"duplicate query names: $dups")
    names.foreach(n => assert(n.matches("q\\d+_[a-z0-9_]+"), s"malformed name: $n"))
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.queries.size === names.size)
  }

  test("driver smoke contract: entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }
}
