package graft

import graft.json.{DiffEntry, JsonDiff}
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}

class JsonDiffSpec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("single field modified (ref test.json shape)") {
    val prev = """{"id":"TRD1000","symbol":"AAPL","price":10.32,"version":1}"""
    val curr = """{"id":"TRD1000","symbol":"AAPL","price":11.00,"version":2}"""
    assert(JsonDiff.diffJson(prev, curr) === Seq(
      DiffEntry("price", "MODIFIED", "10.32", "11.0"),
      DiffEntry("version", "MODIFIED", "1", "2")))
  }

  test("added and removed fields") {
    val d = JsonDiff.diffJson("""{"a":1,"b":2}""", """{"a":1,"c":3}""")
    assert(d === Seq(
      DiffEntry("b", "REMOVED", "2", null),
      DiffEntry("c", "ADDED", null, "3")))
  }

  test("identical resend yields empty diff (ref :109-111)") {
    val j = """{"id":"TRD1","price":10.32}"""
    assert(JsonDiff.diffJson(j, j).isEmpty)
  }

  test("malformed / non-object input treated as empty") {
    assert(JsonDiff.flat("not json").isEmpty)
    assert(JsonDiff.flat("[1,2]").isEmpty)
    assert(JsonDiff.flat(null).isEmpty)
  }

  private val kvGen: Gen[Map[String, String]] = Gen.mapOf(Gen.zip(
    Gen.nonEmptyListOf(Gen.alphaChar).map(_.take(8).mkString),
    Gen.listOf(Gen.alphaNumChar).map(_.take(8).mkString)))

  test("property: diff(x, x) is empty") {
    check(Prop.forAll(kvGen) { m => JsonDiff.diff(m, m).isEmpty })
  }

  test("property: actions partition the key space, sorted by field") {
    check(Prop.forAll(kvGen, kvGen) { (a, b) =>
      val d = JsonDiff.diff(a, b)
      val byAction = d.groupBy(_.action).view.mapValues(_.map(_.field).toSet).toMap
      byAction.getOrElse("ADDED", Set.empty)    == (b.keySet -- a.keySet) &&
      byAction.getOrElse("REMOVED", Set.empty)  == (a.keySet -- b.keySet) &&
      byAction.getOrElse("MODIFIED", Set.empty) ==
        (a.keySet & b.keySet).filter(k => a(k) != b(k)) &&
      d.map(_.field) == d.map(_.field).sorted
    })
  }
}
