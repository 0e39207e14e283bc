package graft.engine

import org.scalatest.funsuite.AnyFunSuite
import scala.collection.immutable.ListMap
import Mutations.{Op => M}

/** Unit tests pinning the expression-layer quirks the engine must
  * reproduce exactly (SURVEY.md E2/E12/E15 + §7.3 "must not use bare
  * Catalyst cast/===").
  */
class ExprSpec extends AnyFunSuite {

  // ===== E12 coercions (Mutation.coerceBackToType) =====

  test("string->int coercion errors on garbage instead of nulling") {
    assert(Mutations.apply(1, "5", M.ASSIGN, VarType.INT) == 5)
    intercept[LHCastError](Mutations.apply(1, "abc", M.ASSIGN, VarType.INT))
  }

  test("null coerces to empty string for STRING vars") {
    assert(Mutations.toStr(null) == "")
  }

  test("bool coercion: Java Boolean.valueOf semantics") {
    assert(Mutations.apply(false, "true", M.ASSIGN, VarType.BOOLEAN) == true)
    assert(Mutations.apply(false, "TRUE", M.ASSIGN, VarType.BOOLEAN) == true)
    // anything else is false, not an error (Boolean.valueOf)
    assert(Mutations.apply(false, "yes", M.ASSIGN, VarType.BOOLEAN) == false)
    intercept[LHCastError](Mutations.apply(false, 1, M.ASSIGN, VarType.BOOLEAN))
  }

  test("JSON-string coerces to ARRAY/OBJECT; garbage errors") {
    assert(Mutations.apply(null, "[1,2]", M.ASSIGN, VarType.ARRAY) ==
      Vector(1, 2))
    assert(Mutations.apply(null, """{"a":1}""", M.ASSIGN, VarType.OBJECT) ==
      ListMap("a" -> 1))
    intercept[VarSubError](
      Mutations.apply(null, "not json", M.ASSIGN, VarType.ARRAY))
  }

  test("int arithmetic truncates toward zero through double") {
    // -7 / 2 = -3.5 -> -3 (toward zero, not floor)
    assert(Mutations.apply(-7, 2, M.DIVIDE, VarType.INT) == -3)
    assert(Mutations.apply(7, -2, M.DIVIDE, VarType.INT) == -3)
    assert(Mutations.apply(3, 2, M.MULTIPLY, VarType.INT) == 6)
    assert(Mutations.apply(3.9, 1, M.SUBTRACT, VarType.INT) == 2) // 2.9 -> 2
  }

  test("divide by zero is an error, not null/NaN") {
    intercept[VarSubError](Mutations.apply(1, 0, M.DIVIDE, VarType.INT))
    intercept[VarSubError](Mutations.apply(1.0, 0.0, M.DIVIDE, VarType.FLOAT))
  }

  test("ADD dispatch: int add, string concat, array append; bool/object error") {
    assert(Mutations.apply(1, 2, M.ADD, VarType.INT) == 3)
    assert(Mutations.apply("a", "b", M.ADD, VarType.STRING) == "ab")
    assert(Mutations.apply(Vector(1), 2, M.ADD, VarType.ARRAY) == Vector(1, 2))
    // float add keeps IEEE noise (reference check: 3.2 - 2.5)
    assert(Mutations.apply(3.2, -2.5, M.ADD, VarType.FLOAT) ==
      0.7000000000000002)
    intercept[VarSubError](Mutations.apply(true, true, M.ADD, VarType.BOOLEAN))
    intercept[VarSubError](
      Mutations.apply(ListMap("a" -> 1), 1, M.ADD, VarType.OBJECT))
  }

  test("EXTEND requires a list RHS") {
    assert(Mutations.apply(Vector(1), Vector(2, 3), M.EXTEND, VarType.ARRAY) ==
      Vector(1, 2, 3))
    intercept[VarSubError](
      Mutations.apply(Vector(1), 2, M.EXTEND, VarType.ARRAY))
  }

  test("REMOVE_IF_PRESENT removes all equal elements; REMOVE_INDEX removes by value") {
    assert(Mutations.apply(Vector(4, 1, 4, 2, 4), 4, M.REMOVE_IF_PRESENT,
      VarType.ARRAY) == Vector(1, 2))
    // reference's List.remove(Object): first equal element only, no-op on miss
    assert(Mutations.apply(Vector(5, 2, 2), 2, M.REMOVE_INDEX,
      VarType.ARRAY) == Vector(5, 2))
    assert(Mutations.apply(Vector(5), 9, M.REMOVE_INDEX, VarType.ARRAY) ==
      Vector(5))
  }

  test("REMOVE_KEY uses strict key equality: numeric rhs is a no-op") {
    val m = ListMap[String, Any]("1234" -> "x", "k" -> 1)
    assert(Mutations.apply(m, 1234, M.REMOVE_KEY, VarType.OBJECT) == m)
    assert(Mutations.apply(m, "1234", M.REMOVE_KEY, VarType.OBJECT) ==
      ListMap("k" -> 1))
  }

  // ===== E15 comparisons =====

  test("equality is strict Java equals: 1 != 1.0") {
    assert(!Mutations.eq(1, 1.0))
    assert(Mutations.eq(1, 1))
    assert(Mutations.eq("a", "a"))
    assert(!Mutations.eq(null, "a"))
    assert(Mutations.eq(null, null))
  }

  test("cross-type compare is an error (thread failure), not coercion") {
    assert(Mutations.compare(1, 2) < 0)
    assert(Mutations.compare("b", "a") > 0)
    intercept[VarSubError](Mutations.compare("10", 10))
    intercept[VarSubError](Mutations.compare(1, 1.5))
    // Int↔Long: reference Integer.compareTo((Comparable)Long) throws
    // ClassCastException → VarSubOrzDash; LHJson decodes >2^31 JSON ints
    // as Long, so this edge must fail the thread, not coerce
    intercept[VarSubError](Mutations.compare(1, 4000000000L))
    intercept[VarSubError](Mutations.compare(4000000000L, 1))
    assert(Mutations.compare(4000000000L, 5000000000L) < 0)
  }

  test("IN/NOT_IN: haystack must be a collection; strict element equality") {
    assert(Mutations.contains(Vector(1, 2, 3), 2))
    assert(!Mutations.contains(Vector(1, 2, 3), 2.0)) // 2 != 2.0
    intercept[VarSubError](Mutations.contains("not a list", 1))
    intercept[VarSubError](Mutations.contains(null, 1))
    // null element hit during the scan NPEs in the reference's
    // thing.equals(right) loop → VarSubOrzDash; a match found BEFORE
    // the null short-circuits, mirroring the in-order Java loop
    intercept[VarSubError](Mutations.contains(Vector(1, null, 3), 3))
    assert(Mutations.contains(Vector(1, null, 3), 1))
  }

  // ===== E2 jsonpath =====

  test("jsonpath reads nested fields, array indexes, quoted keys") {
    val json = """{"a": {"b": [10, {"c": true}]}, "x y": 5}"""
    assert(JsonPath.read(json, "$.a.b[0]") == 10)
    assert(JsonPath.read(json, "$.a.b[1].c") == true)
    assert(JsonPath.read(json, "$['x y']") == 5)
    assert(JsonPath.read(json, "$") == LHJson.parse(json))
  }

  test("jsonpath errors on miss (unlike Spark's get_json_object)") {
    intercept[VarSubError](JsonPath.read("""{"a":1}""", "$.missing"))
    intercept[VarSubError](JsonPath.read("""[1,2]""", "$[5]"))
    intercept[VarSubError](JsonPath.read("""{"a":1}""", "$.a.b")) // scalar deref
    intercept[VarSubError](JsonPath.read("not json", "$.a"))
  }

  test("jsonpath deep scan and wildcard follow jayway list semantics") {
    val json = """{"k":1,"a":{"k":2,"b":[{"k":3},4]},"c":[[{"k":5}]]}"""
    // preorder walk: object's own match first, then descend in order
    assert(JsonPath.read(json, "$..k") == Vector(1, 2, 3, 5))
    // deep scan that matches nothing → empty list, NOT an error
    assert(JsonPath.read(json, "$..nope") == Vector())
    assert(JsonPath.read(json, "$.a.b[*]") ==
      Vector(ListMap("k" -> 3), 4))
    // object wildcard yields values in insertion order
    assert(JsonPath.read(json, "$.a.*") ==
      Vector(2, Vector(ListMap("k" -> 3), 4)))
    // branch misses after the fan-out are skipped, not errors
    assert(JsonPath.read(json, "$.a.b[*].k") == Vector(3))
    assert(JsonPath.read(json, "$..b") == Vector(Vector(ListMap("k" -> 3), 4)))
    // indexing into each fanned-out branch
    assert(JsonPath.read(json, "$.c[*][0]") == Vector(ListMap("k" -> 5)))
    // wildcard on a scalar in a DEFINITE context still errors
    intercept[VarSubError](JsonPath.read(json, "$.k[*]"))
    intercept[VarSubError](JsonPath.read(json, "$..*"))
  }

  // ===== E17 unsplat + objToString =====

  test("unsplat: map stays, JSON-object string parses, scalar wraps") {
    assert(LHJson.unsplat(ListMap("k" -> 1)) == ListMap("k" -> 1))
    assert(LHJson.unsplat("""{"k": 1}""") == ListMap("k" -> 1))
    assert(LHJson.unsplat("plain") == ListMap("" -> "plain"))
    assert(LHJson.unsplat(42) == ListMap("" -> 42))
  }

  test("objToString: strings unquoted, containers as JSON, doubles Java-style") {
    assert(LHJson.objToString("hi") == "hi")
    assert(LHJson.objToString(null) == "null")
    assert(LHJson.objToString(ListMap("a" -> 1)) == """{"a":1}""")
    assert(LHJson.objToString(Vector(1, 2)) == "[1,2]")
    assert(LHJson.objToString(0.7000000000000002) == "0.7000000000000002")
    assert(LHJson.objToString(5.0) == "5.0")
  }

  test("stringToObj: parse if valid JSON else identity") {
    assert(LHJson.stringToObj("123") == 123)
    assert(LHJson.stringToObj("true") == true)
    assert(LHJson.stringToObj("Hello, there!") == "Hello, there!")
    assert(LHJson.stringToObj("""{"a":[1,2.5]}""") ==
      ListMap("a" -> Vector(1, 2.5)))
  }
}
