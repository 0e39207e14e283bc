package graft.engine

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode, JsonNodeFactory}
import scala.collection.immutable.ListMap
import scala.jdk.CollectionConverters._

/** Error raised by variable substitution / mutation / comparison — the
  * engine's equivalent of the reference's `VarSubOrzDash`
  * (reference: common/objects/rundata/VarSubOrzDash.java). Callers turn
  * it into a `VARIABLE_LOOKUP_ERROR` thread failure.
  */
final class VarSubError(msg: String, cause: Throwable = null)
  extends Exception(msg, cause)

/** Dynamically-typed JSON values, the engine's runtime representation of
  * workflow variables (reference: BaseSchema JSON + `Object`-typed
  * variables, see SURVEY.md §1.3).
  *
  * Encoding: `null | Boolean | Int | Long | Double | String |
  * Vector[Any] | ListMap[String, Any]` — immutable, insertion-ordered
  * objects. Integer JSON numbers that fit in 32 bits decode to `Int`
  * (mirroring Jackson's Integer), bigger ones to `Long`; decimals to
  * `Double`.
  *
  * IMPORTANT: engine code must compare values with `.equals`, never
  * Scala `==` on `Any` — Scala's cooperative numeric equality would make
  * `1 == 1.0` true where the reference (Java `Object.equals`) says false.
  */
object LHJson {
  private val mapper = new ObjectMapper()

  /** Parse a JSON document; throws on invalid input. */
  def parse(s: String): Any = fromNode(mapper.readTree(s))

  /** Reference `LHUtil.stringToObj` (LHUtil.java:167-177): parse if
    * possible, else return the raw string. */
  def stringToObj(s: String): Any =
    try parse(s)
    catch { case _: Exception => s }

  def fromNode(n: JsonNode): Any = {
    if (n == null || n.isNull || n.isMissingNode) null
    else if (n.isBoolean) n.booleanValue()
    else if (n.isInt) n.intValue()
    else if (n.isLong) n.longValue()
    else if (n.isNumber) n.doubleValue()
    else if (n.isTextual) n.textValue()
    else if (n.isArray) n.elements().asScala.map(fromNode).toVector
    else if (n.isObject) {
      var out = ListMap.empty[String, Any]
      n.properties().asScala.foreach { e =>
        out = out.updated(e.getKey, fromNode(e.getValue))
      }
      out
    } else throw new VarSubError(s"Unsupported JSON node: $n")
  }

  def toNode(v: Any): JsonNode = v match {
    case null => JsonNodeFactory.instance.nullNode()
    case b: Boolean => JsonNodeFactory.instance.booleanNode(b)
    case i: Int => JsonNodeFactory.instance.numberNode(i)
    case l: Long => JsonNodeFactory.instance.numberNode(l)
    case d: Double => JsonNodeFactory.instance.numberNode(d)
    case f: Float => JsonNodeFactory.instance.numberNode(f.toDouble)
    case s: String => JsonNodeFactory.instance.textNode(s)
    case xs: Seq[_] =>
      val arr = new ArrayNode(JsonNodeFactory.instance)
      xs.foreach(x => arr.add(toNode(x)))
      arr
    case m: scala.collection.Map[_, _] =>
      val obj = new ObjectNode(JsonNodeFactory.instance)
      m.foreach { case (k, x) => obj.set[JsonNode](String.valueOf(k), toNode(x)) }
      obj
    case other =>
      throw new IllegalArgumentException(s"Cannot render: ${other.getClass}")
  }

  /** Strict JSON rendering (maps AND lists become JSON). */
  def render(v: Any): String = mapper.writeValueAsString(toNode(v))

  /** Reference `LHUtil.objToString` (LHUtil.java:197-211): maps render
    * as JSON, scalars via `toString` (so a String stays unquoted). We
    * also JSON-render lists — the reference's Java `List.toString` is
    * only valid JSON for numeric lists, and every harness case that
    * jsonpaths into a list round-trips through this. */
  def objToString(v: Any): String = v match {
    case null => "null"
    case s: String => s
    case _: Seq[_] | _: scala.collection.Map[_, _] => render(v)
    case other => other.toString
  }

  /** Reference `LHUtil.unsplat` (LHUtil.java:113-133): map stays a map;
    * a JSON-object string parses to a map; anything else → {"": value}. */
  def unsplat(v: Any): ListMap[String, Any] = v match {
    case m: ListMap[_, _] => m.asInstanceOf[ListMap[String, Any]]
    case other =>
      try {
        parse(objToString(other)) match {
          case m: ListMap[_, _] => m.asInstanceOf[ListMap[String, Any]]
          case _ => ListMap("" -> other)
        }
      } catch { case _: Exception => ListMap("" -> other) }
  }
}

/** Jayway-compatible JSONPath evaluator (reference: LHUtil.jsonPath,
  * LHUtil.java:184-193 wraps jayway `JsonPath.parse(json).read(path)`):
  * definite steps `$`, `.field`, `['field']`, `[index]`, plus the
  * indefinite forms `$..field` (deep scan), `[*]` and `.*` (wildcard).
  *
  * Jayway list semantics: a path containing any indefinite step returns
  * a LIST of matches; per-branch misses after the fan-out are silently
  * skipped, and a deep scan that matches nothing returns the empty list
  * rather than erroring. Purely definite paths keep jayway's
  * error-on-miss behavior: a missing field, bad index, or scalar
  * dereference throws (→ VARIABLE_LOOKUP_ERROR in the engine), unlike
  * Spark's `get_json_object` which returns null.
  */
object JsonPath {
  sealed private trait Step
  private case class Field(name: String) extends Step
  private case class Index(i: Int) extends Step
  private case object Wildcard extends Step
  private case class DeepScan(name: String) extends Step

  private def compile(path: String): List[Step] = {
    if (path.isEmpty || path.charAt(0) != '$')
      throw new VarSubError(s"Path must start with '$$': $path")
    val steps = List.newBuilder[Step]
    var i = 1
    while (i < path.length) {
      path.charAt(i) match {
        case '.' =>
          i += 1
          if (i < path.length && path.charAt(i) == '.') {
            // deep scan: `$..field` (jayway ScanPathToken)
            i += 1
            val start = i
            while (i < path.length && path.charAt(i) != '.' && path.charAt(i) != '[')
              i += 1
            if (i == start)
              throw new VarSubError(s"Deep scan needs a field name: $path")
            val name = path.substring(start, i)
            if (name == "*")
              throw new VarSubError(s"'$$..*' not supported: $path")
            steps += DeepScan(name)
          } else if (i < path.length && path.charAt(i) == '*') {
            steps += Wildcard
            i += 1
          } else {
            val start = i
            while (i < path.length && path.charAt(i) != '.' && path.charAt(i) != '[')
              i += 1
            if (i == start) throw new VarSubError(s"Empty field name in $path")
            steps += Field(path.substring(start, i))
          }
        case '[' =>
          i += 1
          if (i < path.length && (path.charAt(i) == '\'' || path.charAt(i) == '"')) {
            val quote = path.charAt(i)
            i += 1
            val start = i
            while (i < path.length && path.charAt(i) != quote) i += 1
            if (i >= path.length) throw new VarSubError(s"Unclosed quote in $path")
            steps += Field(path.substring(start, i))
            i += 1 // quote
            if (i >= path.length || path.charAt(i) != ']')
              throw new VarSubError(s"Expected ']' in $path")
            i += 1
          } else if (i < path.length && path.charAt(i) == '*') {
            if (i + 1 >= path.length || path.charAt(i + 1) != ']')
              throw new VarSubError(s"Expected ']' after '*' in $path")
            steps += Wildcard
            i += 2
          } else {
            val start = i
            while (i < path.length && path.charAt(i) != ']') i += 1
            if (i >= path.length) throw new VarSubError(s"Expected ']' in $path")
            val idx =
              try path.substring(start, i).trim.toInt
              catch {
                case e: NumberFormatException =>
                  throw new VarSubError(s"Bad index in $path", e)
              }
            steps += Index(idx)
            i += 1
          }
        case c =>
          throw new VarSubError(s"Unexpected '$c' at $i in $path")
      }
    }
    steps.result()
  }

  /** Jayway ScanPathToken walk: at every OBJECT node (preorder,
    * insertion order) emit its `f` value if present, then descend into
    * every value; array elements are walked in index order. */
  private def deepScan(node: Any, f: String): Vector[Any] = node match {
    case m: ListMap[_, _] =>
      val mm = m.asInstanceOf[ListMap[String, Any]]
      mm.get(f).toVector ++ mm.values.toVector.flatMap(deepScan(_, f))
    case xs: Vector[_] => xs.flatMap(deepScan(_, f))
    case _ => Vector.empty
  }

  private def children(node: Any): Vector[Any] = node match {
    case m: ListMap[_, _] => m.values.toVector
    case xs: Vector[_] => xs
    case _ => Vector.empty
  }

  /** Evaluate `path` against JSON text. Definite paths return the
    * single match and throw VarSubError on any miss; indefinite paths
    * (any `..`/`*` step) return a Vector of matches, skipping branch
    * misses — jayway's list semantics. */
  def read(json: String, path: String): Any = {
    val root =
      try LHJson.parse(json)
      catch {
        case e: Exception =>
          throw new VarSubError(s"Failed parsing JSON for path $path", e)
      }
    var nodes: Vector[Any] = Vector(root)
    var indefinite = false
    compile(path).foreach { step =>
      step match {
        case Field(f) =>
          if (!indefinite) nodes = Vector(nodes.head match {
            case m: ListMap[_, _] =>
              m.asInstanceOf[ListMap[String, Any]].getOrElse(f,
                throw new VarSubError(
                  s"No results for path: $path (missing '$f')"))
            case _ => throw new VarSubError(
              s"Cannot apply ${step} to non-container while reading $path")
          })
          else nodes = nodes.collect {
            case m: ListMap[_, _]
                if m.asInstanceOf[ListMap[String, Any]].contains(f) =>
              m.asInstanceOf[ListMap[String, Any]](f)
          }
        case Index(idx) =>
          if (!indefinite) nodes = Vector(nodes.head match {
            case xs: Vector[_] =>
              if (idx < 0 || idx >= xs.length)
                throw new VarSubError(
                  s"Index $idx out of bounds for path: $path")
              else xs(idx)
            case _ => throw new VarSubError(
              s"Cannot apply ${step} to non-container while reading $path")
          })
          else nodes = nodes.collect {
            case xs: Vector[_] if idx >= 0 && idx < xs.length => xs(idx)
          }
        case Wildcard =>
          if (!indefinite) {
            nodes.head match {
              case _: ListMap[_, _] | _: Vector[_] => ()
              case _ => throw new VarSubError(
                s"Cannot apply wildcard to scalar while reading $path")
            }
            indefinite = true
          }
          nodes = nodes.flatMap(children)
        case DeepScan(f) =>
          indefinite = true
          nodes = nodes.flatMap(deepScan(_, f))
      }
    }
    if (indefinite) nodes else nodes.head
  }
}
