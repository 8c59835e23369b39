package graft.checks

import org.apache.spark.sql.functions.{col, expr}
import org.apache.spark.sql.types._

/** Declarative check-config ingestion: parses the SodaCL subset the
  * reference's data-quality layer is written in (YAML files under the
  * include/soda/checks tree, executed by a generic runner,
  * include/soda/check_function.py:2-25) into the [[Check]] ADT — so a user
  * can port their check files verbatim instead of re-coding suites in
  * Scala.
  *
  * Supported grammar (exactly the constructs the reference's files use):
  *
  * {{{
  * checks for <table>:
  *   - schema:
  *       fail:
  *         when required column missing: [a, b]     # inline or next-line list
  *         when wrong column type:
  *           col: string|float64|int|datetime|...
  *   - duplicate_count(c) = 0:      { name: ... }
  *   - missing_count(c) = 0:        { name: ... }
  *   - invalid_count(c) = 0:        { name: ..., valid min: N, valid max: N }
  *   - min(c):
  *       fail: when < N | when <= N
  *   - failed rows:
  *       name: ...
  *       fail query: |
  *         SELECT ... FROM t WHERE <predicate>
  * }}}
  *
  * The `fail query` predicate (text after the last WHERE) is compiled with
  * `expr(...)` — Spark SQL syntax, same as the soda data-source dialect.
  * No YAML library exists in the build, so this is a minimal
  * indentation-structured parser over that subset; it rejects what it
  * doesn't understand rather than guessing.
  */
object SodaYaml {

  final case class Suite(table: String, checks: Seq[Check])

  // ------------------------------------------------------------- YAML-lite

  private sealed trait Node
  private final case class Scalar(v: String) extends Node
  private final case class Mapping(entries: Seq[(String, Node)]) extends Node
  private final case class Sequence(items: Seq[Node]) extends Node

  private final case class Line(indent: Int, text: String)

  private def lex(text: String): Seq[Line] =
    text.linesIterator
      .map(_.replaceAll("\\s+$", ""))
      .filter(l => l.trim.nonEmpty && !l.trim.startsWith("#"))
      .map(l => Line(l.takeWhile(_ == ' ').length, l.trim))
      .toSeq

  /** Parse a block of lines sharing `indent` ≥ the first line's. */
  private def parseBlock(lines: Seq[Line]): Node = {
    require(lines.nonEmpty, "empty block")
    val base = lines.head.indent
    if (lines.head.text.startsWith("- ")) parseSeq(lines, base)
    else if (lines.size == 1 && lines.head.text.startsWith("[")) parseFlowList(lines.head.text)
    else if (lines.size == 1 && !lines.head.text.contains(":")) Scalar(lines.head.text)
    else parseMap(lines, base)
  }

  private def parseSeq(lines: Seq[Line], base: Int): Node = {
    val items = Seq.newBuilder[Node]
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      require(l.indent == base && l.text.startsWith("- "), s"expected sequence item, got: ${l.text}")
      // the item head is re-interpreted as a line indented past the dash
      val head = Line(base + 2, l.text.drop(2))
      var j = i + 1
      while (j < lines.length && lines(j).indent > base) j += 1
      items += parseBlock(head +: lines.slice(i + 1, j))
      i = j
    }
    Sequence(items.result())
  }

  private def parseMap(lines: Seq[Line], base: Int): Node = {
    val entries = Seq.newBuilder[(String, Node)]
    var i = 0
    while (i < lines.length) {
      val l = lines(i)
      require(l.indent == base, s"inconsistent indent at: ${l.text}")
      var j = i + 1
      while (j < lines.length && lines(j).indent > base) j += 1
      val body = lines.slice(i + 1, j)
      l.text match {
        case s if s.endsWith(": |") || s.endsWith(":|") => // literal block scalar
          val key = s.substring(0, s.lastIndexOf(':')).trim
          entries += key -> Scalar(body.map(_.text).mkString("\n"))
        case s if s.endsWith(":") =>
          val key = s.dropRight(1).trim
          entries += key -> (if (body.isEmpty) Scalar("") else parseBlock(body))
        case s =>
          val cut = s.indexOf(": ")
          require(cut > 0, s"expected 'key: value', got: $s")
          require(body.isEmpty, s"scalar entry cannot have a nested block: $s")
          val (key, v) = (s.substring(0, cut).trim, s.substring(cut + 2).trim)
          entries += key -> (if (v.startsWith("[")) parseFlowList(v) else Scalar(v))
      }
      i = j
    }
    Mapping(entries.result())
  }

  private def parseFlowList(s: String): Sequence = {
    require(s.startsWith("[") && s.endsWith("]"), s"expected [list], got: $s")
    val inner = s.substring(1, s.length - 1).trim
    Sequence(
      if (inner.isEmpty) Seq.empty
      else inner.split(",").toSeq.map(x => Scalar(x.trim)))
  }

  // -------------------------------------------------------- SodaCL mapping

  /** Soda/BigQuery type names → Spark types (the dialect the reference's
    * files use). */
  private val typeNames: Map[String, DataType] = Map(
    "string" -> StringType, "varchar" -> StringType, "text" -> StringType,
    "int" -> IntegerType, "integer" -> IntegerType,
    "bigint" -> LongType, "int64" -> LongType, "long" -> LongType,
    "float64" -> DoubleType, "double" -> DoubleType, "float" -> DoubleType,
    "datetime" -> TimestampType, "timestamp" -> TimestampType,
    "date" -> DateType, "boolean" -> BooleanType, "bool" -> BooleanType)

  private val AggZero = """(duplicate_count|missing_count|invalid_count)\(([^)]+)\)\s*=\s*0""".r
  private val MinOf = """min\(([^)]+)\)""".r
  private val FailWhen = """when\s*(<=|<)\s*(-?[0-9.]+)""".r

  /** Parse a file that may carry several `checks for <table>:` blocks
    * (SodaCL allows one file per scan covering many tables). */
  def parseAll(text: String): Seq[Suite] = {
    val root = parseBlock(lex(text)) match {
      case m: Mapping => m
      case other => throw new IllegalArgumentException(s"expected a top-level mapping, got $other")
    }
    root.entries.map {
      case (k, body) if k.startsWith("checks for ") =>
        val items = body match {
          case Sequence(is) => is
          case other => throw new IllegalArgumentException(s"expected a check list under '$k', got $other")
        }
        Suite(k.stripPrefix("checks for ").trim,
          items.zipWithIndex.map { case (n, idx) => toCheck(n, idx) })
      case (k, _) => throw new IllegalArgumentException(s"expected 'checks for <table>:', got '$k'")
    }
  }

  /** Single-suite convenience over [[parseAll]]. */
  def parse(text: String): Suite = parseAll(text) match {
    case Seq(one) => one
    case many => throw new IllegalArgumentException(
      s"file holds ${many.size} suites (${many.map(_.table)}); use parseAll")
  }

  /** Load every .yml/.yaml under a directory — the runner shape of
    * check_function.py (add_sodacl_yaml_files over a checks dir). */
  def loadDir(dir: String): Seq[Suite] = {
    val files = new java.io.File(dir).listFiles()
    require(files != null, s"not a directory: $dir")
    files.toSeq.filter(f => f.getName.endsWith(".yml") || f.getName.endsWith(".yaml"))
      .sortBy(_.getName)
      .flatMap(f => parseAll(new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")))
  }

  private def toCheck(item: Node, idx: Int): Check = item match {
    case Mapping(Seq((key, conf))) => toCheck(key, conf, idx)
    case Scalar(key) => toCheck(key, Mapping(Seq.empty), idx)
    case other => throw new IllegalArgumentException(s"unrecognized check item: $other")
  }

  private def named(conf: Node, default: String): String = conf match {
    case Mapping(es) => es.collectFirst { case ("name", Scalar(n)) => n }.getOrElse(default)
    case _ => default
  }

  private def confMap(conf: Node): Map[String, Node] = conf match {
    case Mapping(es) => es.toMap
    case _ => Map.empty
  }

  private def toCheck(key: String, conf: Node, idx: Int): Check = key match {
    case "schema" =>
      val fail = confMap(conf).get("fail").map(confMap).getOrElse(Map.empty)
      val required = fail.get("when required column missing") match {
        case Some(Sequence(cols)) => cols.map { case Scalar(c) => c; case n => n.toString }
        case Some(other) => throw new IllegalArgumentException(s"bad required-column list: $other")
        case None => Seq.empty
      }
      val types = fail.get("when wrong column type") match {
        case Some(Mapping(es)) => es.map { case (c, Scalar(t)) =>
          c -> typeNames.getOrElse(t.toLowerCase,
            throw new IllegalArgumentException(s"unknown soda type '$t' for column $c"))
          case (c, n) => throw new IllegalArgumentException(s"bad type for $c: $n")
        }
        case Some(other) => throw new IllegalArgumentException(s"bad column-type map: $other")
        case None => Seq.empty
      }
      // one schema item can carry both facets; fold them into a composite
      // name-distinct pair is unnecessary — emit the stronger TypedColumns
      // when both present plus SchemaSuperset for required columns.
      (required, types) match {
        case (r, t) if t.nonEmpty && r.nonEmpty =>
          SchemaAndTypes(r, t.toMap, name = s"schema_$idx")
        case (r, _) if r.nonEmpty => SchemaSuperset(r, name = s"schema_$idx")
        case (_, t) => TypedColumns(t.toMap, name = s"schema_$idx")
      }
    case AggZero("duplicate_count", c) => UniqueKey(Seq(c.trim), named(conf, s"dup_${c.trim}"))
    case AggZero("missing_count", c) => NonNull(Seq(c.trim), named(conf, s"missing_${c.trim}"))
    case AggZero("invalid_count", c) =>
      val m = confMap(conf)
      def num(k: String) = m.get(k).collect { case Scalar(v) => v.toDouble }
      (num("valid min"), num("valid max")) match {
        case (Some(lo), Some(hi)) =>
          FailedRowsWhere(col(c.trim) < lo || col(c.trim) > hi, named(conf, s"invalid_${c.trim}"))
        case (Some(lo), None) => RangeMin(c.trim, lo, named(conf, s"invalid_${c.trim}"))
        case (None, Some(hi)) =>
          FailedRowsWhere(col(c.trim) > hi, named(conf, s"invalid_${c.trim}"))
        case _ => throw new IllegalArgumentException(s"invalid_count($c) needs valid min/max")
      }
    case MinOf(c) =>
      confMap(conf).get("fail") match {
        case Some(Scalar(FailWhen("<", n))) => RangeMin(c.trim, n.toDouble, named(conf, s"min_${c.trim}"))
        case Some(Scalar(FailWhen("<=", n))) =>
          FailedRowsWhere(col(c.trim) <= n.toDouble, named(conf, s"min_${c.trim}"))
        case other => throw new IllegalArgumentException(s"min($c) needs 'fail: when < N', got $other")
      }
    case "failed rows" =>
      val q = confMap(conf).get("fail query") match {
        case Some(Scalar(sql)) => sql
        case other => throw new IllegalArgumentException(s"failed rows needs a fail query, got $other")
      }
      // predicate = everything after the FIRST word-boundary WHERE (the
      // reference's fail queries are single-table SELECT…WHERE; a nested
      // subquery predicate parses but will only analyze if it references
      // the suite table — document, don't guess)
      val wh = "(?i)\\bWHERE\\b".r.findFirstMatchIn(q).getOrElse(
        throw new IllegalArgumentException(s"fail query must contain a WHERE predicate: $q"))
      FailedRowsWhere(expr(q.substring(wh.end).trim), named(conf, s"failed_rows_$idx"))
    case other => throw new IllegalArgumentException(s"unsupported SodaCL check: $other")
  }
}
