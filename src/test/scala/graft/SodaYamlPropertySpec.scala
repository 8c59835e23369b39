package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.checks._

/** Deterministic fuzz of the SodaCL-subset parser: render pseudo-random
  * suites from the supported grammar to YAML text, parse them back, and
  * check the structure round-trips (kind + name + count per suite). No
  * RNG — cases derive from modular arithmetic so failures reproduce. */
class SodaYamlPropertySpec extends AnyFunSuite {

  private def colName(seed: Long) = s"c${seed % 7}"

  /** (yaml item text, expected kind tag, expected name) */
  private def genItem(seed: Long): (String, String, String) = (seed % 6) match {
    case 0 =>
      val c = colName(seed)
      (s"  - duplicate_count($c) = 0:\n      name: dup check $seed\n", "UniqueKey", s"dup check $seed")
    case 1 =>
      val c = colName(seed)
      (s"  - missing_count($c) = 0\n", "NonNull", s"missing_$c")
    case 2 =>
      val c = colName(seed)
      (s"  - invalid_count($c) = 0:\n      valid min: ${seed % 10}\n      valid max: ${seed % 10 + 5}\n",
        "FailedRowsWhere", s"invalid_$c")
    case 3 =>
      val c = colName(seed)
      (s"  - min($c):\n      fail: when < ${seed % 100}\n", "RangeMin", s"min_$c")
    case 4 =>
      val c = colName(seed)
      (s"  - min($c):\n      fail: when <= ${seed % 100}\n", "FailedRowsWhere", s"min_$c")
    case _ =>
      val c = colName(seed)
      (s"  - failed rows:\n      name: fr $seed\n      fail query: |\n        SELECT * FROM t WHERE $c < 0\n",
        "FailedRowsWhere", s"fr $seed")
  }

  private def kindOf(c: Check): String = c.getClass.getSimpleName

  test("pseudo-random suites round-trip through render + parse (200 cases)") {
    (1L to 200L).foreach { caseSeed =>
      val nSuites = (caseSeed % 3 + 1).toInt
      val suites = (0 until nSuites).map { s =>
        val nItems = ((caseSeed * 31 + s) % 4 + 1).toInt
        val items = (0 until nItems).map(i => genItem(caseSeed * 131 + s * 17 + i))
        (s"table_${caseSeed}_$s", items)
      }
      val yaml = suites.map { case (t, items) =>
        s"checks for $t:\n" + items.map(_._1).mkString
      }.mkString
      val parsed = SodaYaml.parseAll(yaml)
      assert(parsed.map(_.table) == suites.map(_._1), s"case $caseSeed tables")
      parsed.zip(suites).foreach { case (suite, (_, items)) =>
        assert(suite.checks.length == items.length, s"case $caseSeed count")
        suite.checks.zip(items).foreach { case (chk, (_, kind, name)) =>
          assert(kindOf(chk) == kind, s"case $caseSeed kind: got ${kindOf(chk)}, want $kind")
          assert(chk.name == name, s"case $caseSeed name: got ${chk.name}, want $name")
        }
      }
    }
  }

  test("comments and blank lines are ignored anywhere") {
    val suite = SodaYaml.parse(
      """# leading comment
        |checks for t:
        |
        |  # item comment
        |  - missing_count(x) = 0
        |
        |  - duplicate_count(y) = 0:
        |      # nested comment
        |      name: y unique
        |""".stripMargin)
    assert(suite.checks == Seq(NonNull(Seq("x"), "missing_x"), UniqueKey(Seq("y"), "y unique")))
  }
}
