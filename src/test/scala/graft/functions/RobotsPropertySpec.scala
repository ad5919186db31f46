package graft.functions

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property check of the robots.txt path matcher: the greedy `*`/`$`
  * matcher must agree with a REGEX TRANSLATION of the same pattern
  * (each `*` → `.*`, a trailing `$` → end anchor, everything else
  * quoted) on arbitrary generated paths and patterns — the classic
  * glob-vs-regex equivalence argument, checked instead of assumed.
  * No Spark session needed: the kernel is pure.
  */
class RobotsPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, n: Int): Unit = {
    val res = SCTest.check(SCTest.Parameters.default
      .withMinSuccessfulTests(n).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  private def regexMatch(path: String, pattern: String): Boolean = {
    val (pat, anchored) =
      if (pattern.endsWith("$")) (pattern.dropRight(1), true)
      else (pattern, false)
    val rx = pat.split("\\*", -1)
      .map(java.util.regex.Pattern.quote)
      .mkString(".*")
    val full = "^" + rx + (if (anchored) "$" else ".*")
    java.util.regex.Pattern.compile(full, java.util.regex.Pattern.DOTALL)
      .matcher(path).matches()
  }

  // paths and patterns over a tiny alphabet so collisions are common
  private val pathGen: Gen[String] =
    Gen.listOfN(8, Gen.oneOf('a', 'b', '/', '.')).map("/" + _.mkString)
  private val patGen: Gen[String] = for {
    n <- Gen.choose(0, 6)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', '/', '*', '.'))
    anchor <- Gen.oneOf("", "$")
  } yield "/" + cs.mkString + anchor

  test("patternMatches == regex translation on arbitrary paths/patterns") {
    check(Prop.forAll(pathGen, patGen) { (path, pattern) =>
      val got = RobotsKernel.patternMatches(path, pattern)
      val want = regexMatch(path, pattern)
      if (got != want)
        println(s"DIVERGED: path=$path pattern=$pattern got=$got want=$want")
      got == want
    }, 2000)
  }

  test("edge patterns: bare *, bare $, consecutive stars, star before $") {
    for ((path, pattern) <- Seq(
      ("/a", "*"), ("/a", "$"), ("/", "/$"), ("/ab", "/a**b"),
      ("/ab", "/a*$"), ("/ab", "*b$"), ("/ab", "**"), ("/ab", "*$")))
      assert(RobotsKernel.patternMatches(path, pattern) ==
        regexMatch(path, pattern), s"path=$path pattern=$pattern")
  }
}
