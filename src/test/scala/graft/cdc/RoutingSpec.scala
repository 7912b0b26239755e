package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Wildcard matcher semantics (reference `/root/reference/src/config.rs:57-72`)
  * + blacklist precedence (config.rs:43-48), FIXTURES.md §4 cases.
  */
class RoutingSpec extends AnyFunSuite {

  test("matcher: FIXTURES §4 cases") {
    assert(Routing.matches("test*", "testdb"))
    assert(Routing.matches("*db", "testdb"))
    assert(Routing.matches("t*b", "testdb"))
    assert(Routing.matches("testdb", "testdb"))
    assert(!Routing.matches("test*", "prod"))
  }

  test("matcher: edge patterns") {
    assert(Routing.matches("*", "anything"))     // bare star = prefix ""
    assert(Routing.matches("s*2", "s2"))          // infix with empty middle
    assert(!Routing.matches("a*b*c", "abc"))      // 2+ stars = literal only
    assert(Routing.matches("a*b*c", "a*b*c"))
    assert(!Routing.matches("ab", "xab"))
    assert(Routing.matches("*ab", "xab"))
  }

  test("blacklist wins over tables pattern") {
    val i = Instance("kafka", "t", schemas = "test*", tables = "s*", blackList = Seq("s3", "tmp*"))
    assert(Routing.routesTo(i, "testdb", "s1"))
    assert(!Routing.routesTo(i, "testdb", "s3"))       // exact blacklist
    assert(!Routing.routesTo(i, "prod", "s1"))         // schema mismatch
    val i2 = i.copy(blackList = Seq("s*"))
    assert(!Routing.routesTo(i2, "testdb", "s1"))      // pattern blacklist
  }

  test("route: multicast returns every matching instance") {
    val is = Seq(
      Instance("k", "t1", "en", "src*", Seq("src3")),
      Instance("r", "t2", "*", "*0"),
      Instance("k", "t3", "e*", "s*2"))
    assert(Routing.route(is, "en", "src0") == Seq(("k", "t1"), ("r", "t2")))
    assert(Routing.route(is, "en", "src3") == Nil)
    assert(Routing.route(is, "en", "src2") == Seq(("k", "t1"), ("k", "t3")))
    assert(Routing.route(is, "zh", "src10") == Seq(("r", "t2")))
  }

  test("property (exhaustive): matcher agrees with a regex model") {
    def model(p: String, in: String): Boolean = {
      import java.util.regex.Pattern.quote
      // NB: the reference's infix match allows the prefix and suffix to
      // overlap ("a*a" matches "a"), so the model uses two anchored regexes
      // rather than one concatenated one.
      if (p.endsWith("*")) in.matches(quote(p.dropRight(1)) + ".*")
      else if (p.startsWith("*")) in.matches(".*" + quote(p.drop(1)))
      else {
        val parts = p.split("\\*", -1)
        if (parts.length == 2)
          in.matches(quote(parts(0)) + ".*") && in.matches(".*" + quote(parts(1)))
        else in == p
      }
    }
    val tokens = Seq("", "a", "b", "ab", "ba")
    val patterns = for {
      a <- tokens; star <- Seq("", "*"); b <- tokens
      p = a + star + b if p.nonEmpty
    } yield p
    val alphabet = Seq("a", "b")
    val inputs = (0 to 3).flatMap(n =>
      Seq.fill(n)(alphabet).foldLeft(Seq(""))((acc, cs) =>
        acc.flatMap(s => cs.map(s + _))))
    for (p <- patterns.distinct; in <- inputs.distinct)
      assert(Routing.matches(p, in) == model(p, in), s"pattern=$p input=$in")
  }
}
