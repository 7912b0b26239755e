package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property-based checks (SURVEY.md §5.3) for the wildcard matcher and the
  * type catalog — pure functions, so scalacheck drives them directly.
  */
object RoutingProps extends Properties("Routing") {

  private val token = Gen.oneOf("", "a", "b", "ab", "ba", "s2", "x")
  private val pattern = for {
    a <- token; star <- Gen.oneOf("", "*"); b <- token
    p = a + star + b if p.nonEmpty
  } yield p
  private val input = Gen.listOf(Gen.oneOf('a', 'b', 's', '2', 'x')).map(_.mkString)

  private def model(p: String, in: String): Boolean = {
    import java.util.regex.Pattern.quote
    if (p.endsWith("*")) in.matches(quote(p.dropRight(1)) + ".*")
    else if (p.startsWith("*")) in.matches(".*" + quote(p.drop(1)))
    else {
      val parts = p.split("\\*", -1)
      if (parts.length == 2)
        in.matches(quote(parts(0)) + ".*") && in.matches(".*" + quote(parts(1)))
      else in == p
    }
  }

  property("matches == regex model") = forAll(pattern, input) { (p, in) =>
    Routing.matches(p, in) == model(p, in)
  }

  property("prefix pattern accepts any extension") = forAll(token, input) { (p, ext) =>
    Routing.matches(p + "*", p + ext)
  }

  property("suffix pattern accepts any prefix") = forAll(token, input) { (s, pre) =>
    Routing.matches("*" + s, pre + s)
  }

  property("star-free pattern is exact equality") =
    forAll(token.suchThat(_.nonEmpty), input) { (p, in) =>
      Routing.matches(p, in) == (p == in)
    }

  property("blacklist always wins over tables pattern") =
    forAll(token.suchThat(_.nonEmpty), input) { (tbl, db) =>
      val i = Instance("m", "t", schemas = "*", tables = tbl + "*", blackList = Seq(tbl + "*"))
      !Routing.routesTo(i, db, tbl + "x")
    }

  property("route returns instances in declaration order") =
    forAll(input) { db =>
      val is = Seq(
        Instance("m1", "t1", "*", "*"),
        Instance("m2", "t2", "*", "*"))
      Routing.route(is, db, "any") == Seq(("m1", "t1"), ("m2", "t2"))
    }
}

object CatalogProps extends Properties("Catalog") {

  private val paren = Gen.oneOf("", "(1)", "(10,2)", "(255)")

  property("varchar family → 12") = forAll(paren) { s => Catalog.jdbcCode("varchar" + s) == 12 }
  property("bigint family → -5") = forAll(paren) { s => Catalog.jdbcCode("bigint" + s) == -5 }
  property("int family → 4") = forAll(paren) { s => Catalog.jdbcCode("int" + s) == 4 }
  property("*blob suffix → 2004") =
    forAll(Gen.oneOf("", "tiny", "medium", "long")) { p => Catalog.jdbcCode(p + "blob") == 2004 }
  property("*text suffix → 2005") =
    forAll(Gen.oneOf("", "tiny", "medium", "long")) { p => Catalog.jdbcCode(p + "text") == 2005 }
  property("decimal precision round-trips into DecimalType") =
    forAll(Gen.choose(1, 38), Gen.choose(0, 18)) { (p, s0) =>
      val s = math.min(s0, p)
      Catalog.sparkType(s"decimal($p,$s)") ==
        org.apache.spark.sql.types.DecimalType(p, s)
    }
}
