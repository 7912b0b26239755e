package graft.cdc

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** ALTER parser fuzz: random op sequences rendered to SQL text and
  * re-parsed must evolve the column list exactly as the ops themselves —
  * parse∘render ≡ direct application — across quoting styles, position
  * clauses, multi-clause statements, and noise decorations.
  */
object SchemaHistoryProps extends Properties("SchemaHistory") {

  private type Col = (String, String)

  sealed private trait Op {
    def applyTo(cs: Seq[Col]): Seq[Col]
    def sql: String
  }

  private def quote(name: String, backquote: Boolean): String =
    if (backquote) s"`$name`" else name

  private val typeGen: Gen[String] = Gen.oneOf(
    "int", "bigint", "varchar(12)", "decimal(10, 2)", "bigint unsigned")

  private def freshName(cs: Seq[Col]): Gen[String] =
    Gen.choose(0, 1000000).map(n => s"c$n").retryUntil(n => !cs.exists(_._1 == n))

  private def existing(cs: Seq[Col]): Gen[String] = Gen.oneOf(cs.map(_._1))

  private case class Add(name: String, tpe: String, pos: Option[Either[Unit, String]],
      bq: Boolean, noise: String) extends Op {
    def applyTo(cs: Seq[Col]): Seq[Col] = pos match {
      case None => cs :+ (name -> tpe)
      case Some(Left(())) => (name -> tpe) +: cs
      case Some(Right(after)) =>
        val i = cs.indexWhere(_._1 == after)
        (cs.take(i + 1) :+ (name -> tpe)) ++ cs.drop(i + 1)
    }
    def sql: String = s"ADD COLUMN ${quote(name, bq)} $tpe$noise" + (pos match {
      case None => ""
      case Some(Left(())) => " FIRST"
      case Some(Right(a)) => s" AFTER ${quote(a, bq)}"
    })
  }

  private case class Drop(name: String, bq: Boolean) extends Op {
    def applyTo(cs: Seq[Col]): Seq[Col] = cs.filterNot(_._1 == name)
    def sql: String = s"DROP COLUMN ${quote(name, bq)}"
  }

  private case class Modify(name: String, tpe: String) extends Op {
    def applyTo(cs: Seq[Col]): Seq[Col] = {
      val i = cs.indexWhere(_._1 == name)
      cs.updated(i, name -> tpe)
    }
    def sql: String = s"MODIFY COLUMN $name $tpe"
  }

  private case class Rename(from: String, to: String) extends Op {
    def applyTo(cs: Seq[Col]): Seq[Col] = {
      val i = cs.indexWhere(_._1 == from)
      cs.updated(i, to -> cs(i)._2)
    }
    def sql: String = s"RENAME COLUMN $from TO $to"
  }

  private val noiseGen: Gen[String] = Gen.oneOf(
    "", " NOT NULL", " DEFAULT 0", " NULL", " COMMENT 'x y, z'")

  private def opGen(cs: Seq[Col]): Gen[Op] = {
    val adds = for {
      n <- freshName(cs)
      t <- typeGen
      bq <- Gen.oneOf(true, false)
      noise <- noiseGen
      pos <- if (cs.isEmpty)
        Gen.oneOf[Option[Either[Unit, String]]](None, Some(Left(())))
      else Gen.oneOf[Option[Either[Unit, String]]](
        Gen.const(None),
        Gen.const(Some(Left(()))),
        existing(cs).map(e => Some(Right(e))))
    } yield Add(n, t, pos, bq, noise)
    if (cs.isEmpty) adds
    else Gen.frequency(
      4 -> adds,
      2 -> (for { n <- existing(cs); bq <- Gen.oneOf(true, false) } yield Drop(n, bq)),
      2 -> (for { n <- existing(cs); t <- typeGen } yield Modify(n, t)),
      1 -> (for { f <- existing(cs); t <- freshName(cs) } yield Rename(f, t)))
  }

  private def opsGen(cs: Seq[Col], n: Int): Gen[List[Op]] =
    if (n == 0) Gen.const(Nil)
    else opGen(cs).flatMap(op => opsGen(op.applyTo(cs), n - 1).map(op :: _))

  private val base: Seq[Col] = Seq("pk" -> "bigint", "v" -> "varchar(8)")

  property("parse-and-apply of rendered DDL equals direct application") =
    forAll(Gen.choose(0, 6).flatMap(opsGen(base, _))) { ops =>
      val direct = ops.foldLeft(base)((cs, op) => op.applyTo(cs))
      val viaSql = ops.foldLeft(base)((cs, op) =>
        SchemaHistory.applyAlter(cs, s"ALTER TABLE t1 ${op.sql}"))
      viaSql == direct
    }

  property("one multi-clause ALTER equals the same ops one at a time") =
    forAll(Gen.choose(1, 4).flatMap(opsGen(base, _))) { ops =>
      val oneShot = SchemaHistory.applyAlter(base,
        s"ALTER TABLE t1 ${ops.map(_.sql).mkString(", ")}")
      val stepwise = ops.foldLeft(base)((cs, op) =>
        SchemaHistory.applyAlter(cs, s"ALTER TABLE t1 ${op.sql}"))
      oneShot == stepwise
    }

  property("evolved lists never hold duplicate names") =
    forAll(Gen.choose(0, 6).flatMap(opsGen(base, _))) { ops =>
      val out = ops.foldLeft(base)((cs, op) =>
        SchemaHistory.applyAlter(cs, s"ALTER TABLE t1 ${op.sql}"))
      out.map(_._1).distinct.length == out.length
    }
}
