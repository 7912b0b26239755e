package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Schema-history tracking across DDL: the column-name timeline a CDC
  * consumer needs to decode row events on BOTH sides of an `ALTER TABLE`.
  *
  * TABLE_MAP events carry column TYPES but no NAMES (`binlog.rs:589-622`
  * parses exactly that), so positional row decode works at any point in
  * the stream — but attaching names requires knowing the column list *as
  * of the event's position*. The reference sidesteps this with a live
  * `show full columns` query against the source on every cache miss
  * (`/root/reference/src/executor.rs:33-48`, `mysql.rs:382-412`) and
  * simply goes stale-then-refetch across DDL. A replayable engine can't
  * call the server; instead we fold the DDL statements the binlog itself
  * carries (QUERY events, `binlog.rs:794-811`) over a bootstrap column
  * list, producing versioned column lists keyed by binlog position — the
  * same design as Canal's table-meta TSDB, re-expressed as one
  * metadata-scale aggregation plus an as-of join.
  *
  * Scale posture: DDL is rare — the per-table version fold runs on
  * grouped DDL lists (metadata scale, one row per table), while the
  * row-event side only does the as-of join it already needed for
  * TABLE_MAP pairing. Nothing here touches row-scale data twice.
  */
object SchemaHistory {

  /** name → mysql type, positionally ordered. */
  type Col = (String, String)

  private def stripQuotes(s: String): String = {
    val t = s.trim
    if (t.length >= 2 && t.head == '`' && t.last == '`') t.substring(1, t.length - 1)
    else t
  }

  /** Tokenize one ALTER clause: words, backquoted identifiers, and
    * '…'/"…" string literals (a `COMMENT 'x y, z'` value is ONE token);
    * parenthesized groups (type args, possibly containing spaces/commas)
    * attach to the preceding word, so `decimal (12, 2)` is ONE token.
    */
  private def tokens(clause: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    var cur = new StringBuilder
    var depth = 0
    var quote = 0.toChar // '`', '\'', '"' while inside; 0 outside
    var escape = false
    def flush(): Unit = if (cur.nonEmpty) { out += cur.toString; cur = new StringBuilder }
    clause.foreach { c =>
      if (quote != 0) {
        cur += c
        if (escape) escape = false
        else if (c == '\\' && quote != '`') escape = true
        else if (c == quote) quote = 0.toChar
      } else c match {
        case '`' | '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case w if w.isWhitespace && depth == 0 => flush()
        case o => cur += o
      }
    }
    flush()
    out.result()
  }

  /** Split the clause list after `ALTER TABLE <name>` on top-level commas
    * (commas inside type parens, quoted identifiers, or string literals
    * don't split).
    */
  private def splitClauses(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var cur = new StringBuilder
    var depth = 0
    var quote = 0.toChar
    var escape = false
    s.foreach { c =>
      if (quote != 0) {
        cur += c
        if (escape) escape = false
        else if (c == '\\' && quote != '`') escape = true
        else if (c == quote) quote = 0.toChar
      } else c match {
        case '`' | '\'' | '"' => quote = c; cur += c
        case '(' => depth += 1; cur += '('
        case ')' => depth -= 1; cur += ')'
        case ',' if depth == 0 => out += cur.toString; cur = new StringBuilder
        case o => cur += o
      }
    }
    out += cur.toString
    out.result().map(_.trim).filter(_.nonEmpty)
  }

  private val AlterRe =
    """(?is)\s*ALTER\s+TABLE\s+(`[^`]+`|\S+)\s+(.*)""".r

  /** The (unqualified, unquoted) target table of an ALTER TABLE statement,
    * or None when the statement is not an ALTER TABLE.
    */
  def alterTable(sql: String): Option[String] = sql match {
    // db.t1 / `db`.`t1` → t1 (the db comes from the QUERY event's own
    // schema field): split on dots OUTSIDE backquotes, keep the last.
    case AlterRe(name, _) => Some(lastIdent(name))
    case _ => None
  }

  /** Keywords that terminate a column type in ADD/MODIFY/CHANGE clauses —
    * everything after them is constraint/position decoration, not type.
    */
  private val TypeEnders = Set(
    "NULL", "NOT", "DEFAULT", "COMMENT", "FIRST", "AFTER", "AUTO_INCREMENT",
    "UNIQUE", "PRIMARY", "KEY", "REFERENCES", "COLLATE", "CHARACTER", "CHARSET",
    "GENERATED", "AS", "STORED", "VIRTUAL", "ON", "CONSTRAINT", "CHECK",
    "INVISIBLE", "VISIBLE", "SRID")

  /** Type keywords that may follow the base type token and belong to it. */
  private val TypeTrailers = Set("UNSIGNED", "SIGNED", "ZEROFILL")

  /** Column-list-neutral clause heads: recognized, applied as no-ops.
    * (`ALTER COLUMN … SET/DROP DEFAULT` changes defaults, not the list;
    * index/key/constraint clauses never touch columns.)
    */
  private def isNeutral(up: Vector[String]): Boolean = up match {
    case v if v.isEmpty => true
    case v if v.head == "ADD" && v.length > 1 &&
      Set("INDEX", "KEY", "UNIQUE", "FULLTEXT", "SPATIAL", "CONSTRAINT",
        "PRIMARY", "FOREIGN").contains(v(1)) => true
    case v if v.head == "DROP" && v.length > 1 &&
      Set("INDEX", "KEY", "PRIMARY", "FOREIGN", "CONSTRAINT", "CHECK").contains(v(1)) => true
    case v if v.head == "ALTER" => true // ALTER [COLUMN] c SET/DROP DEFAULT
    case v if v.head == "RENAME" && v.length > 1 &&
      Set("INDEX", "KEY", "TO", "AS").contains(v(1)) => true // RENAME TO = table rename
    case v if Set("ENGINE", "ENGINE=", "AUTO_INCREMENT", "CHARACTER", "CONVERT",
      "DEFAULT", "COMMENT", "COMMENT=", "ROW_FORMAT", "ALGORITHM", "LOCK",
      "ORDER", "FORCE", "ENABLE", "DISABLE").exists(k =>
      v.head == k || v.head.startsWith(k + "=")) => true
    case _ => false
  }

  /** Read `<type tokens...>` starting at `i`; returns (type string, rest). */
  private def readType(ts: Vector[String], i: Int): (String, Vector[String]) = {
    require(i < ts.length, s"missing column type in ALTER clause: ${ts.mkString(" ")}")
    // type = base token (parens attached) + signedness trailers; anything
    // else afterwards is constraint/position decoration, i.e. the rest.
    var j = i + 1
    while (j < ts.length && TypeTrailers.contains(ts(j).toUpperCase)) j += 1
    (ts.slice(i, j).mkString(" "), ts.drop(j))
  }

  /** Insert position from a FIRST/AFTER suffix: None = append. */
  private def position(rest: Vector[String]): Option[Either[Unit, String]] = {
    val up = rest.map(_.toUpperCase)
    val iFirst = up.indexOf("FIRST")
    val iAfter = up.indexOf("AFTER")
    if (iFirst >= 0) Some(Left(()))
    else if (iAfter >= 0 && iAfter + 1 < rest.length)
      Some(Right(stripQuotes(rest(iAfter + 1))))
    else None
  }

  private def insertAt(cols: Seq[Col], c: Col,
      pos: Option[Either[Unit, String]]): Seq[Col] = pos match {
    case None => cols :+ c
    case Some(Left(())) => c +: cols
    case Some(Right(after)) =>
      val i = cols.indexWhere(_._1 == after)
      require(i >= 0, s"AFTER references unknown column `$after`")
      (cols.take(i + 1) :+ c) ++ cols.drop(i + 1)
  }

  /** Apply ONE `ALTER TABLE` statement to a positional column list.
    * Unknown column-altering verbs throw — silently ignoring one would
    * make every later row event decode under the wrong names, the exact
    * failure mode this module exists to prevent.
    */
  def applyAlter(cols: Seq[Col], sql: String): Seq[Col] = sql match {
    case AlterRe(_, body) =>
      splitClauses(body).foldLeft(cols) { (cs, clause) =>
        val ts = tokens(clause)
        val up = ts.map(_.toUpperCase)
        if (isNeutral(up)) cs
        else up.head match {
          case "ADD" =>
            val i = if (up.length > 1 && up(1) == "COLUMN") 2 else 1
            require(i < ts.length, s"ADD COLUMN missing name: $clause")
            val name = stripQuotes(ts(i))
            val (tpe, rest) = readType(ts, i + 1)
            require(!cs.exists(_._1 == name), s"duplicate column `$name` in ADD")
            insertAt(cs, (name, tpe), position(rest))
          case "DROP" =>
            val i = if (up.length > 1 && up(1) == "COLUMN") 2 else 1
            require(i < ts.length, s"DROP COLUMN missing name: $clause")
            val name = stripQuotes(ts(i))
            require(cs.exists(_._1 == name), s"DROP references unknown column `$name`")
            cs.filterNot(_._1 == name)
          case "MODIFY" =>
            val i = if (up.length > 1 && up(1) == "COLUMN") 2 else 1
            require(i < ts.length, s"MODIFY COLUMN missing name: $clause")
            val name = stripQuotes(ts(i))
            val (tpe, rest) = readType(ts, i + 1)
            val idx = cs.indexWhere(_._1 == name)
            require(idx >= 0, s"MODIFY references unknown column `$name`")
            val moved = position(rest)
            if (moved.isEmpty) cs.updated(idx, (name, tpe))
            else insertAt(cs.filterNot(_._1 == name), (name, tpe), moved)
          case "CHANGE" =>
            val i = if (up.length > 1 && up(1) == "COLUMN") 2 else 1
            require(i + 1 < ts.length, s"CHANGE COLUMN missing names: $clause")
            val oldName = stripQuotes(ts(i))
            val newName = stripQuotes(ts(i + 1))
            val (tpe, rest) = readType(ts, i + 2)
            val idx = cs.indexWhere(_._1 == oldName)
            require(idx >= 0, s"CHANGE references unknown column `$oldName`")
            val moved = position(rest)
            if (moved.isEmpty) cs.updated(idx, (newName, tpe))
            else insertAt(cs.filterNot(_._1 == oldName), (newName, tpe), moved)
          case "RENAME" =>
            // RENAME COLUMN old TO new (RENAME TO/INDEX are neutral above)
            require(up.length >= 5 && up(1) == "COLUMN" && up(3) == "TO",
              s"unsupported RENAME clause: $clause")
            val oldName = stripQuotes(ts(2))
            val newName = stripQuotes(ts(4))
            val idx = cs.indexWhere(_._1 == oldName)
            require(idx >= 0, s"RENAME references unknown column `$oldName`")
            cs.updated(idx, (newName, cs(idx)._2))
          case other =>
            throw new IllegalArgumentException(
              s"unsupported ALTER clause verb `$other`: $clause")
        }
      }
    case _ => throw new IllegalArgumentException(s"not an ALTER TABLE statement: $sql")
  }

  private val CreateRe =
    """(?is)\s*CREATE\s+TABLE\s+(?:IF\s+NOT\s+EXISTS\s+)?(`[^`]+`|[^\s(]+)\s*\((.*)\)[^)]*""".r

  private val DropRe =
    """(?is)\s*DROP\s+TABLE\s+(?:IF\s+EXISTS\s+)?(`[^`]+`|\S+?);?\s*""".r

  /** Heads of CREATE TABLE definition entries that are NOT columns. */
  private val NonColumnDefs = Set("PRIMARY", "UNIQUE", "KEY", "INDEX",
    "CONSTRAINT", "FOREIGN", "FULLTEXT", "SPATIAL", "CHECK")

  private def lastIdent(name: String): String = {
    val parts = Seq.newBuilder[String]
    var cur = new StringBuilder
    var inQ = false
    name.foreach {
      case '`' => inQ = !inQ; cur += '`'
      case '.' if !inQ => parts += cur.toString; cur = new StringBuilder
      case c => cur += c
    }
    parts += cur.toString
    stripQuotes(parts.result().last)
  }

  /** Parse a CREATE TABLE statement → (unqualified table, column list),
    * or None when the statement is not a CREATE TABLE. With this, a
    * binlog archive that begins at the table's creation needs NO external
    * bootstrap — the stream itself carries the full schema timeline.
    */
  def createTable(sql: String): Option[(String, Seq[Col])] = sql match {
    case CreateRe(name, body) =>
      val cols = splitClauses(body).flatMap { clause =>
        val ts = tokens(clause)
        if (ts.isEmpty || NonColumnDefs.contains(ts.head.toUpperCase)) None
        else {
          val colName = stripQuotes(ts.head)
          val (tpe, _) = readType(ts, 1)
          Some(colName -> tpe)
        }
      }
      require(cols.nonEmpty, s"CREATE TABLE with no columns: ${sql.take(80)}")
      Some((lastIdent(name), cols))
    case _ => None
  }

  /** The target of a DROP TABLE statement, or None. */
  def dropTable(sql: String): Option[String] = sql match {
    case DropRe(name) => Some(lastIdent(name))
    case _ => None
  }

  /** [[alterTable]] for callers that already filtered to ALTER statements:
    * throws on a non-ALTER instead of returning None, so the expression
    * layer stays non-nullable.
    */
  def alterTableStrict(sql: UTF8String): UTF8String =
    UTF8String.fromString(alterTable(sql.toString).getOrElse(
      throw new IllegalArgumentException(
        s"not an ALTER TABLE statement: ${sql.toString.take(80)}")))

  // ---- Catalyst-facing fold ----

  val colListType: ArrayType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("mysql_type", StringType, nullable = false))), containsNull = false)

  val versionType: ArrayType = ArrayType(StructType(Seq(
    StructField("from_ord", LongType, nullable = false),
    StructField("cols", colListType, nullable = false))), containsNull = false)

  private def readCols(a: ArrayData): Seq[Col] =
    (0 until a.numElements()).map { i =>
      val s = a.getStruct(i, 2)
      (s.getUTF8String(0).toString, s.getUTF8String(1).toString)
    }

  private def colsData(cs: Seq[Col]): GenericArrayData =
    new GenericArrayData(cs.map { case (n, t) =>
      InternalRow(UTF8String.fromString(n), UTF8String.fromString(t))
    }.toArray[Any])

  /** Fold eval: bootstrap column list ++ ordered (ord, sql) DDLs →
    * one version row per era, `from_ord` = the DDL's position (bootstrap
    * era = Long.MinValue so it covers any earlier position).
    */
  def versionsEval(bootstrap: ArrayData, ddls: ArrayData): GenericArrayData = {
    var cols = readCols(bootstrap)
    val out = Array.newBuilder[Any]
    out += InternalRow(Long.MinValue, colsData(cols))
    var i = 0
    while (i < ddls.numElements()) {
      val s = ddls.getStruct(i, 2)
      cols = applyAlter(cols, s.getUTF8String(1).toString)
      out += InternalRow(s.getLong(0), colsData(cols))
      i += 1
    }
    new GenericArrayData(out.result())
  }
}

/** Codegen'd schema-version fold: (bootstrap cols, sorted (ord, sql) DDL
  * array) → array of (from_ord, cols) eras. Runs once per table on the
  * grouped-DDL row — metadata scale.
  */
case class SchemaVersions(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = SchemaHistory.versionType
  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(ls: StructType, _), ArrayType(rs: StructType, _))
      if ls.length == 2 && ls.forall(_.dataType == StringType) &&
        rs.length == 2 && rs.head.dataType == LongType &&
        rs(1).dataType == StringType => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"SchemaVersions expects (array<struct<string,string>>, array<struct<long,string>>), " +
        s"got (${l.sql}, ${r.sql})")
  }
  override protected def nullSafeEval(bootstrap: Any, ddls: Any): Any =
    SchemaHistory.versionsEval(
      bootstrap.asInstanceOf[ArrayData], ddls.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (b, d) =>
      s"graft.cdc.SchemaHistory.versionsEval($b, $d)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SchemaVersions =
    copy(left = newLeft, right = newRight)
}

object SchemaVersions {
  def apply(bootstrap: Column, ddls: Column): Column =
    ColumnBridge.column(SchemaVersions(
      ColumnBridge.expression(bootstrap), ColumnBridge.expression(ddls)))
}

/** Codegen'd ALTER TABLE target extraction (unqualified, unquoted). The
  * caller filters to ALTER statements first; a non-ALTER throws.
  */
case class AlterTargetTable(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"AlterTargetTable expects STRING input, got ${child.dataType.sql}")
  override protected def nullSafeEval(input: Any): Any =
    SchemaHistory.alterTableStrict(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.cdc.SchemaHistory.alterTableStrict($c)")
  override protected def withNewChildInternal(newChild: Expression): AlterTargetTable =
    copy(child = newChild)
}

object AlterTargetTable {
  def apply(sql: Column): Column =
    ColumnBridge.column(AlterTargetTable(ColumnBridge.expression(sql)))
}
