package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** MySQL type-string catalog: type string → JDBC type code and Spark type.
  *
  * JDBC mapping mirrors the reference's `FieldMeta::get_sql_type`
  * (`/root/reference/src/executor.rs:352-400`) including its quirks: prefix
  * matching for most types (`mediumint` before `int` so both hit 4), exact
  * equality for `date`/`time`, *suffix* matching for `%blob`/`%text` (so
  * `longtext`→2005, `mediumblob`→2004), and -999 for anything unknown.
  */
object Catalog {

  /** Pure-Scala JDBC code mapping (reference-exact). */
  def jdbcCode(t: String): Int =
    if (t.startsWith("tinyint")) -6
    else if (t.startsWith("smallint")) 5
    else if (t.startsWith("mediumint") || t.startsWith("int")) 4
    else if (t.startsWith("bigint")) -5
    else if (t.startsWith("float")) 7
    else if (t.startsWith("double")) 8
    else if (t.startsWith("decimal")) 3
    else if (t == "date") 91
    else if (t == "time") 92
    else if (t.startsWith("year")) 12
    else if (t.startsWith("datetime") || t.startsWith("timestamp")) 93
    else if (t.startsWith("char")) 1
    else if (t.startsWith("varchar")) 12
    else if (t.endsWith("blob")) 2004
    else if (t.endsWith("text")) 2005
    else -999

  /** [[jdbcCode]] as the declared Scala-UDF exemplar (SURVEY.md §2B). */
  val jdbcCodeUdf: UserDefinedFunction = udf(jdbcCode _)

  /** [[jdbcCode]] as a codegen-friendly when-chain — the production path
    * (a native expression beats a UDF; same branch order as the reference).
    */
  def jdbcCodeCol(c: Column): Column =
    when(c.startsWith("tinyint"), -6)
      .when(c.startsWith("smallint"), 5)
      .when(c.startsWith("mediumint") || c.startsWith("int"), 4)
      .when(c.startsWith("bigint"), -5)
      .when(c.startsWith("float"), 7)
      .when(c.startsWith("double"), 8)
      .when(c.startsWith("decimal"), 3)
      .when(c === "date", 91)
      .when(c === "time", 92)
      .when(c.startsWith("year"), 12)
      .when(c.startsWith("datetime") || c.startsWith("timestamp"), 93)
      .when(c.startsWith("char"), 1)
      .when(c.startsWith("varchar"), 12)
      .when(c.endsWith("blob"), 2004)
      .when(c.endsWith("text"), 2005)
      .otherwise(-999)

  /** Metadata enrichment as a broadcast-hash lookup join (the reference's
    * DESC side-connection + per-table cache, `/root/reference/src/executor.rs:415-443`,
    * restated as data): the catalog DataFrame (however sourced — JDBC reads,
    * a registry dump) broadcasts to every executor, so enrichment adds zero
    * shuffle to the event stream at any scale.
    */
  def enrich(events: org.apache.spark.sql.DataFrame,
      catalog: org.apache.spark.sql.DataFrame,
      on: Seq[String] = Seq("database", "table")): org.apache.spark.sql.DataFrame =
    events.join(broadcast(catalog), on, "left")

  /** Schema-change propagation: a DDL event stream (columns `database`,
    * `sql`) invalidates the broadcast catalog's cached row for every table
    * it touches, forcing the next enrichment cycle to re-read that table's
    * metadata — the DDL analog of the reference's negative cache
    * (`not_exists`, `/root/reference/src/executor.rs:430-441`; the
    * reference decodes QUERY events, `binlog.rs:794-811`, but never feeds
    * them back — a gap, not a behavior, so we define the obvious one).
    * Pure anti-join: no shuffle on the catalog side beyond the DDL keys.
    */
  def applyDdl(catalog: org.apache.spark.sql.DataFrame,
      ddl: org.apache.spark.sql.DataFrame): org.apache.spark.sql.DataFrame = {
    // Every `TABLE <name>` occurrence is touched; RENAME forms additionally
    // touch BOTH sides of every `old TO|AS new` clause — `RENAME TABLE a TO
    // b, c TO d` has one TABLE keyword but renames two tables, so the
    // pre-TO names (a, c) and the targets (b, d) are each extracted by
    // position around TO/AS (a stale row for either name must not survive).
    // Bare `TRUNCATE t` (no TABLE keyword) gets its own pattern. Statements
    // that parse as DDL but yield no table name at all invalidate the whole
    // envelope database — conservative over-invalidation only costs a
    // metadata re-read, a silently stale row costs correctness (this also
    // over-invalidates column names in `RENAME COLUMN a TO b`, accepted on
    // the same grounds).
    val tableDbs = regexp_extract_all(col("sql"), lit(Envelope.DdlTableRe), lit(1))
    val tableNames = regexp_extract_all(col("sql"), lit(Envelope.DdlTableRe), lit(2))
    val qname = "(?:`?(\\w+)`?\\.)?`?(\\w+)`?"
    val toRe = s"(?i)\\b(?:to|as)\\s+$qname"
    val preToRe = s"(?i)$qname\\s+(?:to|as)\\b"
    val toDbs = regexp_extract_all(col("sql"), lit(toRe), lit(1))
    val toNames = regexp_extract_all(col("sql"), lit(toRe), lit(2))
    val preToDbs = regexp_extract_all(col("sql"), lit(preToRe), lit(1))
    val preToNames = regexp_extract_all(col("sql"), lit(preToRe), lit(2))
    val truncRe = "(?i)^\\s*truncate\\s+(?:`?(\\w+)`?\\.)?`?(\\w+)`?\\s*$"
    def pairs(dbs: Column, names: Column): Column =
      zip_with(dbs, names, (d, n) => struct(d.as("db"), n.as("tbl")))
    val isRename = col("sql").rlike("(?i)\\brename\\b")
    val renameAll = concat(pairs(toDbs, toNames), pairs(preToDbs, preToNames))
    val renamePairs = when(isRename, renameAll)
      .otherwise(slice(renameAll, 1, 0))
    val truncPair = array(struct(
      regexp_extract(col("sql"), truncRe, 1).as("db"),
      regexp_extract(col("sql"), truncRe, 2).as("tbl")))
    val allPairs = filter(
      concat(pairs(tableDbs, tableNames), renamePairs, truncPair),
      p => p.getField("tbl") =!= "")
    val parsed = ddl.select(col("database").as("env_db"), allPairs.as("pairs"))
    // The statement's own database qualifier (ALTER TABLE db.t ...) wins
    // over the envelope's database when present.
    val touched = parsed.filter(size(col("pairs")) > 0)
      .select(col("env_db"), explode(col("pairs")).as("p"))
      .select(coalesce(nullif(col("p.db"), lit("")), col("env_db")).as("database"),
        col("p.tbl").as("table"))
    val wildDbs = parsed.filter(size(col("pairs")) === 0)
      .select(col("env_db").as("database"))
    catalog.join(broadcast(touched), Seq("database", "table"), "left_anti")
      .join(broadcast(wildDbs), Seq("database"), "left_anti")
  }

  private val DecimalRe = """(?:decimal|numeric)\((\d+)\s*,\s*(\d+)\)""".r

  /** MySQL type string → Spark DataType (SURVEY.md §1 mapping; BLOB kept
    * binary, deviating from the reference's lossy UTF-16 decode,
    * `/root/reference/src/executor.rs:231-236`). An ` unsigned` suffix
    * widens integer types one tier (tinyint u fits Short, …, bigint u only
    * fits DECIMAL(20,0)) — casting the full unsigned range into the signed
    * Spark type would overflow-throw under ANSI mode. MySQL renders
    * unsigned display types as `... unsigned zerofill` too, so the
    * zerofill marker (display-only) is stripped before matching.
    */
  def sparkType(raw: String): DataType = {
    val t = raw.stripSuffix("zerofill").trim
    if (t.endsWith("unsigned")) t.stripSuffix("unsigned").trim match {
      case s if s.startsWith("tinyint")   => ShortType
      case s if s.startsWith("smallint")  => IntegerType
      case s if s.startsWith("mediumint") => IntegerType // 2^24-1 fits Int
      case s if s.startsWith("int")       => LongType
      case s if s.startsWith("bigint")    => DecimalType(20, 0)
      case s => sparkType(s)
    } else t match {
    case s if s.startsWith("tinyint")   => ByteType
    case s if s.startsWith("smallint")  => ShortType
    case s if s.startsWith("mediumint") || s.startsWith("int") => IntegerType
    case s if s.startsWith("bigint")    => LongType
    case s if s.startsWith("float")     => FloatType
    case s if s.startsWith("double")    => DoubleType
    case DecimalRe(p, sc)               => DecimalType(p.toInt, sc.toInt)
    case s if s.startsWith("decimal") || s.startsWith("numeric") => DecimalType(38, 18)
    case "date"                         => DateType
    case s if s.startsWith("time(") || s == "time" => StringType // no TimeType
    case s if s.startsWith("datetime") || s.startsWith("timestamp") => TimestampType
    case s if s.startsWith("year")      => IntegerType
    case s if s.endsWith("blob")        => BinaryType
    case s if s.startsWith("bit")       => LongType // bit(n) decodes as unsigned int
    case _                              => StringType // char/varchar/text/enum/set/json
  }
  }
}
