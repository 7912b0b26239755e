package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Canal-compatible CDC change envelope (FIXTURES.md §2).
  *
  * Mirrors the reference's `DmlMessage` output record
  * (`/root/reference/src/executor.rs:90-105`, JSON render `:120-222`):
  * one envelope per binlog row-event, carrying N row images in `data`
  * (and, for UPDATE, the *changed columns only* of the before-image in
  * `old` — diff semantics of `/root/reference/src/executor.rs:266-311`).
  *
  * Values are stringly typed (`Map[String,String]`); `sqlType`/`mysqlType`
  * carry enough schema to restore types on the query side. Parse/render are
  * plain `from_json`/`to_json` so the whole path stays inside whole-stage
  * codegen — no UDFs.
  */
object Envelope {

  val schema: StructType = StructType(Seq(
    StructField("id", LongType),
    StructField("database", StringType),
    StructField("table", StringType),
    StructField("pkNames", ArrayType(StringType), nullable = true),
    StructField("isDdl", BooleanType),
    StructField("type", StringType),
    StructField("es", LongType),
    StructField("ts", LongType),
    StructField("sql", StringType, nullable = true),
    StructField("sqlType", MapType(StringType, IntegerType)),
    StructField("mysqlType", MapType(StringType, StringType)),
    StructField("data", ArrayType(MapType(StringType, StringType))),
    StructField("old", ArrayType(MapType(StringType, StringType)), nullable = true)
  ))

  /** Parse a Canal-JSON string column into the typed envelope struct. */
  def parse(raw: Column): Column = from_json(raw, schema)

  /** Merge-path partial parse: only the fields the route→pk→latest-image
    * pipeline reads — (id, database, table, type) plus the NAMED keys of
    * each data image as a struct. One Jackson pass like [[parse]], but
    * sqlType/mysqlType/old and every unreferenced data key are skipped
    * instead of materialized (map columns defeat Catalyst's own json
    * schema pruning: a `data` MapType must parse every key; a struct of
    * the pk/payload columns parses only those). Measured on 1.5M 13-field
    * fixture envelopes (PERFORMANCE.md r6): parse stage 1.3× faster,
    * parse+route+key 1.33×; the end-to-end merge is shuffle/window-bound,
    * so the whole-pipeline win is ~5% — worth keeping (strictly less work,
    * bigger envelopes save more) but not the merge bottleneck.
    */
  def parsePartial(raw: Column, dataFields: Seq[String],
      oldFields: Seq[String] = Nil): Column = {
    val base = Seq(
      StructField("id", LongType),
      StructField("database", StringType),
      StructField("table", StringType),
      StructField("type", StringType),
      StructField("data", ArrayType(
        StructType(dataFields.map(f => StructField(f, StringType))))))
    // DELETE envelopes built from before-images may carry the pk only in
    // `old` — callers that key deletes ask for those fields; everyone else
    // keeps the old-free schema (and its unchanged output shape).
    val fields = if (oldFields.isEmpty) base else base :+
      StructField("old", ArrayType(
        StructType(oldFields.map(f => StructField(f, StringType)))))
    from_json(raw, StructType(fields))
  }

  /** Render an envelope struct column back to Canal-JSON. */
  def render(envelope: Column): Column = to_json(envelope)

  /** Render a synthetic Canal-JSON envelope from per-row columns — shared by
    * the oracle round-trip query and the throughput bench so both exercise
    * the exact same shape. DML envelopes leave the defaults
    * (`isDdl=false, sql=""`, the reference's constants for row events,
    * `/root/reference/src/executor.rs:148,202`); DDL envelopes — the
    * reference's QueryEvent decode (`/root/reference/src/binlog.rs:794-811`)
    * — pass `isDdl=true` and the statement text.
    */
  def build(id: Column, database: Column, table: Column, pkNames: Column,
      dmlType: Column, es: Column, ts: Column, sqlType: Column,
      mysqlType: Column, data: Column, old: Column,
      isDdl: Column = lit(false), sqlText: Column = lit("")): Column =
    to_json(struct(
      id.as("id"), database.as("database"), table.as("table"),
      pkNames.as("pkNames"), isDdl.as("isDdl"), dmlType.as("type"),
      es.as("es"), ts.as("ts"), sqlText.as("sql"), sqlType.as("sqlType"),
      mysqlType.as("mysqlType"), data.as("data"), old.as("old")))

  /** Parsed-DDL projection over an envelope struct: the statement verb and
    * target table, extracted with codegen'd regexes (no UDF). Returns
    * (op, tbl) columns; non-DDL rows yield empty strings.
    */
  def ddlOp(envelope: Column): Column =
    upper(regexp_extract(envelope.getField("sql"), "^\\s*(\\w+)", 1))

  /** Table-name pattern shared with [[Catalog.applyDdl]]: skips IF [NOT]
    * EXISTS and an optional backticked database qualifier; the table name
    * is capture group 2.
    */
  private[cdc] val DdlTableRe: String =
    "(?i)table\\s+(?:if\\s+(?:not\\s+)?exists\\s+)?(?:`?(\\w+)`?\\.)?`?(\\w+)`?"

  def ddlTable(envelope: Column): Column =
    regexp_extract(envelope.getField("sql"), DdlTableRe, 2)

  /** Changed-columns diff: entries of `oldImg` whose value differs from the
    * same key in `newImg` (null-safe). This is the reference's UPDATE `old`
    * semantics (`/root/reference/src/executor.rs:266-311`) as a codegen'd
    * higher-order `map_filter` — no shuffle, no UDF.
    *
    * A key ABSENT from the new image (a DDL-era UPDATE whose old image
    * carries a just-dropped column) always counts as changed — including
    * when its old value was NULL, which is why the guard is an explicit
    * `map_contains_key` and not just a null-safe compare (NULL <=> NULL
    * would hide that case). `try_element_at`, not `element_at`: under ANSI
    * mode a missing key throws.
    */
  def changedColumns(oldImg: Column, newImg: Column): Column =
    map_filter(oldImg, (k, v) =>
      !(map_contains_key(newImg, k) && (try_element_at(newImg, k) <=> v)))
}
