package graft.cdc

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** One configured routing instance (reference `Instance`,
  * `/root/reference/src/config.rs:32-55`): events from databases matching
  * `schemas` and tables matching `tables` — minus tables matching any
  * `blackList` pattern — go to `(mq, topic)`.
  */
final case class Instance(
    mq: String,
    topic: String,
    schemas: String,
    tables: String,
    blackList: Seq[String] = Nil)

/** Wildcard instance routing (reference `/root/reference/src/config.rs:41-72`).
  *
  * Pattern semantics mirrored exactly (`match_pattern`, config.rs:57-72):
  * trailing `*` = prefix match (checked first), leading `*` = suffix match,
  * exactly one interior `*` = prefix+suffix match, anything else (including
  * 2+ stars) = literal equality. Blacklist is checked *before* the tables
  * pattern and its entries are themselves patterns (config.rs:43-48).
  *
  * Two forms: a pure-Scala matcher (unit/property-testable, driver-side
  * config validation) and a `Column`-predicate compiler so the same filter
  * runs inside codegen and pushes down to the scan.
  */
object Routing {

  /** Reference-exact wildcard matcher. */
  def matches(pattern: String, input: String): Boolean =
    if (pattern.endsWith("*")) input.startsWith(pattern.dropRight(1))
    else if (pattern.startsWith("*")) input.endsWith(pattern.drop(1))
    else {
      val parts = pattern.split("\\*", -1)
      if (parts.length == 2) input.startsWith(parts(0)) && input.endsWith(parts(1))
      else input == pattern
    }

  /** Same semantics as [[matches]], compiled to a Catalyst predicate. */
  def predicate(pattern: String, c: Column): Column =
    if (pattern.endsWith("*")) c.startsWith(pattern.dropRight(1))
    else if (pattern.startsWith("*")) c.endsWith(pattern.drop(1))
    else {
      val parts = pattern.split("\\*", -1)
      if (parts.length == 2) c.startsWith(parts(0)) && c.endsWith(parts(1))
      else c === pattern
    }

  /** Does `instance` route `(db, table)`? Blacklist wins over `tables`. */
  def routesTo(i: Instance, db: String, table: String): Boolean =
    matches(i.schemas, db) &&
      !i.blackList.exists(matches(_, table)) &&
      matches(i.tables, table)

  /** Driver-side routing: all (mq, topic) destinations for `(db, table)`. */
  def route(instances: Seq[Instance], db: String, table: String): Seq[(String, String)] =
    instances.collect { case i if routesTo(i, db, table) => (i.mq, i.topic) }

  /** [[routesTo]] as a Column predicate. */
  def instancePredicate(i: Instance, db: Column, table: Column): Column = {
    val black = i.blackList
      .map(p => predicate(p, table))
      .reduceOption(_ || _)
      .getOrElse(lit(false))
    predicate(i.schemas, db) && !black && predicate(i.tables, table)
  }

  /** Multicast routing as data: an array<struct<mq,topic>> of every matched
    * destination for each row — `explode` it to fan out (reference multicast,
    * `/root/reference/src/executor.rs:529-537,600-605`). Stays codegen'd;
    * per-sink filtered branches remain available via [[instancePredicate]]
    * when one streaming query per sink is preferred.
    */
  def routes(instances: Seq[Instance], db: Column, table: Column): Column = {
    val hits = instances.map { i =>
      when(instancePredicate(i, db, table),
        struct(lit(i.mq).as("mq"), lit(i.topic).as("topic")))
    }
    filter(array(hits: _*), x => x.isNotNull)
  }
}
