package graft.streaming

import graft.cdc.Envelope
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery}

/** Message-queue sinks for the Canal envelope stream (reference
  * `/root/reference/src/message_queue.rs`): Kafka via Spark's built-in sink
  * (exactly-once from the checkpoint — stronger than the reference's
  * fire-and-forget), and a queue-shaped `foreachBatch` sink for RPUSH-style
  * stores (the reference's Redis path, `message_queue.rs:137-172`) with the
  * client injected so tests run against an in-memory queue.
  */
object Sinks {

  /** Envelope rows → the Kafka record shape: `key` = "database.table" (so
    * one table's changes land in one partition, preserving per-table order
    * — the guarantee the reference loses to round-robin workers,
    * `/root/reference/src/executor.rs:456`), `value` = Canal-JSON. Factored
    * out of [[kafkaCanal]] so the projection is unit-testable without the
    * kafka format being loadable.
    */
  def kafkaProjection(envelopes: DataFrame): DataFrame =
    envelopes.select(
      concat(col("database"), lit("."), col("table")).as("key"),
      Envelope.render(struct(envelopes.columns.map(col): _*)).as("value"))

  /** The full option map [[kafkaCanal]] sets on its writer, as a pure
    * function — the contract-testable surface for the sink's plumbing.
    * Producer tuning passes through `kafka.`-prefixed (the Spark kafka
    * connector strips the prefix and hands the rest to the producer, the
    * same shape as the reference's rdkafka config,
    * `message_queue.rs:101-116`). Reserved sink options can't be
    * masked by a producer option.
    */
  def kafkaOptions(brokers: String, topic: String, checkpointDir: String,
      producerOptions: Map[String, String] = Map.empty): Map[String, String] = {
    val reserved = Map(
      "kafka.bootstrap.servers" -> brokers,
      "topic" -> topic,
      "checkpointLocation" -> checkpointDir)
    val passthrough = producerOptions.map { case (k, v) => s"kafka.$k" -> v }
    val clash = passthrough.keySet & reserved.keySet
    require(clash.isEmpty,
      s"producer options may not override reserved sink options: ${clash.mkString(", ")}")
    passthrough ++ reserved
  }

  /** Envelope rows → Canal-JSON → Kafka topic.
    *
    * NOTE: this environment ships no spark-sql-kafka jar and no broker, so
    * `start()` on this writer cannot run here; the projection above and
    * [[kafkaOptions]] are the testable surface. On a cluster with the kafka
    * connector on the classpath this writer is exactly-once from the
    * checkpoint — stronger than the reference's fire-and-forget producer.
    */
  def kafkaCanal(envelopes: DataFrame, brokers: String, topic: String,
      checkpointDir: String, producerOptions: Map[String, String] = Map.empty)
      : DataStreamWriter[Row] = {
    val w = kafkaProjection(envelopes)
      .writeStream
      .format("kafka")
    kafkaOptions(brokers, topic, checkpointDir, producerOptions)
      .foldLeft(w) { case (acc, (k, v)) => acc.option(k, v) }
  }

  /** Generic queue sink: rows of (topic, payload) pushed per partition with
    * a client built executor-side (`newClient` must be serializable).
    * At-least-once; pair with idempotent consumers or keyed payloads.
    */
  def queueSink(df: DataFrame, topic: org.apache.spark.sql.Column,
      payload: org.apache.spark.sql.Column, checkpointDir: String,
      newClient: () => (String, String) => Unit): StreamingQuery =
    df.select(topic.as("t"), payload.as("p"))
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        batch.foreachPartition { rows: Iterator[Row] =>
          val push = newClient()
          rows.foreach(r => push(r.getString(0), r.getString(1)))
        }
      }
      .start()
}
