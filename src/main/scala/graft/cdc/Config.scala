package graft.cdc

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule
import java.nio.file.{Files, Paths}

/** Pipeline configuration, shape-compatible with the reference's JSON config
  * (`/root/reference/src/config.rs:87-134`; template FIXTURES.md §4):
  * connection coordinates, MQ declarations (Kafka/Redis), and routing
  * instances. `gen`/`load` mirror the reference's `--gen`/`--serve` halves
  * (`/root/reference/src/main.rs:56-71`).
  */
final case class KafkaCfg(brokers: String, queue_buffering_max: Int = 333)
final case class RedisCfg(ip: String, port: Int = 6379)
final case class MqCfg(KAFKA: Option[KafkaCfg] = None, REDIS: Option[RedisCfg] = None)
final case class MqDecl(mq_name: String, mq_cfg: MqCfg)
final case class InstanceCfg(
    mq: String, schemas: String, tables: String,
    black_list: Seq[String] = Nil, topic: String)

final case class CdcConfig(
    db_ip: String = "127.0.0.1",
    db_port: Int = 3306,
    max_packages: Long = 4294967295L,
    user_name: String = "canal",
    passwd: String = "canal",
    workers: Int = 8,
    from_start: Boolean = false,
    mqs: Seq[MqDecl] = Nil,
    instances: Seq[InstanceCfg] = Nil) {

  /** Routing view consumed by [[Routing]]. */
  def routingInstances: Seq[Instance] =
    instances.map(i => Instance(i.mq, i.topic, i.schemas, i.tables, i.black_list))
}

object CdcConfig {
  private val mapper = new ObjectMapper()
    .registerModule(DefaultScalaModule)
    .configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)

  def load(json: String): CdcConfig = mapper.readValue(json, classOf[CdcConfig])

  def loadFile(path: String): CdcConfig =
    load(Files.readString(Paths.get(path)))

  def toJson(c: CdcConfig): String =
    mapper.writerWithDefaultPrettyPrinter().writeValueAsString(c)

  /** Default template, field-for-field the reference's `gen_default`
    * (`/root/reference/src/config.rs:116-134`).
    */
  def genDefault: CdcConfig = CdcConfig(
    mqs = Seq(
      MqDecl("the_kafka", MqCfg(KAFKA = Some(KafkaCfg("127.0.0.1:9092")))),
      MqDecl("the_redis", MqCfg(REDIS = Some(RedisCfg("127.0.0.1"))))),
    instances = Seq(
      InstanceCfg(mq = "the_kafka", schemas = "test*", tables = "s*",
        black_list = Seq("tb01", "tb02"), topic = "db_change")))
}
