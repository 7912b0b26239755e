package graft.cdc

import org.scalatest.funsuite.AnyFunSuite

/** Config load/gen round-trip against the FIXTURES.md §4 template. */
class ConfigSpec extends AnyFunSuite {

  val fixtureJson =
    """{"db_ip":"127.0.0.1","db_port":3306,"max_packages":4294967295,
      |"user_name":"canal","passwd":"canal","workers":8,"from_start":false,
      |"mqs":[{"mq_name":"the_kafka","mq_cfg":{"KAFKA":{"brokers":"127.0.0.1:9092","queue_buffering_max":333}}},
      |       {"mq_name":"the_redis","mq_cfg":{"REDIS":{"ip":"127.0.0.1","port":6379}}}],
      |"instances":[{"mq":"the_kafka","schemas":"test*","tables":"s*",
      |              "black_list":["tb01","tb02"],"topic":"db_change"}]}""".stripMargin

  test("loads the reference-shaped fixture") {
    val c = CdcConfig.load(fixtureJson)
    assert(c.db_port == 3306)
    assert(c.workers == 8)
    assert(c.mqs.map(_.mq_name) == Seq("the_kafka", "the_redis"))
    assert(c.mqs.head.mq_cfg.KAFKA.get.brokers == "127.0.0.1:9092")
    assert(c.mqs(1).mq_cfg.REDIS.get.port == 6379)
    val i = c.instances.head
    assert(i.schemas == "test*" && i.tables == "s*" && i.black_list == Seq("tb01", "tb02"))
  }

  test("gen_default template round-trips and routes like the reference") {
    val c = CdcConfig.load(CdcConfig.toJson(CdcConfig.genDefault))
    assert(c == CdcConfig.genDefault)
    val insts = c.routingInstances
    assert(Routing.route(insts, "testdb", "s01") == Seq(("the_kafka", "db_change")))
    assert(Routing.route(insts, "testdb", "tb01") == Nil)  // blacklisted
    assert(Routing.route(insts, "prod", "s01") == Nil)     // schema mismatch
  }

  test("unknown fields are tolerated (forward compatibility)") {
    val c = CdcConfig.load("""{"db_ip":"h","future_field":1,"instances":[]}""")
    assert(c.db_ip == "h")
  }
}
