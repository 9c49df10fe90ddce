package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** K5 ops tool: config parsing is fully spec-tested; the AdminClient path
  * is classpath-guarded (no kafka-clients, no broker in this sandbox), so
  * the guard itself is the testable behavior there.
  */
class TopicAdminSpec extends AnyFunSuite {

  test("defaults mirror the reference: office_input, 1 partition, RF 1") {
    assert(TopicAdmin.parse(Nil) === Right(TopicAdmin.Config(
      "office_input", "localhost:9092", 1, 1)))
  }

  test("all flags parse") {
    assert(TopicAdmin.parse(Seq(
      "--topic", "events_in", "--bootstrap", "k1:9092,k2:9093",
      "--partitions", "12", "--rf", "3")) ===
      Right(TopicAdmin.Config("events_in", "k1:9092,k2:9093", 12, 3)))
  }

  test("invalid values are rejected with the offending input named") {
    assert(TopicAdmin.parse(Seq("--partitions", "0")).isLeft)
    assert(TopicAdmin.parse(Seq("--partitions", "abc")).isLeft)
    assert(TopicAdmin.parse(Seq("--rf", "-1")).isLeft)
    assert(TopicAdmin.parse(Seq("--bootstrap", "nocolon")).isLeft)
    assert(TopicAdmin.parse(Seq("--topic", "has space")).isLeft)
    assert(TopicAdmin.parse(Seq("--mystery", "x")) ===
      Left("unknown argument: '--mystery'"))
  }

  test("without kafka-clients on the classpath the guard reports it") {
    TopicAdmin.ensureTopic(TopicAdmin.Config()) match {
      case Left(msg) => assert(msg.contains("kafka-clients not on classpath"))
      case Right(r)  => fail(s"expected classpath guard, got: $r")
    }
  }
}
