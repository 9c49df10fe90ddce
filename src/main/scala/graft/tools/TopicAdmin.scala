package graft.tools

/** Kafka topic admin (reference: kafka/kafka_admin.py:13-35) — the one §2
  * inventory row that is an OPS TOOL, not a query operator: idempotently
  * create a topic (create-if-absent) with explicit partitions / replication
  * factor, defaulting to the reference's `office_input`, 1 partition, RF 1
  * (kafka_admin.py:27).
  *
  * kafka-clients is not on this build's classpath (zero-egress sandbox, no
  * broker), so the AdminClient is reached via reflection behind a classpath
  * guard: the tool parses and validates its config unconditionally — that
  * path is spec-tested — and reports `kafka-clients not on classpath`
  * instead of NoClassDefFoundError when the jar is absent. With
  * kafka-clients deployed alongside (any cluster image that runs the
  * reference has it), the same binary performs the real list/create calls.
  *
  * Usage: `runMain graft.tools.TopicAdmin [--topic name]
  * [--bootstrap host:port[,host:port]] [--partitions n] [--rf n]`.
  */
object TopicAdmin {

  final case class Config(
      topic: String = "office_input",
      bootstrap: String = "localhost:9092",
      partitions: Int = 1,
      replicationFactor: Short = 1)

  def parse(args: Seq[String]): Either[String, Config] = {
    @annotation.tailrec
    def go(rest: List[String], c: Config): Either[String, Config] = rest match {
      case Nil => Right(c)
      case "--topic" :: v :: t =>
        if (v.isEmpty || v.exists(ch => ch.isWhitespace))
          Left(s"invalid topic name: '$v'")
        else go(t, c.copy(topic = v))
      case "--bootstrap" :: v :: t =>
        if (v.split(",").forall(_.matches("[^:,\\s]+:\\d+")))
          go(t, c.copy(bootstrap = v))
        else Left(s"invalid bootstrap servers (host:port[,host:port]): '$v'")
      case "--partitions" :: v :: t =>
        v.toIntOption.filter(_ >= 1) match {
          case Some(n) => go(t, c.copy(partitions = n))
          case None    => Left(s"invalid partition count: '$v'")
        }
      case "--rf" :: v :: t =>
        v.toShortOption.filter(_ >= 1) match {
          case Some(n) => go(t, c.copy(replicationFactor = n))
          case None    => Left(s"invalid replication factor: '$v'")
        }
      case flag :: _ => Left(s"unknown argument: '$flag'")
    }
    go(args.toList, Config())
  }

  /** Create-if-absent via a reflected AdminClient. Returns a human-readable
    * outcome: Right(created|exists) or Left(reason) — the classpath guard
    * lands in Left without touching any kafka class statically.
    */
  def ensureTopic(c: Config): Either[String, String] = {
    val loader = Thread.currentThread().getContextClassLoader
    val adminCls =
      try Class.forName("org.apache.kafka.clients.admin.AdminClient",
        true, loader)
      catch {
        case _: ClassNotFoundException =>
          return Left("kafka-clients not on classpath; deploy " +
            "org.apache.kafka:kafka-clients to run topic admin")
      }
    try {
      val props = new java.util.Properties()
      props.put("bootstrap.servers", c.bootstrap)
      props.put("client.id", "graft_topic_admin")
      val admin = adminCls.getMethod("create", classOf[java.util.Properties])
        .invoke(null, props)
      try {
        val names = admin.getClass.getMethod("listTopics").invoke(admin)
        val existing = names.getClass.getMethod("names").invoke(names)
        val topics = existing.getClass.getMethod("get").invoke(existing)
          .asInstanceOf[java.util.Set[String]]
        if (topics.contains(c.topic)) Right(s"topic ${c.topic} already exists")
        else {
          val newTopicCls = Class.forName(
            "org.apache.kafka.clients.admin.NewTopic", true, loader)
          val topic = newTopicCls
            .getConstructor(classOf[String], classOf[Int], classOf[Short])
            .newInstance(c.topic, Int.box(c.partitions),
              Short.box(c.replicationFactor))
          val coll = java.util.Collections.singletonList(topic)
          val res = admin.getClass.getMethod("createTopics",
              classOf[java.util.Collection[_]])
            .invoke(admin, coll)
          res.getClass.getMethod("all").invoke(res) match {
            case f => f.getClass.getMethod("get").invoke(f)
          }
          Right(s"topic ${c.topic} created " +
            s"(partitions=${c.partitions}, rf=${c.replicationFactor})")
        }
      } finally admin.getClass.getMethod("close").invoke(admin)
    } catch {
      case e: java.lang.reflect.InvocationTargetException =>
        Left(s"kafka admin call failed: ${e.getCause}")
      case e: Exception => Left(s"kafka admin call failed: $e")
    }
  }

  def main(args: Array[String]): Unit =
    parse(args.toIndexedSeq).flatMap(ensureTopic) match {
      case Right(msg) => println(msg)
      case Left(err)  => System.err.println(err); sys.exit(1)
    }
}
