package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.Event

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  test("flatMapGroupsWithState sessionizer closes sessions on gap") {
    val root = tmpDir("sessions")
    val events = Seq(
      Event(1L, 0L, 1.0),
      Event(1L, 1000L, 2.0),
      Event(1L, 100000L, 3.0), // > 10s gap: closes first session
      Event(2L, 0L, 5.0)
    )
    spark.createDataset(events).write.parquet(s"$root/in")

    val stream = spark.readStream
      .schema(spark.createDataset(events).schema)
      .parquet(s"$root/in")
      .as[Event]
    val sessions = StatefulSessions.sessionize(stream, gapMs = 10000L)

    val q = sessions.writeStream
      .format("memory")
      .queryName("sessions_out")
      .outputMode("append")
      .start()
    try {
      q.processAllAvailable()
      // only user 1's FIRST session closes (the gap event arrived); open
      // sessions wait on the processing-time timeout
      val got = spark.table("sessions_out").as[StatefulSessions.SessionOut].collect()
      assert(got.length == 1)
      val s = got.head
      assert(s.userId == 1L && s.startMs == 0L && s.endMs == 1000L && s.nEvents == 2 && s.totalValue == 3.0)
    } finally q.stop()
  }
}
