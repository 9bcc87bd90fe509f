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

  test("an out-of-horizon straggler never merges backwards into the open session") {
    // the old guard (e.ts - s.last <= gap) is vacuously true for ANY older
    // event, so an hours-late straggler merged into the live session,
    // spanning a silent gap and overlapping sessions already emitted
    val root = tmpDir("sessions_late")
    val schema = spark.createDataset(Seq.empty[Event]).schema
    def writeBatch(n: Int, evs: Seq[Event]): Unit =
      spark.createDataset(evs).write.parquet(s"$root/in/b$n")
    writeBatch(0, Seq(Event(7L, 0L, 1.0), Event(7L, 1000L, 1.0)))

    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1).parquet(s"$root/in/*").as[Event]
    val q = StatefulSessions.sessionize(stream, gapMs = 10000L)
      .writeStream.format("memory").queryName("sessions_late_out").outputMode("append").start()
    try {
      q.processAllAvailable()
      writeBatch(1, Seq(Event(7L, 500000L, 1.0))) // closes [0,1000], opens at 500s
      q.processAllAvailable()
      writeBatch(2, Seq(Event(7L, 2000L, 9.0))) // straggler: 498s older than the open session
      q.processAllAvailable()
      val got = spark.table("sessions_late_out").as[StatefulSessions.SessionOut].collect()
        .sortBy(_.startMs)
      // straggler emits as its own singleton; the open session at 500s is untouched
      assert(got.map(s => (s.startMs, s.endMs, s.nEvents)).toSeq
        == Seq((0L, 1000L, 2L), (2000L, 2000L, 1L)), s"got ${got.toSeq}")
      // no emitted session spans the silent gap into the 500s region
      assert(got.forall(_.endMs < 500000L), s"straggler merged backwards: ${got.toSeq}")
    } finally q.stop()
  }

  test("sessionize refuses the timeout modes it never arms") {
    val events = spark.createDataset(Seq.empty[Event])
    intercept[IllegalArgumentException] {
      StatefulSessions.sessionize(events, 1000L,
        org.apache.spark.sql.streaming.GroupStateTimeout.EventTimeTimeout)
    }
  }
}
