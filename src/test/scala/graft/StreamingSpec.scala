package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite
import graft.streaming.StreamingOps
import graft.queries.ScalarQueries

class StreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.get
  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  test("streaming hourly counts == batch hourly counts") {
    val stream = StreamingOps.hourlyCounts(StreamingOps.readEventsStream(spark, dir))
    val q = stream.writeStream.outputMode(OutputMode.Complete())
      .format("memory").queryName("hourly_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("hourly_out")
        .select("hour", "event_type", "n", "sum_value").collect().toSet
      val batch = ScalarQueries.qEventsHourly(spark, dir)
        .select(col("hour"), col("event_type"), col("n"), col("sum_value"))
        .collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("gap sessionization on hand-built events") {
    def ev(id: Long, t: String, u: Long, v: Double) =
      StreamingOps.Event(id, java.sql.Timestamp.valueOf(t), u, "click", v)
    val events = Seq(
      ev(1, "2024-01-01 10:00:00", 1, 1.0),
      ev(2, "2024-01-01 10:10:00", 1, 2.0),  // same session (gap 10m)
      ev(3, "2024-01-01 11:30:00", 1, 3.0),  // new session (gap 80m > 30m)
      ev(4, "2024-01-01 09:00:00", 2, 5.0)   // other user
    ).toDS()
    val sessions = StreamingOps.sessionize(events, gapMinutes = 30)
      .collect().sortBy(s => (s.user_id, s.session_start.getTime))
    assert(sessions.length == 3)
    val s1 = sessions(0)
    assert(s1.user_id == 1 && s1.n_events == 2 && s1.total_value == 3.0)
    assert(s1.session_end.toString.startsWith("2024-01-01 10:10"))
    assert(sessions(1).n_events == 1 && sessions(1).total_value == 3.0)
    assert(sessions(2).user_id == 2 && sessions(2).n_events == 1)
  }
}
