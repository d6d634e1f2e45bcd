package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.streaming._

/** Streaming twin of `holt_smooth`
  * ([[graft.operators.RecurrenceOps.holtSmooth]]): the SAME Holt
  * level+trend recurrence run ONLINE as per-key streaming state —
  * the live "SLO trend forecast" a monitor wants, against the batch
  * plane's backfill. The recurrence state is exactly what a stateful
  * stream carries anyway ((l, b) per key, two doubles — O(keys)
  * state, corpus-independent), which is the operational payoff of
  * having written the batch side as a recurrence rather than a
  * black-box window: batch scan, recursive oracle, and live stream
  * all step the same two-line update, and RecurrenceSpec pins all
  * three trajectories against each other.
  *
  * Ordering contract: within a micro-batch each key's rows fold in
  * ascending day order (sorted here); a day at or before the key's
  * last applied day is LATE data and is dropped — a smoother's state
  * cannot be rewound without replay (that replay is the batch twin).
  * Same convention as the repo's other order-sensitive twins.
  */
class HoltProcessor(alpha: Double, beta: Double)
  extends StatefulProcessor[String, HoltStream.DayVal, HoltStream.HoltPoint] {

  import HoltStream.{DayVal, HoltPoint, HoltState}

  @transient private var st: ValueState[HoltState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    st = getHandle.getValueState("holt", Encoders.product[HoltState],
      TTLConfig.NONE)

  override def handleInputRows(key: String, rows: Iterator[DayVal],
      timers: TimerValues): Iterator[HoltPoint] = {
    val out = Seq.newBuilder[HoltPoint]
    var cur = if (st.exists()) Option(st.get()) else None
    rows.toSeq.sortBy(_.k).foreach { r =>
      cur match {
        case Some(c) if r.k <= c.lastK => // late/duplicate day: dropped
        case Some(c) =>
          val lNew = alpha * r.x + (1 - alpha) * (c.l + c.b)
          val bNew = beta * (lNew - c.l) + (1 - beta) * c.b
          cur = Some(HoltState(lNew, bNew, r.k))
          out += HoltPoint(key, r.k, lNew, bNew)
        case None => // seed (x_first, 0) — the batch scan's anchor row
          cur = Some(HoltState(r.x, 0.0, r.k))
          out += HoltPoint(key, r.k, r.x, 0.0)
      }
    }
    cur.foreach(st.update)
    out.result().iterator
  }

  override def handleExpiredTimer(key: String, timers: TimerValues,
      info: ExpiredTimerInfo): Iterator[HoltStream.HoltPoint] =
    Iterator.empty // no timers: pure state carry, no event-time logic
}

object HoltStream {

  case class DayVal(event_type: String, k: Int, x: Double)
  case class HoltState(l: Double, b: Double, lastK: Int)
  case class HoltPoint(event_type: String, k: Int, level: Double,
    trend: Double)

  /** Holt points over a streaming (event_type, k, x) day feed.
    * Requires the RocksDB state store (the repo's test/production
    * default), like every transformWithState plane here.
    */
  def holtPoints(daily: DataFrame, alpha: Double = 0.3,
      beta: Double = 0.2): Dataset[HoltPoint] = {
    val spark = daily.sparkSession
    import spark.implicits._
    daily.as[DayVal]
      .groupByKey(_.event_type)
      .transformWithState(new HoltProcessor(alpha, beta),
        TimeMode.None(), OutputMode.Append())
  }
}
