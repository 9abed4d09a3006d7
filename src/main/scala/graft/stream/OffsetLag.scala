package graft.stream

import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicLong

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Consumer-lag alerting, ported from the reference's offset monitor
  * (/root/reference/modules/spark_operations/utils/check_offset_diff.py):
  * it diffs Kafka high-watermarks against Spark's committed offsets per
  * partition and alerts when the lag exceeds `ALLOWED_OFFSET_DIFF=1000`
  * (line 20) AND grew since the previous check (lines 57-69 — both
  * conditions required; a first observation never alerts, matching the
  * "no previous offset log" early-return at lines 50-55).
  *
  * The reference polls offset files from cron; the Spark-native signal
  * is the streaming query's own progress events, so [[OffsetLagMonitor]]
  * is a [[StreamingQueryListener]] — zero extra Kafka consumers, no
  * files, and the lag arrives per micro-batch already split by
  * topic-partition. The rule itself ([[OffsetLag.alerts]]) is a pure
  * function over lag maps, shared by the listener and the tests.
  */
object OffsetLag {

  /** check_offset_diff.py:20 `ALLOWED_OFFSET_DIFF`. */
  val defaultThreshold = 1000L

  final case class Alert(partition: String, lag: Long, prevLag: Long)

  /** Per-partition lag: high-watermark minus committed. */
  def lags(committed: Map[String, Long],
      latest: Map[String, Long]): Map[String, Long] =
    latest.map { case (p, hi) => p -> (hi - committed.getOrElse(p, 0L)) }

  /** The reference's alert rule: lag above threshold AND growing, and
    * only for partitions with a previous observation.
    */
  def alerts(prev: Map[String, Long], curr: Map[String, Long],
      threshold: Long): Seq[Alert] =
    curr.toSeq.sortBy(_._1).collect {
      case (p, lag) if prev.get(p).exists(lag > _) && lag > threshold =>
        Alert(p, lag, prev(p))
    }

  private val mapper = new ObjectMapper

  /** Offset JSON from a SourceProgress field → per-partition map.
    * Kafka sources emit `{"topic":{"0":123,...}}`; single-partition
    * sources (MemoryStream) emit a bare number, keyed "0" here.
    */
  def parseOffsets(json: String): Map[String, Long] =
    Option(json).filter(_.nonEmpty).map(mapper.readTree).map { node =>
      if (node.isNumber) Map("0" -> node.asLong())
      else if (node.isObject)
        node.properties.asScala.flatMap { e =>
          val (topic, v) = (e.getKey, e.getValue)
          if (v.isObject)
            v.properties.asScala
              .map(p => s"$topic-${p.getKey}" -> p.getValue.asLong()).toSeq
          else Seq(topic -> v.asLong())
        }.toMap
      else Map.empty[String, Long]
    }.getOrElse(Map.empty)
}

/** Listener form of the alert rule: feeds each progress event's
  * (latestOffset − endOffset) lags through [[OffsetLag.alerts]],
  * accumulating fired alerts for an external notifier to drain (the
  * reference pushed a LINE message and exited; a library hands the
  * alerts to the caller).
  */
class OffsetLagMonitor(threshold: Long = OffsetLag.defaultThreshold)
    extends StreamingQueryListener {

  @volatile private var prev = Map.empty[String, Long]
  private val fired = new ConcurrentLinkedQueue[OffsetLag.Alert]
  private val progressed = new AtomicLong

  /** Alerts fired so far (oldest first). */
  def alerts: Seq[OffsetLag.Alert] = fired.asScala.toSeq

  /** Progress events observed (listener delivery is async — tests poll
    * this before asserting).
    */
  def progressCount: Long = progressed.get

  /** Pure-state step: record one lag observation, return (and retain)
    * any alerts it fires.
    */
  def observe(curr: Map[String, Long]): Seq[OffsetLag.Alert] = synchronized {
    val a = OffsetLag.alerts(prev, curr, threshold)
    a.foreach(fired.add)
    prev = curr
    a
  }

  override def onQueryStarted(
      e: StreamingQueryListener.QueryStartedEvent): Unit = ()

  override def onQueryProgress(
      e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val curr = e.progress.sources.toSeq.flatMap { s =>
      OffsetLag.lags(
        committed = OffsetLag.parseOffsets(s.endOffset),
        latest = OffsetLag.parseOffsets(s.latestOffset))
    }.toMap
    observe(curr)
    progressed.incrementAndGet(): Unit
  }

  override def onQueryTerminated(
      e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
}
