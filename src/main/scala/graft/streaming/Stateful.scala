package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode,
  StatefulProcessor, TimeMode, TimerValues, TTLConfig, ValueState}
import scala.concurrent.duration.Duration

/** A change-stream row keyed by pk with a monotone ordinal (the reference's
  * `id`/`pos` sequence) and a stringly payload.
  */
final case class ChangeRow(pk: Long, cid: Long, op: String, payload: String)

/** An emitted image transition: the pk's new current payload (null after a
  * DELETE) and the ordinal/op that caused it.
  */
final case class ImageUpdate(pk: Long, cid: Long, payload: String, change: String)

/** A CLOSED SCD2 version: the pk's payload was current over the half-open
  * ordinal interval [validFrom, validTo).
  */
final case class VersionRow(pk: Long, validFrom: Long, validTo: Long, payload: String)

/** Custom keyed state via `flatMapGroupsWithState` — the CDC latest-image
  * fold as *explicit* state rather than a re-rank per batch: per pk the
  * state store holds only (ordinal, payload) of the current image, each
  * micro-batch applies its changes in ordinal order, and a row is emitted
  * only when the image actually transitions (stale/out-of-order ordinals
  * are dropped — the merge semantics of [[graft.cdc.CdcMerge]], stated
  * incrementally).
  *
  * Scale: state is O(live pks + tombstones inside the retention window)
  * in the state store (RocksDB-backed on a cluster), per-batch work is
  * O(batch), and the only shuffle is the groupByKey hash on pk — the same
  * single-exchange profile as the batch merge, but with per-event
  * emission latency instead of per-batch.
  */
object Stateful {

  /** @param tombstoneTtl how long a DELETE tombstone is retained to fence
    *   late smaller-ordinal rows; after it expires the pk's state entry is
    *   dropped (a row later than the TTL could then resurrect — pick the
    *   TTL ≥ the pipeline's max disorder). `Duration.Zero`/negative keeps
    *   tombstones forever (correct, but state grows with all pks ever
    *   deleted).
    */
  def latestImage(changes: Dataset[ChangeRow],
      tombstoneTtl: Duration = Duration.Zero): Dataset[ImageUpdate] = {
    import changes.sparkSession.implicits._
    val ttlMs = if (tombstoneTtl.isFinite && tombstoneTtl.toMillis > 0)
      tombstoneTtl.toMillis else 0L
    val conf = if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[(Long, String), ImageUpdate](OutputMode.Update, conf) {
        (pk: Long, rows: Iterator[ChangeRow], state: GroupState[(Long, String)]) =>
          if (state.hasTimedOut) {
            // only tombstones arm a timeout — expiry drops the fence entry
            state.remove()
            Iterator.empty
          } else {
            val out = scala.collection.mutable.ArrayBuffer.empty[ImageUpdate]
            // State keeps (ordinal, payload); a DELETE is retained as a
            // tombstone (null payload), NOT removed — dropping it would let
            // a late row with a smaller ordinal resurrect the deleted pk in
            // a later batch.
            var cur: Option[(Long, String)] = state.getOption
            def live: Boolean = cur.exists(_._2 != null)
            rows.toSeq.sortBy(_.cid).foreach { r =>
              val stale = cur.exists(_._1 >= r.cid)
              if (!stale) {
                if (r.op == "DELETE") {
                  if (live) out += ImageUpdate(pk, r.cid, null, "DELETE")
                  cur = Some((r.cid, null))
                } else {
                  cur = Some((r.cid, r.payload))
                  out += ImageUpdate(pk, r.cid, r.payload, r.op)
                }
              }
            }
            cur.foreach(state.update)
            if (ttlMs > 0 && !live && cur.isDefined) state.setTimeoutDuration(ttlMs)
            out.iterator
          }
      }
  }

  /** Incremental SCD2: the streaming face of [[graft.cdc.CdcMerge.scd2]].
    * Per pk the state store holds only the OPEN version (valid_from,
    * payload); each arriving change closes it — emitting the finished
    * [[VersionRow]] exactly once — and opens the next (DELETE closes
    * without opening). Emitted rows ∪ state's open versions equal the
    * batch scd2 of the full stream at every point, so the history table
    * is append-only downstream (no rewrites, unlike re-running batch
    * scd2 per micro-batch over all history).
    *
    * Contract: per-pk ordinal order within and across batches (what a
    * pk-hash-partitioned binlog stream delivers); state is O(live pks),
    * the only shuffle is the pk groupByKey.
    */
  def scd2Stream(changes: Dataset[ChangeRow]): Dataset[VersionRow] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.pk)
      // Append, not Update: a closed version is final and emitted exactly
      // once, which is what lets the sink be an append-only file/table.
      .flatMapGroupsWithState[(Long, String), VersionRow](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (pk: Long, rows: Iterator[ChangeRow], state: GroupState[(Long, String)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[VersionRow]
          var open: Option[(Long, String)] = state.getOption
          rows.toSeq.sortBy(_.cid).foreach { r =>
            open.foreach { case (from, payload) =>
              out += VersionRow(pk, from, r.cid, payload)
            }
            open = if (r.op == "DELETE") None else Some((r.cid, r.payload))
          }
          open match {
            case Some(o) => state.update(o)
            case None => state.remove()
          }
          out.iterator
      }
  }

  /** The latest-image fold on the CURRENT-generation arbitrary-state API
    * (`transformWithState`, Spark 4): same semantics as [[latestImage]]
    * (transition-only emission, stale ordinals dropped, DELETE tombstones
    * retained), state in a named `ValueState` on the RocksDB-backed store
    * the API requires. Kept alongside the `flatMapGroupsWithState`
    * version deliberately — StreamingSpec asserts the two agree — since
    * clusters pin different state-store stacks.
    */
  class LatestImageProcessor
      extends StatefulProcessor[Long, ChangeRow, ImageUpdate] {
    @transient private var cur: ValueState[(Long, String)] = _
    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      cur = getHandle.getValueState[(Long, String)]("img",
        Encoders.product[(Long, String)], TTLConfig.NONE)
    override def handleInputRows(pk: Long, rows: Iterator[ChangeRow],
        tv: TimerValues): Iterator[ImageUpdate] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[ImageUpdate]
      var state: Option[(Long, String)] = if (cur.exists()) Some(cur.get()) else None
      def live: Boolean = state.exists(_._2 != null)
      rows.toSeq.sortBy(_.cid).foreach { r =>
        val stale = state.exists(_._1 >= r.cid)
        if (!stale) {
          if (r.op == "DELETE") {
            if (live) out += ImageUpdate(pk, r.cid, null, "DELETE")
            state = Some((r.cid, null))
          } else {
            state = Some((r.cid, r.payload))
            out += ImageUpdate(pk, r.cid, r.payload, r.op)
          }
        }
      }
      state.foreach(cur.update)
      out.iterator
    }
  }

  /** [[latestImage]] via `transformWithState`. Requires the RocksDB state
    * store provider (`spark.sql.streaming.stateStore.providerClass`).
    */
  def latestImageTws(changes: Dataset[ChangeRow]): Dataset[ImageUpdate] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.pk)
      .transformWithState(new LatestImageProcessor,
        TimeMode.None(), OutputMode.Update())
  }
}
