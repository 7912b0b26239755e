package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A change-stream row keyed by pk with a monotone ordinal (the reference's
  * `id`/`pos` sequence) and a stringly payload.
  */
final case class ChangeRow(pk: Long, cid: Long, op: String, payload: String)

/** An emitted image transition: the pk's new current payload (null after a
  * DELETE) and the ordinal/op that caused it.
  */
final case class ImageUpdate(pk: Long, cid: Long, payload: String, change: String)

/** Custom keyed state via `flatMapGroupsWithState` — the CDC latest-image
  * fold as *explicit* state rather than a re-rank per batch: per pk the
  * state store holds only (ordinal, payload) of the current image, each
  * micro-batch applies its changes in ordinal order, and a row is emitted
  * only when the image actually transitions (stale/out-of-order ordinals
  * are dropped — the merge semantics of [[graft.cdc.CdcMerge]], stated
  * incrementally).
  *
  * Scale: state is O(live pks) in the state store (RocksDB-backed on a
  * cluster), per-batch work is O(batch), and the only shuffle is the
  * groupByKey hash on pk — the same single-exchange profile as the batch
  * merge, but with per-event emission latency instead of per-batch.
  */
object Stateful {

  def latestImage(changes: Dataset[ChangeRow]): Dataset[ImageUpdate] = {
    import changes.sparkSession.implicits._
    changes
      .groupByKey(_.pk)
      .flatMapGroupsWithState[(Long, String), ImageUpdate](
        OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (pk: Long, rows: Iterator[ChangeRow], state: GroupState[(Long, String)]) =>
          val out = scala.collection.mutable.ArrayBuffer.empty[ImageUpdate]
          // State keeps (ordinal, payload); a DELETE is retained as a
          // tombstone (null payload), NOT removed — dropping it would let a
          // late row with a smaller ordinal resurrect the deleted pk in a
          // later batch. Tombstone GC belongs to a retention policy (state
          // timeout), not to correctness.
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
          out.iterator
      }
  }
}
