package graft.streaming

import graft.cdc.MysqlReplicaSession
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One binlog event surfaced by the streaming replica session: the
  * `ordinal`-th event on `session`, bytes ready for
  * `BinlogDecode.eventSplit` (network marker already stripped).
  */
final case class SessionEvent(session: Long, ordinal: Long, event: Array[Byte])

/** The composed socket-free replication client as ONE streaming stage:
  * reassembled wire packets → [[graft.cdc.MysqlReplicaSession]] fold
  * (bring-up phases and the COM_BINLOG_DUMP streaming phase) → whole
  * binlog events. This is the reference's main loop
  * (`/root/reference/src/main.rs:74-130`) with the blocking socket reads
  * replaced by a per-session state fold over a captured byte stream;
  * chaining it after [[PacketReassembly.reassemble]] gives
  * chunks → packets → session → events → typed rows → snapshot as a
  * single Structured Streaming query (see CdcEndToEndSpec).
  *
  * The fold consumes packets strictly in `ordinal` order. The reassembler
  * emits ordinals contiguously per session, and checkpoint recovery
  * replays a batch deterministically, so replayed packets (ordinal below
  * the cursor) are dropped and a genuine gap — which can only mean the
  * stages were rewired against different checkpoints — fails loudly
  * rather than feeding the state machine out-of-order bytes.
  *
  * `send`-side packets (login response, queries, the dump command) have no
  * transport to go to in capture replay — the captured server side already
  * answered them; a live deployment drives its socket by folding
  * [[MysqlReplicaSession.onPayload]] outside Spark (the documented
  * transport exclusion) and ships the received bytes here as chunks.
  *
  * Scale: state per session is O(1) — the session phase + cursor, no
  * buffered bytes (the reassembler owns reorder buffering). One shuffle on
  * session id, same key as reassembly, so AQE keeps the stages co-partitioned.
  */
object ReplicaStream {

  /** Fold state: the pure session state + the next packet ordinal expected
    * + how many events this session has emitted (the event ordinal).
    */
  final case class FoldState(st: MysqlReplicaSession.State,
      nextOrdinal: Long, eventsOut: Long)

  /** Packets of many sessions → decoded binlog events, streaming. */
  def events(packets: Dataset[WirePacket], config: MysqlReplicaSession.Config)
      : Dataset[SessionEvent] = {
    import packets.sparkSession.implicits._
    // Java serialization for the state store: State carries a sealed Phase
    // hierarchy that product encoders can't express. State is O(bytes of
    // one seed) per session, so codec speed is irrelevant here.
    implicit val stateEnc: Encoder[FoldState] = Encoders.javaSerialization[FoldState]
    packets
      .groupByKey(_.session)
      .flatMapGroupsWithState[FoldState, SessionEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (session: Long, rows: Iterator[WirePacket], state: GroupState[FoldState]) =>
          var fs = state.getOption.getOrElse(
            FoldState(MysqlReplicaSession.initial(config), 0L, 0L))
          val out = scala.collection.mutable.ArrayBuffer.empty[SessionEvent]
          // group iterators after a shuffle have no order guarantee; the
          // per-trigger run is bounded, so an in-memory sort is fine
          rows.toArray.sortBy(_.ordinal).foreach { p =>
            if (p.ordinal >= fs.nextOrdinal) {
              require(p.ordinal == fs.nextOrdinal,
                s"session $session: packet ordinal ${p.ordinal} arrived but " +
                  s"${fs.nextOrdinal} expected — replica fold rewired against a " +
                  "different reassembly checkpoint?")
              val step = MysqlReplicaSession.onPayload(fs.st, p.payload)
              var next = FoldState(step.state, p.ordinal + 1, fs.eventsOut)
              step.event.foreach { ev =>
                out += SessionEvent(session, next.eventsOut, ev)
                next = next.copy(eventsOut = next.eventsOut + 1)
              }
              fs = next
            } // ordinal < nextOrdinal: deterministic replay after recovery — drop
          }
          state.update(fs)
          out.iterator
      }
  }

  /** The whole chain from raw transport chunks: reassemble, then fold. */
  def fromChunks(chunks: Dataset[ByteChunk], config: MysqlReplicaSession.Config,
      maxPending: Int = 4096,
      idleTimeout: scala.concurrent.duration.Duration =
        scala.concurrent.duration.Duration.Zero): Dataset[SessionEvent] =
    events(PacketReassembly.reassemble(chunks, maxPending, idleTimeout), config)
}
