package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One transport read: `idx`-th chunk of bytes on `session`'s stream. */
final case class ByteChunk(session: Long, idx: Long, bytes: Array[Byte])

/** One reassembled wire packet: `ordinal`-th packet on the session, with
  * its framed sequence id and payload.
  */
final case class WirePacket(session: Long, ordinal: Long, seq: Int,
    payload: Array[Byte])

/** Streaming reassembly of MySQL wire packets from raw transport chunks.
  *
  * The reference's socket loop gets packet alignment for free from
  * blocking `read_exact` calls (`/root/reference/src/mysql.rs:96-137`:
  * 4-byte header, then exactly `len` body bytes). A distributed ingest of
  * captured transport bytes has neither blocking reads nor ordering: a
  * packet can split across chunk boundaries AND chunks of one session can
  * arrive out of order across micro-batches. This operator restores the
  * reference's invariant — downstream sees whole packets in stream order —
  * with per-session state: a reorder buffer of not-yet-contiguous chunks
  * plus the partial bytes of the packet in flight.
  *
  * Scale: one `groupByKey` shuffle on session id; state per session is
  * O(reorder window + one packet), not O(stream). Emitted packets feed
  * the same codecs as batch replay ([[graft.cdc.MysqlPacketSplit]],
  * `BinlogDecode.eventSplit(packetMarker = true)`) — tested equivalent in
  * StreamingSpec against the batch splitter on the concatenated stream.
  */
object PacketReassembly {

  /** Reassembly state: next chunk idx expected, chunks that arrived ahead
    * of it, bytes of the incomplete packet at the stream head, the
    * ordinal of the next packet to emit, and the 16 MB-continuation
    * accumulator (null when no continued packet is in flight).
    */
  final case class ReState(nextIdx: Long, pending: Map[Long, Array[Byte]],
      partial: Array[Byte], nextOrdinal: Long,
      contSeq: Int, contBytes: Array[Byte])

  /** @param maxPending refuse-loudly bound on the per-session reorder
    *   buffer: a gap that never fills (lost chunk) would otherwise grow
    *   state without bound and silently stall the session.
    */
  def reassemble(chunks: Dataset[ByteChunk], maxPending: Int = 4096)
      : Dataset[WirePacket] = {
    import chunks.sparkSession.implicits._
    chunks
      .groupByKey(_.session)
      .flatMapGroupsWithState[ReState, WirePacket](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (session: Long, rows: Iterator[ByteChunk], state: GroupState[ReState]) =>
          var st = state.getOption.getOrElse(
            ReState(0L, Map.empty, Array.emptyByteArray, 0L, 0, null))
          val out = scala.collection.mutable.ArrayBuffer.empty[WirePacket]
          // Park everything, then drain the contiguous prefix: order within
          // a trigger is not guaranteed either, so arrival order is ignored
          // entirely — only idx decides.
          var pending = st.pending
          rows.foreach { c =>
            if (c.idx >= st.nextIdx && !pending.contains(c.idx))
              pending += (c.idx -> c.bytes)
          }
          require(pending.size <= maxPending,
            s"session $session: ${pending.size} buffered chunks exceed " +
              s"maxPending=$maxPending (lost chunk before idx ${st.nextIdx}?)")
          var nextIdx = st.nextIdx
          var ordinal = st.nextOrdinal
          var contSeq = st.contSeq
          var contBytes = st.contBytes
          var partial = st.partial
          val MaxFrame = graft.cdc.MysqlProtocolCodec.MaxFrame
          // Gather the whole contiguous run, then parse ONCE: per-chunk
          // re-concat + re-slice would be O(chunks · bytes) per trigger.
          val run = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
          while (pending.contains(nextIdx)) {
            run += pending(nextIdx)
            pending -= nextIdx
            nextIdx += 1
          }
          if (run.nonEmpty) {
            val buf = new Array[Byte](partial.length + run.iterator.map(_.length).sum)
            var off = partial.length
            System.arraycopy(partial, 0, buf, 0, off)
            run.foreach { c => System.arraycopy(c, 0, buf, off, c.length); off += c.length }
            // drain whole frames from the front; frames of exactly MaxFrame
            // bytes accumulate until their terminating short frame (the
            // 16 MB continuation rule, as in splitPackets) — linear via a
            // growing stream accumulator, not per-frame array concat
            var cont: java.io.ByteArrayOutputStream =
              if (contBytes == null) null
              else { val b = new java.io.ByteArrayOutputStream(contBytes.length + 64)
                b.write(contBytes, 0, contBytes.length); b }
            var pos = 0
            var fits = true
            while (fits && buf.length - pos >= 4) {
              val len = (buf(pos) & 0xff) | ((buf(pos + 1) & 0xff) << 8) |
                ((buf(pos + 2) & 0xff) << 16)
              if (buf.length - pos < 4 + len) fits = false
              else {
                if (len == MaxFrame) {
                  if (cont == null) { cont = new java.io.ByteArrayOutputStream(); contSeq = buf(pos + 3) & 0xff }
                  cont.write(buf, pos + 4, len)
                } else if (cont != null) {
                  cont.write(buf, pos + 4, len)
                  out += WirePacket(session, ordinal, contSeq, cont.toByteArray)
                  ordinal += 1
                  cont = null
                } else {
                  out += WirePacket(session, ordinal, buf(pos + 3) & 0xff,
                    java.util.Arrays.copyOfRange(buf, pos + 4, pos + 4 + len))
                  ordinal += 1
                }
                pos += 4 + len
              }
            }
            contBytes = if (cont == null) null else cont.toByteArray
            partial = java.util.Arrays.copyOfRange(buf, pos, buf.length)
          }
          st = ReState(nextIdx, pending, partial, ordinal, contSeq, contBytes)
          state.update(st)
          out.iterator
      }
  }
}
