package graft.streaming

import graft.cdc.{BinlogRowCodec, BinlogTxnCodec}
import org.apache.spark.sql.{Dataset, Encoder, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One binlog event stamped with its XA resolution: `xaXid`/`xaState` are
  * set only for events delivered from a resolved XA span (`committed` —
  * a one-phase prepare or a later `XA COMMIT`); everything else passes
  * through unstamped.
  */
final case class XaEvent(session: Long, ordinal: Long,
    xaXid: Option[String], xaState: Option[String], event: Array[Byte])

/** Streaming XA assembly — the distributed-transaction counterpart of
  * [[TxnStream.assembleCommitted]], with the guarantee the batch
  * [[graft.cdc.Transactions.xaAssemble]] cannot give: **resolved-only
  * delivery**. An XA span (`XA START … XA END … XA_PREPARE`) buffers in
  * state until its fate is known — emitted stamped `committed` when the
  * prepare carries the one_phase flag or when a matching `XA COMMIT`
  * statement arrives (possibly MANY triggers later — MySQL holds
  * prepared XA transactions across restarts, so can we), and DISCARDED
  * on `XA ROLLBACK`: a rolled-back distributed transaction never reaches
  * the consumer at all, where the batch operator can only label it after
  * the fact.
  *
  * Scale: state per session = the one open span + every
  * prepared-but-unresolved span's events, keyed by xid — the same
  * holdback the database itself carries for in-doubt XA transactions;
  * it shrinks the moment the transaction manager resolves them. Keyed by
  * session like [[ReplicaStream]]/[[TxnStream]], so the chain shares one
  * shuffle key. Non-XA events (including plain BEGIN..XID traffic) pass
  * through unstamped — compose with [[TxnStream.assembleCommitted]] for
  * local-transaction stamping.
  */
object XaStream {

  /** Public for the product-encoder codegen (see [[TxnStream.TxnState]]).
    * `pending` maps xid text → the prepared span's events, in order.
    */
  final case class XaState(seq: Long, open: Boolean, openXid: Option[String],
      buffered: List[XaEvent], pending: Map[String, List[XaEvent]])

  def assembleResolved(events: Dataset[SessionEvent]): Dataset[XaEvent] = {
    import events.sparkSession.implicits._
    implicit val stateEnc: Encoder[XaState] = Encoders.product[XaState]
    events
      .groupByKey(_.session)
      .flatMapGroupsWithState[XaState, XaEvent](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (session: Long, rows: Iterator[SessionEvent], state: GroupState[XaState]) =>
          var st = state.getOption.getOrElse(
            XaState(0L, open = false, None, Nil, Map.empty))
          val out = scala.collection.mutable.ArrayBuffer.empty[XaEvent]
          rows.toArray.sortBy(_.ordinal).foreach { se =>
            val h = BinlogRowCodec.decodeHeader(se.event, packetMarker = false)
            val tpe = h.getInt(1)
            val body = h.getBinary(6)
            def raw = XaEvent(session, se.ordinal, None, None, se.event)
            val sql = if (tpe == BinlogTxnCodec.QueryType)
              BinlogTxnCodec.decodeQuery(body).getUTF8String(1).toString.trim
            else ""
            val sqlUp = sql.toUpperCase(java.util.Locale.ROOT)
            if (sqlUp.startsWith("XA START")) {
              require(!st.open,
                s"session $session: XA START inside an open span at " +
                  s"ordinal ${se.ordinal} — corrupt capture")
              val x = sql.substring(sql.lastIndexOf(' ') + 1)
              st = st.copy(seq = st.seq + 1, open = true, openXid = Some(x),
                buffered = List(raw))
            } else if (tpe == BinlogTxnCodec.XaPrepareType && st.open) {
              val p = BinlogTxnCodec.decodeXaPrepare(body)
              val x = p.getUTF8String(4).toString
              val span = (raw :: st.buffered).reverse
              if (p.getBoolean(0)) { // one-phase: resolved right here
                span.foreach(e => out += e.copy(
                  xaXid = Some(x), xaState = Some("committed")))
                st = st.copy(open = false, openXid = None, buffered = Nil)
              } else {
                st = st.copy(open = false, openXid = None, buffered = Nil,
                  pending = st.pending + (x -> span))
              }
            } else if (sqlUp.startsWith("XA COMMIT") && !sqlUp.endsWith("ONE PHASE")) {
              // Resolved BEFORE the open-span buffering branch: an XA
              // COMMIT for an already-prepared xid can legally arrive
              // while a DIFFERENT span is open (the transaction manager
              // resolves in-doubt transactions on its own schedule); the
              // statement must resolve the pending span, never be
              // swallowed into — and later mislabeled with — the open one.
              val x = sql.substring(sql.lastIndexOf(' ') + 1)
              require(!(st.open && st.openXid.contains(x)),
                s"session $session: XA COMMIT for the still-open xid $x " +
                  s"before its prepare at ordinal ${se.ordinal} — corrupt capture")
              st.pending.get(x) match {
                case Some(span) =>
                  span.foreach(e => out += e.copy(
                    xaXid = Some(x), xaState = Some("committed")))
                  out += raw // the commit statement itself, unstamped
                  st = st.copy(pending = st.pending - x)
                case None => out += raw // stray commit: pass through
              }
            } else if (sqlUp.startsWith("XA ROLLBACK")) {
              val x = sql.substring(sql.lastIndexOf(' ') + 1)
              require(!(st.open && st.openXid.contains(x)),
                s"session $session: XA ROLLBACK for the still-open xid $x " +
                  s"before its prepare at ordinal ${se.ordinal} — corrupt capture")
              // resolved-only delivery: the rolled-back span is DISCARDED
              st = st.copy(pending = st.pending - x)
              out += raw
            } else if (st.open) {
              st = st.copy(buffered = raw :: st.buffered)
            } else {
              out += raw // non-XA traffic passes through unstamped
            }
          }
          state.update(st)
          out.iterator
      }
  }
}
