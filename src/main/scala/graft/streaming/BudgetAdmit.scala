package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** A document offered to the streaming admission gate. */
final case class OfferedDoc(source: String, docId: Long, nTok: Long)

/** The gate's verdict: `cumAfter` is the source's admitted-token total
  * after this decision (unchanged when rejected).
  */
final case class AdmitDecision(source: String, docId: Long, nTok: Long,
    admitted: Boolean, cumAfter: Long)

/** Streaming token-budget admission — the batch stratum-cut selection's
  * (q215) streaming sibling for the case where the corpus ARRIVES: per
  * source, admit each offered doc iff the source's admitted-token total
  * plus the doc still fits the budget; once a source's budget is
  * exhausted it stays exhausted across triggers. The semantics are
  * first-come-first-served WITH SKIP (a rejected doc consumes nothing, so
  * a later smaller doc that fits is still admitted) — the honest streaming
  * contract: unlike q215's batch greedy, an admission gate cannot sort by
  * a quality it has not yet seen; rank upstream (per-trigger) if
  * quality-priority matters.
  *
  * Scale: state is ONE long per source (the admitted total) in the state
  * store, per-trigger work is O(batch), and the only shuffle is the
  * groupByKey hash on source. Within a trigger, a source's docs apply in
  * docId order so replays are deterministic; the source key-space is the
  * mixture's source list — small and stable — so the group fold never
  * concentrates more than one source's BATCH rows on a task.
  */
object BudgetAdmit {

  def admit(docs: Dataset[OfferedDoc],
      budgets: Map[String, Long],
      defaultBudget: Long = 0L): Dataset[AdmitDecision] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, AdmitDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (src: String, rows: Iterator[OfferedDoc], state: GroupState[Long]) =>
          var used = state.getOption.getOrElse(0L)
          val budget = budgets.getOrElse(src, defaultBudget)
          val out = rows.toSeq.sortBy(_.docId).map { d =>
            val ok = used + d.nTok <= budget
            if (ok) used += d.nTok
            AdmitDecision(src, d.docId, d.nTok, ok, used)
          }
          state.update(used)
          out.iterator
      }
  }
}
