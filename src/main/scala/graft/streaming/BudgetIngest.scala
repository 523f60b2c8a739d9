package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.text.TextOps.budgetSample]]: per-stratum
  * token-budget admission over a micro-batch stream — the ingest-time
  * quota a continuously-assembled training mix needs ("stop taking web
  * data once its budget is spent, keep taking code").
  *
  * Semantics mirror the batch sampler exactly: a running PREFIX SUM of
  * token counts per stratum (rejected docs still advance the sum — the
  * batch side is a window cutoff, not a skip-and-continue knapsack), and
  * a doc is admitted iff its prefix sum is within budget. Within a
  * micro-batch, docs are processed in the batch sampler's salted-hash
  * order; across batches, arrival order IS the order (a stream cannot
  * re-sort history) — so stream == batch whenever batches arrive
  * hash-ordered, which the spec pins, and otherwise the stream is the
  * well-defined arrival-order variant of the same contract.
  *
  * Shape: `flatMapGroupsWithState` with ONE long of state per stratum
  * (the spent budget) — state is O(strata), never O(stream); emission is
  * Append (admitted docs only, each exactly once). */
object BudgetIngest {

  case class BudgetDoc(source: String, doc_id: Long, n_tokens: Long, h: Long)
  case class BudgetAdmit(source: String, doc_id: Long, n_tokens: Long,
                         cum_tokens: Long)

  def budgetStream(docs: Dataset[BudgetDoc],
                   budgetTokens: Long): Dataset[BudgetAdmit] = {
    import docs.sparkSession.implicits._
    docs.groupByKey(_.source)
      .flatMapGroupsWithState[Long, BudgetAdmit](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, rows, state) =>
          var cum = state.getOption.getOrElse(0L)
          val admitted = rows.toSeq.sortBy(d => (d.h, d.doc_id)).flatMap { d =>
            cum += d.n_tokens
            if (cum <= budgetTokens)
              Some(BudgetAdmit(d.source, d.doc_id, d.n_tokens, cum))
            else None
          }
          state.update(cum)
          admitted.iterator
      }
  }
}
