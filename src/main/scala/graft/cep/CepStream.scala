package graft.cep

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types.StructType
import graft.sql._

/** Streaming MATCH_RECOGNIZE: per-key row buffers + the batch matcher over
  * the *safe* prefix of the buffer (reference: cep/engine.go — incremental
  * run sets with a WITHIN sweeper; here WITHIN doubles as the completeness
  * horizon).
  *
  * Emission rule: a match anchored at row `i` can still grow (greedy
  * quantifiers) only by rows with ts ≤ ts(i) + WITHIN. So once the
  * partition has seen maxTs > ts(i) + WITHIN, every match starting at `i`
  * is final. Each micro-batch appends to the buffer, runs the matcher over
  * rows whose starts are final, emits, and drops the consumed prefix.
  * Per-key state is bounded by the reference's maxRunRows. Late rows older
  * than the emitted horizon are dropped (the reference drops sub-watermark
  * rows the same way).
  */
object CepStream extends Serializable {

  /** Consumed rows kept PREV/NEXT-visible (same tail the batch engine
    * keeps — [[CepIncremental.ContextRows]]). */
  private val ContextRows = CepIncremental.ContextRows

  final case class KeyState(
      context: Vector[Map[String, Any]], // consumed tail kept for PREV/NEXT
      buffer: Vector[Map[String, Any]],
      matchCount: Long,
      horizonMs: Long) // rows with ts < horizon are already consumed/emitted

  // (process logic shared with CepExec via these parameters)
  def run(
      keyed: DataFrame,
      keyIdx: Int,
      fieldNames: Array[String],
      outSchema: StructType,
      mr: MatchRecognize,
      symbols: Set[String],
      sortRows: Vector[Map[String, Any]] => IndexedSeq[Map[String, Any]],
      tsOfRow: Map[String, Any] => Long,
      defineTest: (IndexedSeq[Map[String, Any]]) =>
        (String, Int, IndexedSeq[(Int, String)]) => Boolean,
      emitMatch: (IndexedSeq[Map[String, Any]], Matcher.Match, Long) => Iterator[Row],
      idleMs: Long = 0L,
      ttlMs: Long = 0L): DataFrame = {

    val pastLastRow = mr.afterMatch == AfterMatch.PastLastRow
    val fn = (_: String, it: Iterator[Row], state: GroupState[KeyState]) => {
      if (state.hasTimedOut) {
        if (idleMs == 0) {
          // pure-STATETTL reap: buffered partial runs discarded wholesale
          // (reference: counting_window.go:254-267; CEP partitions are
          // LRU-evicted the same way, cep/engine.go:17-22)
          state.remove()
          Iterator.empty
        } else {
        // IDLETIMEOUT (reference: window/watermark.go:108-124 — idle source
        // advances the watermark on processing time): finalize the whole
        // buffer, emit every match, advance the consumed horizon past it
        val st = state.getOption.getOrElse(
          KeyState(Vector.empty, Vector.empty, 0L, Long.MinValue))
        val sorted = st.context ++ st.buffer
        val base = st.context.size
        val matches = Matcher.findMatches(sorted, mr,
          i => tsOfRow(sorted(i)), defineTest(sorted), startFrom = base)
        val out = matches.iterator.zipWithIndex.flatMap { case (m, i) =>
          emitMatch(sorted, m, st.matchCount + i + 1)
        }.toVector
        val horizon =
          if (st.buffer.isEmpty) st.horizonMs
          else math.max(st.horizonMs, tsOfRow(st.buffer.last))
        if (st.buffer.isEmpty && ttlMs > 0) {
          // two idle periods with nothing to flush and an explicit TTL —
          // reap the key (match numbering restarts, as after any eviction)
          state.remove()
        } else {
          state.update(KeyState(sorted.takeRight(ContextRows), Vector.empty,
            st.matchCount + matches.size, horizon))
          // re-arm only toward an explicit TTL reap: arming the idle flush
          // again on a drained buffer would schedule timeout batches forever
          if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        }
        out.iterator
        }
      } else {
      val incoming = it.map(r =>
        fieldNames.zipWithIndex.map { case (n, i) => n -> r.get(i) }.toMap).toVector
      val st = state.getOption.getOrElse(
        KeyState(Vector.empty, Vector.empty, 0L, Long.MinValue))

      // drop late rows below the consumed horizon; append. Context rows
      // (already consumed, ts ≤ horizon) stay in front and are
      // PREV/NEXT-visible but never match starts (`startFrom`).
      val merged = (st.buffer ++ incoming.filter(m => tsOfRow(m) >= st.horizonMs))
      val active = sortRows(merged).toVector
      val sorted = st.context ++ active
      val base = st.context.size
      val maxTs = if (active.isEmpty) Long.MinValue else tsOfRow(active.last)

      // rows whose matches can no longer grow, by either bound:
      //  - time: ts + WITHIN < maxTs, or
      //  - length: ≥ MaxRunRows rows already follow the start (runs are
      //    capped, rows are consumed consecutively — more input cannot
      //    change that start's outcome). The length bound also keeps the
      //    carried state ≤ MaxRunRows without dropping unexamined starts
      //    (a takeRight cap here would discard them silently).
      // Run the matcher over the FULL buffer (a match starting at a safe row
      // may extend into rows beyond safeEnd — those extension rows are
      // guaranteed present, since ext.ts ≤ ts(start)+WITHIN < maxTs), then
      // emit/consume only matches whose START falls in the safe prefix.
      val safeEnd = math.max(
        sorted.lastIndexWhere(m => tsOfRow(m) + mr.withinMs < maxTs) + 1,
        sorted.length - Matcher.MaxRunRows)
      if (safeEnd <= base) {
        state.update(st.copy(buffer = active))
        if (idleMs > 0) state.setTimeoutDuration(idleMs)
        else if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        Iterator.empty
      } else {
        val all = Matcher.findMatches(sorted, mr,
          i => tsOfRow(sorted(i)), defineTest(sorted), startFrom = base)
        // matches are ordered by start under every skip mode, so the
        // safe-start ones form a prefix of the list
        val matches = all.takeWhile(_.startIdx < safeEnd)
        val out = matches.iterator.zipWithIndex.flatMap { case (m, i) =>
          emitMatch(sorted, m, st.matchCount + i + 1)
        }.toVector
        // consume: under PAST LAST ROW, drop through the last emitted match
        // end and always the full safe prefix (unmatched safe rows can never
        // start a future match, and no future match reaches back before its
        // own start row). Under the overlapping skip modes (TO NEXT ROW /
        // TO FIRST / TO LAST), an unsafe-start match may still reuse rows
        // beyond safeEnd that an emitted match consumed — so only the safe
        // prefix may be dropped.
        val consumedUpTo = pastLastRow match {
          case true =>
            if (matches.isEmpty) safeEnd else math.max(safeEnd, matches.last.endIdx + 1)
          case false => safeEnd
        }
        val keep = math.min(ContextRows, consumedUpTo)
        val newContext = sorted.slice(consumedUpTo - keep, consumedUpTo)
        val remaining = sorted.drop(consumedUpTo)
        val newHorizon =
          if (consumedUpTo == base) st.horizonMs
          else tsOfRow(sorted(consumedUpTo - 1))
        state.update(KeyState(newContext, remaining,
          st.matchCount + matches.size, math.max(st.horizonMs, newHorizon)))
        if (idleMs > 0 && remaining.nonEmpty) state.setTimeoutDuration(idleMs)
        else if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
        out.iterator
      }
      }
    }

    val timeout =
      if (idleMs > 0 || ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    keyed
      .groupByKey((r: Row) => r.getString(keyIdx))(Encoders.STRING)
      .flatMapGroupsWithState(OutputMode.Append, timeout)(fn)(
        Encoders.kryo[KeyState], Encoders.row(outSchema))
  }
}
