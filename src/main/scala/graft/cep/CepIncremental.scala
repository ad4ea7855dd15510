package graft.cep

import org.apache.spark.sql.Row
import graft.sql.{AfterMatch, MatchRecognize}

/** Incremental MATCH_RECOGNIZE over one key's rows arriving in ORDER BY
  * order — the bounded-heap batch engine (reference bound model:
  * cep/engine.go:17-22 maxRunRows + WITHIN sweeper).
  *
  * The batch plan feeds this from `repartition(key) →
  * sortWithinPartitions(key, orderBy) → mapPartitions`, so Spark's
  * spillable external sort does the ordering and this class holds only the
  * active window: a match anchored at row `i` can only grow by rows with
  * ts ≤ ts(i) + WITHIN, so once the key has seen maxTs > ts(i) + WITHIN
  * every match starting at `i` is final and `i` can be evicted (the same
  * safe-prefix rule [[CepStream]] uses per micro-batch). A hot key with
  * 100M rows therefore needs heap for ~one WITHIN-span of rows, not the
  * whole key; density beyond [[Matcher.MaxRunRows]] inside one WITHIN span
  * falls back to the reference's maxRunRows eviction (oldest rows drop).
  *
  * A tail of [[CepIncremental.ContextRows]] consumed rows is retained
  * (match starts excluded via `startFrom`) so PREV/NEXT in DEFINE and
  * MEASURES keep positional visibility across eviction boundaries.
  */
final class CepIncremental(
    mr: MatchRecognize,
    tsOf: Map[String, Any] => Long,
    defineTestFor: IndexedSeq[Map[String, Any]] =>
      (String, Int, IndexedSeq[(Int, String)]) => Boolean,
    emitMatch: (IndexedSeq[Map[String, Any]], Matcher.Match, Long) => Iterator[Row],
    flushEvery: Int = CepIncremental.FlushEvery) {

  private var buffer = Vector.empty[Map[String, Any]]
  private var base = 0 // rows before `base` are PREV/NEXT context only
  private var matchCount = 0L
  private var sinceFlush = 0
  private val pastLastRow = mr.afterMatch == AfterMatch.PastLastRow

  /** Feed the next row (must be in ORDER BY order); returns any rows whose
    * matches became final.
    *
    * The flush cadence counts rows SINCE the last flush, not the buffer
    * fill: when WITHIN spans more rows than [[Matcher.MaxRunRows]] nothing
    * is consumable for a long stretch, the buffer stays pinned at the cap,
    * and a fill-based trigger would re-run the matcher on EVERY offer —
    * turning a dense hot key quadratic. */
  def offer(m: Map[String, Any]): Iterator[Row] = {
    buffer :+= m
    sinceFlush += 1
    if (sinceFlush >= flushEvery) { sinceFlush = 0; flush(fin = false) }
    else Iterator.empty
  }

  /** Key exhausted: match and emit everything still buffered. */
  def finish(): Iterator[Row] = flush(fin = true)

  /** Test probe: rows currently held (active + context). */
  private[cep] def bufferedRows: Int = buffer.size

  private def flush(fin: Boolean): Iterator[Row] = {
    if (buffer.size <= base) return Iterator.empty
    val sorted = buffer
    val maxTs = tsOf(sorted.last)
    // rows whose matches can no longer grow, by either bound:
    //  - time: ts + WITHIN < maxTs (identical rule to CepStream), or
    //  - length: ≥ MaxRunRows rows already follow the start — the matcher
    //    consumes consecutive rows and caps a run at MaxRunRows, so more
    //    input cannot change the outcome at that start. Without the length
    //    bound, a WITHIN wider than MaxRunRows rows pins the buffer at the
    //    cap and the trim below would drop starts never examined.
    // Matches starting in the safe prefix may extend past safeEnd — those
    // rows are present by the same bounds — so run the matcher over the
    // full buffer and emit only matches whose START is safe.
    val safeEnd =
      if (fin) sorted.length
      else math.max(
        sorted.lastIndexWhere(m => tsOf(m) + mr.withinMs < maxTs) + 1,
        sorted.length - Matcher.MaxRunRows)
    val out: Vector[Row] =
      if (safeEnd <= base) Vector.empty
      else {
        val all = Matcher.findMatches(sorted, mr, i => tsOf(sorted(i)),
          defineTestFor(sorted), startFrom = base)
        // matches are ordered by start under every skip mode
        val matches = if (fin) all else all.takeWhile(_.startIdx < safeEnd)
        val o = matches.iterator.zipWithIndex.flatMap { case (mm, i) =>
          emitMatch(sorted, mm, matchCount + i + 1)
        }.toVector
        matchCount += matches.size
        // consume: under PAST LAST ROW also the rows of the last emitted
        // match (no future match can reuse them); under overlapping skip
        // modes only the safe prefix.
        val consumedUpTo =
          if (fin) sorted.length
          else if (pastLastRow) {
            if (matches.isEmpty) safeEnd
            else math.max(safeEnd, matches.last.endIdx + 1)
          } else safeEnd
        val keep = math.min(CepIncremental.ContextRows, consumedUpTo)
        buffer = buffer.drop(consumedUpTo - keep)
        base = keep
        o
      }
    // hard bound when rows are dense inside one WITHIN span: evict oldest
    // (reference maxRunRows — any single match is ≤ MaxRunRows rows anyway)
    if (!fin && buffer.size - base > Matcher.MaxRunRows) {
      val dropN = buffer.size - base - Matcher.MaxRunRows
      buffer = buffer.drop(dropN)
      base = math.max(0, base - dropN)
    }
    out.iterator
  }
}

object CepIncremental {
  /** Amortizes matcher invocations: the safe-prefix scan runs once per this
    * many buffered rows, not per row. */
  val FlushEvery = 8192
  /** Consumed rows kept for PREV/NEXT positional visibility. */
  val ContextRows = 64
}
