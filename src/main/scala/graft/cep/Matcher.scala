package graft.cep

import graft.sql._

/** Pattern matcher for MATCH_RECOGNIZE over one ordered partition.
  *
  * Semantics follow the reference engine (reference: cep/engine.go,
  * cep/pattern.go): greedy quantifiers take the longest match, reluctant the
  * shortest (cep/engine.go:33-35); PERMUTE compiles to all-permutation
  * alternation (cep/pattern.go:134-166); WITHIN is a mandatory bound on
  * (lastTs − firstTs) (types/match_recognize.go:106-107); bounded run length
  * guards memory (cep/engine.go:17-22 maxRunRows).
  *
  * Implementation: backtracking descent over the pattern AST — simpler than
  * the reference's NFA run-sets and equivalent for batch execution, where
  * the partition is fully materialized. (The streaming operator will reuse
  * this per-key on buffered rows below the watermark.)
  */
object Matcher {

  final case class Match(assignment: IndexedSeq[(Int, String)]) {
    def startIdx: Int = assignment.head._1
    def endIdx: Int = assignment.last._1
  }

  val MaxRunRows = 10000 // reference: cep/engine.go:17-22

  /** Find all matches over `rows` honoring AFTER MATCH SKIP.
    *
    * Rows before `startFrom` are context only: visible to PREV/NEXT in
    * DEFINE/MEASURES (they index into `rows`) but never a match start —
    * used by the incremental batch engine, which keeps a tail of already-
    * consumed rows in the buffer for positional navigation.
    */
  def findMatches(
      rows: IndexedSeq[Map[String, Any]],
      mr: MatchRecognize,
      tsOf: Int => Long,
      defineTest: (String, Int, IndexedSeq[(Int, String)]) => Boolean,
      startFrom: Int = 0): Vector[Match] = {

    val pattern = mr.pattern.getOrElse(
      Pattern.Sym(mr.defines.keys.headOption.getOrElse(
        throw new IllegalArgumentException("MATCH_RECOGNIZE requires PATTERN or DEFINE"))))

    val out = Vector.newBuilder[Match]
    var start = startFrom
    while (start < rows.length) {
      tryMatchAt(rows, pattern, start, mr.withinMs, tsOf, defineTest) match {
        case Some(m) if m.assignment.nonEmpty =>
          out += m
          start = mr.afterMatch match {
            case AfterMatch.PastLastRow => m.endIdx + 1
            case AfterMatch.ToNextRow   => m.startIdx + 1
            case AfterMatch.ToFirst(sym) =>
              val i = m.assignment.find(_._2 == sym).map(_._1)
              i.map(x => math.max(x, m.startIdx + 1)).getOrElse(m.endIdx + 1)
            case AfterMatch.ToLast(sym) =>
              val i = m.assignment.reverse.find(_._2 == sym).map(_._1)
              i.map(x => math.max(x, m.startIdx + 1)).getOrElse(m.endIdx + 1)
          }
        case _ => start += 1
      }
    }
    out.result()
  }

  /** Longest (greedy-respecting) match anchored at `start`, or None. */
  private def tryMatchAt(
      rows: IndexedSeq[Map[String, Any]],
      pattern: PatternNode,
      start: Int,
      withinMs: Long,
      tsOf: Int => Long,
      defineTest: (String, Int, IndexedSeq[(Int, String)]) => Boolean): Option[Match] = {

    val startTs = tsOf(start)

    // matchNode returns the continuation positions it can reach, trying
    // preferred (greedy: longest-first) orderings; first full success wins.
    def matchNode(node: PatternNode, pos: Int,
        acc: IndexedSeq[(Int, String)],
        k: (Int, IndexedSeq[(Int, String)]) => Option[IndexedSeq[(Int, String)]])
        : Option[IndexedSeq[(Int, String)]] = node match {

      case Pattern.Sym(name) =>
        if (pos >= rows.length) None
        else if (acc.length >= MaxRunRows) None
        else if (tsOf(pos) - startTs > withinMs) None
        else if (!defineTest(name, pos, acc)) None
        else k(pos + 1, acc :+ (pos, name))

      case Pattern.Seq(parts) =>
        def go(ps: List[PatternNode], p: Int, a: IndexedSeq[(Int, String)])
            : Option[IndexedSeq[(Int, String)]] = ps match {
          case Nil => k(p, a)
          case h :: t => matchNode(h, p, a, (p2, a2) => go(t, p2, a2))
        }
        go(parts, pos, acc)

      case Pattern.Alt(parts) =>
        parts.iterator.map(p => matchNode(p, pos, acc, k)).collectFirst {
          case Some(r) => r
        }

      case Pattern.Permute(parts) =>
        parts.permutations.map(ps => matchNode(Pattern.Seq(ps), pos, acc, k))
          .collectFirst { case Some(r) => r }

      case Pattern.Quant(child, mn, mx, greedy) =>
        val maxN = if (mx < 0) MaxRunRows else mx
        // rep(i): we've consumed i repetitions at position p with bindings a
        def rep(i: Int, p: Int, a: IndexedSeq[(Int, String)])
            : Option[IndexedSeq[(Int, String)]] = {
          val canStop = i >= mn
          val canMore = i < maxN
          def more = if (canMore)
            matchNode(child, p, a, (p2, a2) =>
              if (p2 == p) k(p2, a2) // zero-width guard
              else rep(i + 1, p2, a2))
          else None
          def stop = if (canStop) k(p, a) else None
          if (greedy) more.orElse(stop) else stop.orElse(more)
        }
        rep(0, pos, acc)
    }

    matchNode(pattern, start, IndexedSeq.empty,
      (_, a) => if (a.nonEmpty && a.head._1 == start) Some(a) else None)
      .map(Match)
  }
}
