package graft.cep

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll
import org.apache.spark.sql.Row
import graft.sql.{Parser, MatchRecognize}

/** Differential property: the incremental batch engine ([[CepIncremental]]
  * with a tiny flushEvery, forcing many safe-prefix evictions) must produce
  * exactly the matches of one full-buffer [[Matcher]] pass, for random
  * event sequences across pattern / quantifier / skip-mode / PREV-in-DEFINE
  * variants. This pins the eviction boundary logic (safe prefix, consumed
  * rows, context tail) independently of the hand-picked suite cases.
  */
object CepIncrementalProps extends Properties("cep.incremental") {

  private def mrOf(clause: String): MatchRecognize =
    Parser.parse(
      "SELECT mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn ONE ROW PER MATCH " + clause + " )")
      .matchRecognize.get

  private val variants: List[MatchRecognize] = List(
    "PATTERN (A{2}) WITHIN '10s' DEFINE A AS value > 50",
    "PATTERN (A B+) WITHIN '15s' DEFINE A AS value > 70, B AS value < 30",
    "AFTER MATCH SKIP TO NEXT ROW PATTERN (A{2}) WITHIN '10s' " +
      "DEFINE A AS value > 50",
    "PATTERN (A+? B) WITHIN '20s' DEFINE A AS value > 40, B AS value < 20",
    // PREV reaches across eviction boundaries (context-tail visibility)
    "PATTERN (A B) WITHIN '10s' DEFINE A AS value > 50, B AS value > PREV(value)"
  ).map(mrOf)

  private def defineTestFor(mr: MatchRecognize)(
      sorted: IndexedSeq[Map[String, Any]])(
      sym: String, pos: Int, acc: IndexedSeq[(Int, String)]): Boolean =
    mr.defines.get(sym) match {
      case None => true
      case Some(cond) =>
        val ctx = RowEval.Ctx(sorted, acc :+ (pos -> sym), 0L,
          Some(acc.length), mr.subsets, mr.defines.keySet)
        RowEval.truthy(RowEval.eval(cond, ctx))
    }

  // emit positional facts as VALUES (ts/count), never indices — indices
  // shift between the incremental buffer and the full buffer
  private def emit(mr: MatchRecognize)(
      sorted: IndexedSeq[Map[String, Any]], m: Matcher.Match, mn: Long): Iterator[Row] =
    Iterator.single(Row(mn,
      sorted(m.assignment.head._1)("ts"),
      sorted(m.assignment.last._1)("ts"),
      m.assignment.size.toLong))

  private val rowsGen: Gen[List[Map[String, Any]]] = for {
    n <- Gen.choose(0, 160)
    vals <- Gen.listOfN(n, Gen.choose(0, 100))
    gaps <- Gen.listOfN(n, Gen.choose(1, 5))
  } yield {
    var ts = 0L
    vals.zip(gaps).map { case (v, g) =>
      ts += g * 1000L
      Map[String, Any]("ts" -> ts, "value" -> v.toLong)
    }
  }

  property("matches full-buffer matcher across eviction boundaries") =
    forAll(rowsGen, Gen.choose(0, variants.size - 1)) { (rows, vi) =>
      val mr = variants(vi)
      val tsOf = (m: Map[String, Any]) => m("ts").asInstanceOf[Long]

      // oracle: one full-buffer pass
      val sorted = rows.toIndexedSeq
      val expected = Matcher.findMatches(sorted, mr, i => tsOf(sorted(i)),
          defineTestFor(mr)(sorted))
        .iterator.zipWithIndex
        .flatMap { case (m, i) => emit(mr)(sorted, m, i + 1L) }.toVector

      // subject: incremental with flushEvery=4 → many eviction rounds
      val eng = new CepIncremental(mr, tsOf, defineTestFor(mr), emit(mr),
        flushEvery = 4)
      val got = rows.iterator.flatMap(eng.offer).toVector ++ eng.finish().toVector

      got == expected
    }
}
