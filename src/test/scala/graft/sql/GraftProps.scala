package graft.sql

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.forAll
import graft.cep.Matcher

/** Property-based checks over the engine's pure kernels (the ScalaCheck
  * layer planned in SURVEY §5): duration parsing, cast semantics, and the
  * CEP matcher's greedy-quantifier behavior.
  */
object GraftProps extends Properties("graft") {

  // ---- Durations ----------------------------------------------------

  property("durations: unit composition sums") =
    forAll(Gen.choose(0, 10000), Gen.choose(0, 59)) { (m: Int, s: Int) =>
      Durations.toMillis(s"${m}m${s}s") == m * 60000L + s * 1000L
    }

  property("durations: bare numbers are seconds") =
    forAll(Gen.choose(0, 100000)) { (n: Int) =>
      Durations.toMillis(n.toString) == n * 1000L
    }

  // ---- cast(x, 'int') (reference: functions_conversion.go:22-71) ----

  private def castInt(v: Any): Any = {
    val lit = v match {
      case s: String => StringLit(s)
      case n: Long   => NumberLit(n.toString)
      case other     => StringLit(other.toString)
    }
    graft.cep.RowEval.eval(
      FuncCall("cast", List(lit, StringLit("int"))),
      graft.cep.RowEval.Ctx(IndexedSeq(Map.empty), IndexedSeq((0, "")), 0L,
        Some(0), Map.empty, Set.empty))
  }

  property("cast int: every long survives exactly (no double round-trip)") =
    forAll { (n: Long) => castInt(n) == n }

  property("cast int: parseable strings round-trip, garbage is null") =
    forAll { (n: Long) => castInt(n.toString) == n } &&
      Prop(castInt("not a number") == null)

  // ---- CEP greedy A+ == maximal runs (cep/engine.go:33-35) ----------

  private val mrPlus = MatchRecognize(
    partitionBy = Nil, orderBy = Nil, measures = Nil, allRows = false,
    afterMatch = AfterMatch.PastLastRow,
    pattern = Some(Pattern.Quant(Pattern.Sym("A"), 1, -1, greedy = true)),
    subsets = Map.empty, defines = Map.empty, withinMs = Long.MaxValue / 4)

  property("matcher: greedy A+ consumes exactly the maximal true-runs") =
    forAll(Gen.listOf(Gen.oneOf(true, false))) { (bits: List[Boolean]) =>
      val rows = bits.zipWithIndex
        .map { case (b, i) => Map[String, Any]("v" -> b, "i" -> i.toLong) }
        .toIndexedSeq
      val matches = Matcher.findMatches(rows, mrPlus,
        i => i.toLong, (_, idx, _) => bits(idx))
      // expected: one match per maximal run of `true`, covering the run
      val runs = bits.zipWithIndex.foldLeft(List.empty[List[Int]]) {
        case (acc, (true, i)) if acc.nonEmpty && acc.head.head == i - 1 =>
          (i :: acc.head) :: acc.tail
        case (acc, (true, i)) => List(i) :: acc
        case (acc, _)         => acc
      }.map(_.reverse).reverse
      matches.size == runs.size &&
        matches.zip(runs).forall { case (m, r) =>
          m.startIdx == r.head && m.endIdx == r.last
        }
    }

  // ---- multimodal fitBox invariants ---------------------------------

  property("fitBox: never exceeds the box, preserves orientation") =
    forAll(Gen.choose(1, 10000), Gen.choose(1, 10000), Gen.choose(1, 4096)) {
      (w: Int, h: Int, maxSide: Int) =>
        val (rw, rh) = graft.operators.Multimodal.fitBox(w, h, maxSide)
        rw <= math.max(maxSide, w) && rh <= math.max(maxSide, h) &&
          rw <= maxSide && rh <= maxSide && rw >= 1 && rh >= 1 &&
          ((w >= h) == (rw >= rh) || w == h || rw == rh)
    }
}
