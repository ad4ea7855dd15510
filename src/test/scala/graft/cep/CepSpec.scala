package graft.cep

import org.scalatest.funsuite.AnyFunSuite
import graft.{GraftEngine, SparkTestBase}

/** MATCH_RECOGNIZE semantics, mirroring the reference e2e suite
  * (reference: test/e2e/cep_test.go, cep_doc_verify_test.go). */
class CepSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("A{2} threshold pattern, ONE ROW PER MATCH, skip past last row") {
    val df = Seq((1000L, 60.0), (2000L, 70.0), (3000L, 40.0), (4000L, 80.0), (5000L, 90.0))
      .toDF("ts", "v")
    val out = GraftEngine.sql(
      "SELECT mn, peak FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, A.v AS peak ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '1h' DEFINE A AS v > 50 ) ORDER BY mn", df)
      .collect().map(r => (r.getLong(0), r.getDouble(1)))
    assert(out.toSeq == Seq((1L, 70.0), (2L, 90.0)))
  }

  test("scalar function library inside DEFINE and MEASURES") {
    val df = Seq((1000L, 16.0, "warn"), (2000L, 25.0, "ERROR"), (3000L, 4.0, "ok"))
      .toDF("ts", "v", "status")
    val out = GraftEngine.sql(
      "SELECT root, msg, pos, sub FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES round(sqrt(LAST(A.v)), 2) AS root, " +
        "concat(upper(LAST(A.status)), '!') AS msg, " +
        "indexof(LAST(A.status), 'RR') AS pos, " +
        "substring(LAST(A.status), 0, 3) AS sub " +
        "ONE ROW PER MATCH PATTERN (A) WITHIN '1h' " +
        "DEFINE A AS sqrt(v) >= 4 AND startswith(lower(status), 'e') " +
        ") ", df)
      .collect().map(r => (r.getDouble(0), r.getString(1), r.getLong(2), r.getString(3)))
    assert(out.toSeq == Seq((5.0, "ERROR!", 1L, "ERR")))
  }

  test("aggregate measures with span expression in outer select") {
    val df = Seq((1L, 1.0), (2L, 2.0), (3L, 3.0), (4L, 4.0), (5L, 5.0), (6L, 6.0))
      .toDF("ts", "v")
    val out = GraftEngine.sql(
      "SELECT hi - lo AS span, hi FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MAX(v) AS hi, MIN(v) AS lo ONE ROW PER MATCH " +
        "PATTERN (A{3}) WITHIN '1h' DEFINE A AS v > 0 ) ORDER BY hi", df)
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    assert(out.toSeq == Seq((2.0, 3.0), (2.0, 6.0)))
  }

  test("ALL ROWS PER MATCH with CLASSIFIER") {
    val df = Seq((1000L, 60.0), (2000L, 70.0), (3000L, 40.0)).toDF("ts", "v")
    val out = GraftEngine.sql(
      "SELECT ts, c FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES CLASSIFIER() AS c ALL ROWS PER MATCH " +
        "PATTERN (A{2}) WITHIN '1h' DEFINE A AS v > 50 ) ORDER BY ts", df)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1000L, "A"), (2000L, "A")))
  }

  test("SUBSET union variables with sum/last measures") {
    val df = Seq((1L, 1, 10.0), (2L, 2, 20.0), (3L, 2, 30.0), (4L, 3, 40.0))
      .toDF("ts", "k", "v")
    val out = GraftEngine.sql(
      "SELECT sv, av, last, mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES SUM(S.v) AS sv, SUM(B.v) AS av, S.v AS last, MATCH_NUMBER() AS mn " +
        "ONE ROW PER MATCH PATTERN (A B+) SUBSET S = (A, B) WITHIN '1h' " +
        "DEFINE A AS k == 1, B AS k == 2 )", df)
      .collect().map(r => (r.getDouble(0), r.getDouble(1), r.getDouble(2), r.getLong(3)))
    assert(out.toSeq == Seq((60.0, 50.0, 30.0, 1L)))
  }

  test("PERMUTE matches either order") {
    val df = Seq(
      ("s1", 1L, "login"), ("s1", 2L, "auth"),
      ("s2", 3L, "auth"), ("s2", 4L, "login"),
      ("s3", 5L, "login"), ("s3", 6L, "login")
    ).toDF("sessionId", "ts", "event")
    val out = GraftEngine.sql(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY sessionId ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, FIRST(Login.ts) AS t1, FIRST(Auth.ts) AS t2 " +
        "ONE ROW PER MATCH PATTERN (PERMUTE(Login, Auth)) WITHIN '10m' " +
        "DEFINE Login AS event == 'login', Auth AS event == 'auth' ) ORDER BY sessionId", df)
      .collect().map(r => (r.getString(0), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == Seq(("s1", 1L, 2L), ("s2", 4L, 3L)))
  }

  test("WITHIN bound rejects slow sequences") {
    val df = Seq((0L, 60.0), (7200000L, 70.0)).toDF("ts", "v") // 2h apart
    val out = GraftEngine.sql(
      "SELECT mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '1h' DEFINE A AS v > 50 )", df)
    assert(out.count() == 0)
  }

  test("PARTITION BY keeps devices independent") {
    val df = Seq(
      ("d1", 1L, 60.0), ("d1", 2L, 70.0),
      ("d2", 3L, 80.0), ("d2", 4L, 90.0), ("d2", 5L, 85.0)
    ).toDF("dev", "ts", "v")
    val out = GraftEngine.sql(
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY dev ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn, A.v AS v ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '1h' DEFINE A AS v > 50 ) ORDER BY dev, mn", df)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq == Seq(("d1", 1L, 70.0), ("d2", 1L, 90.0)))
  }

  test("alternation and reluctant quantifier") {
    val df = Seq((1L, "a"), (2L, "b"), (3L, "b"), (4L, "c")).toDF("ts", "k")
    // greedy B+ takes both b's
    val greedy = GraftEngine.sql(
      "SELECT n FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES COUNT(*) AS n ONE ROW PER MATCH PATTERN (A B+) WITHIN '1h' " +
        "DEFINE A AS k == 'a', B AS k == 'b' )", df)
      .collect().map(_.getLong(0))
    assert(greedy.toSeq == Seq(3L))
    // reluctant B+? takes one
    val reluctant = GraftEngine.sql(
      "SELECT n FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES COUNT(*) AS n ONE ROW PER MATCH PATTERN (A B+?) WITHIN '1h' " +
        "DEFINE A AS k == 'a', B AS k == 'b' )", df)
      .collect().map(_.getLong(0))
    assert(reluctant.toSeq == Seq(2L))
  }

  test("AFTER MATCH SKIP TO NEXT ROW overlaps") {
    val df = Seq((1L, 60.0), (2L, 70.0), (3L, 80.0)).toDF("ts", "v")
    val out = GraftEngine.sql(
      "SELECT mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn ONE ROW PER MATCH " +
        "AFTER MATCH SKIP TO NEXT ROW PATTERN (A{2}) WITHIN '1h' " +
        "DEFINE A AS v > 50 )", df)
    assert(out.count() == 2) // [1,2] and [2,3]
  }

  test("optional and star quantifiers") {
    val df = Seq((1L, "a"), (2L, "c"), (3L, "a"), (4L, "b"), (5L, "c")).toDF("ts", "k")
    val out = GraftEngine.sql(
      "SELECT n FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES COUNT(*) AS n ONE ROW PER MATCH PATTERN (A B* C) WITHIN '1h' " +
        "DEFINE A AS k == 'a', B AS k == 'b', C AS k == 'c' ) ORDER BY n", df)
      .collect().map(_.getLong(0))
    assert(out.toSeq == Seq(2L, 3L)) // a,c and a,b,c
  }

  test("incremental engine evicts rows outside WITHIN — bounded heap on a hot key") {
    val mr = graft.sql.Parser.parse(
      "SELECT mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '1m' DEFINE A AS v > 50 )").matchRecognize.get
    val defineTestFor = (sorted: IndexedSeq[Map[String, Any]]) =>
      (sym: String, pos: Int, acc: IndexedSeq[(Int, String)]) =>
        sorted(pos)("v").asInstanceOf[Double] > 50
    val emit = (sorted: IndexedSeq[Map[String, Any]], m: Matcher.Match, mn: Long) =>
      Iterator.single(org.apache.spark.sql.Row(mn))
    val eng = new CepIncremental(mr,
      m => m("ts").asInstanceOf[Long], defineTestFor, emit, flushEvery = 1024)
    var emitted = 0L
    var maxBuf = 0
    var i = 0L
    while (i < 200000L) { // 200k rows, one key, 1s apart, match pair every 1000s
      val v = if (i % 1000 < 2) 60.0 else 10.0
      emitted += eng.offer(Map("ts" -> i * 1000L, "v" -> v)).size
      maxBuf = math.max(maxBuf, eng.bufferedRows)
      i += 1
    }
    emitted += eng.finish().size
    assert(emitted == 200L)
    // active window is WITHIN (60 rows) + flushEvery batching + context tail
    assert(maxBuf <= 1024 + CepIncremental.ContextRows + 64,
      s"buffer grew to $maxBuf — WITHIN eviction not engaging")
  }

  test("hot key end-to-end: 1M rows in one partition key, bounded active window") {
    import org.apache.spark.sql.functions._
    val df = spark.range(1000000L).select(
      (col("id") * 1000L).as("ts"),
      when(col("id") % 1000 < 2, 60.0).otherwise(10.0).as("v"))
    val out = GraftEngine.sql(
      "SELECT mn FROM stream MATCH_RECOGNIZE ( ORDER BY ts " +
        "MEASURES MATCH_NUMBER() AS mn ONE ROW PER MATCH " +
        "PATTERN (A{2}) WITHIN '1m' DEFINE A AS v > 50 )", df)
    val agg = out.agg(count("mn"), max("mn")).head()
    assert(agg.getLong(0) == 1000L) // one A{2} pair per 1000 rows
    assert(agg.getLong(1) == 1000L) // match numbering stays continuous across flushes
  }

  test("WITHIN wider than MaxRunRows: sparse matches still found, amortized flushes") {
    // 200k rows one key, 1s apart, WITHIN '12h' spans 43200 rows — wider
    // than MaxRunRows (10k), so time-based eviction stalls: the length
    // bound must finalize starts and the flush cadence must stay amortized
    // (a fill-based trigger re-ran the matcher on every offer here), and
    // no match start may be trimmed unexamined.
    import graft.sql._
    val mr = Parser.parse(
      "SELECT * FROM s MATCH_RECOGNIZE ( ORDER BY ts MEASURES COUNT(*) AS n " +
        "ONE ROW PER MATCH PATTERN (A{3}) WITHIN '12h' DEFINE A AS v > 50 )")
      .matchRecognize.get
    def defineTest(sorted: IndexedSeq[Map[String, Any]])(
        sym: String, pos: Int, acc: IndexedSeq[(Int, String)]): Boolean =
      RowEval.truthy(RowEval.eval(mr.defines(sym),
        RowEval.Ctx(sorted, acc :+ (pos, sym), 0L, Some(acc.length), Map.empty, Set("A"))))
    val eng = new CepIncremental(mr, m => m("ts").asInstanceOf[Long], defineTest,
      (sorted, m, mn) => Iterator.single(org.apache.spark.sql.Row(mn)))
    var emitted = 0L
    var maxBuf = 0
    val t0 = System.nanoTime()
    var i = 0L
    while (i < 200000L) {
      val v: Any = if (i % 1000 < 3) 60.0 else 10.0
      emitted += eng.offer(Map("ts" -> i * 1000L, "v" -> v)).size
      maxBuf = math.max(maxBuf, eng.bufferedRows)
      i += 1
    }
    emitted += eng.finish().size
    val sec = (System.nanoTime() - t0) / 1e9
    assert(emitted == 200L, s"expected one A{3} match per 1000 rows, got $emitted")
    assert(maxBuf <= Matcher.MaxRunRows + CepIncremental.FlushEvery +
      CepIncremental.ContextRows, s"buffer grew to $maxBuf")
    assert(sec < 60.0, s"200k rows took $sec s — flush cadence degraded")
  }

  test("row-local DEFINE classification: fast path only when row-confined") {
    import graft.sql._
    val syms = Set("A", "B")
    val subs = Map("U" -> List("A", "B"))
    def ast(s: String) = Parser.parseExpression(s)
    def local(s: String) = RowEval.rowLocalAst(ast(s), "A", syms, subs)
    // row-local: plain columns, own-symbol qualification, scalars, CASE
    assert(local("v > 50").isDefined)
    assert(local("A.v > 50").contains(ast("v > 50"))) // rewritten unqualified
    assert(local("abs(v) > 5 AND status IN ('a','b')").isDefined)
    assert(local("CASE WHEN v > 0 THEN true ELSE false END").isDefined)
    // not row-local: navigation, aggregates, other symbols' bindings
    assert(local("v > prev(v)").isEmpty)
    assert(local("sum(A.v) < 100").isEmpty)
    assert(local("v > B.v").isEmpty)
    assert(local("v > first(U.v)").isEmpty)
    // the compiled test evaluates like the interpreter
    val t = new RowEval.RowLocalTest(ast("v > 50"), "A", subs, syms)
    assert(t.test(Map("v" -> 60.0)) && !t.test(Map("v" -> 10.0)))
    assert(!t.test(Map.empty)) // null comparison → not truthy
  }
}
