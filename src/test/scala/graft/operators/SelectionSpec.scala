package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** DSIR importance selection and the sketch corpus-overlap audit. */
class SelectionSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  lazy val docs = Tables.load(spark, "/root/testdata/sf0.001")("documents")

  test("importanceWeights: target docs score above non-target on average, zero-gram docs score 0") {
    val target = docs.where(col("lang") === "en")
    val w = Sampling.importanceWeights(docs, target, buckets = 512).cache()
    assert(w.count() == docs.count())
    // per-gram normalized lift: target-domain docs must average higher
    val lift = w.where(col("n_grams") > 0)
      .select(col("lang") === "en", col("dsir_score") / col("n_grams"))
      .as[(Boolean, Double)].collect()
    val en = lift.filter(_._1).map(_._2)
    val rest = lift.filterNot(_._1).map(_._2)
    assert(en.nonEmpty && rest.nonEmpty)
    assert(en.sum / en.length > rest.sum / rest.length,
      s"en mean ${en.sum / en.length} <= rest mean ${rest.sum / rest.length}")
    // empty text → no grams → exactly zero score
    val empty = Sampling.importanceWeights(
      Seq((1L, ""), (2L, "   ")).toDF("doc_id", "text"), target, buckets = 512)
      .select("n_grams", "dsir_score").as[(Int, Double)].collect()
    empty.foreach { case (n, s) => assert(n == 0 && s == 0.0) }
  }

  test("selectByImportance: k rows, all scores >= the best excluded score, deterministic") {
    val target = docs.where(col("lang") === "en")
    val all = Sampling.importanceWeights(docs, target, buckets = 512)
      .select(col("doc_id"), round(col("dsir_score"), 6).as("r"))
      .as[(Long, Double)].collect().sortBy(t => (-t._2, t._1))
    val picked = Sampling.selectByImportance(docs, target, k = 25, buckets = 512)
      .select("doc_id").as[Long].collect().toSet
    assert(picked.size == 25)
    assert(picked == all.take(25).map(_._1).toSet)
    val again = Sampling.selectByImportance(docs, target, k = 25, buckets = 512)
      .select("doc_id").as[Long].collect().toSet
    assert(again == picked)
  }

  test("gumbelTopK: deterministic per seed, seed-sensitive, weight-faithful") {
    val w = when(col("doc_id") === 7L, lit(10.0)).otherwise(lit(0.0))
    def draw(seed: Long) = Sampling.gumbelTopK(docs, w, k = 20, seed = seed)
      .select("doc_id").as[Long].collect().toSet
    val a = draw(1L)
    assert(a.size == 20)
    assert(a == draw(1L)) // same seed → same sample
    val seeds = (1L to 6L).map(draw)
    assert(seeds.distinct.size > 1, "different seeds never changed the sample")
    // a +10 log-weight (e^10 relative odds) row survives every draw
    seeds.foreach(s => assert(s.contains(7L)))
    // uniform weights: selection rate over seeds is roughly uniform —
    // no doc should appear in every one of 12 independent 20-of-500 draws
    val uni = (1L to 12L).map(s =>
      Sampling.gumbelTopK(docs, lit(0.0), k = 20, seed = s)
        .select("doc_id").as[Long].collect().toSet)
    val always = uni.reduce(_ intersect _)
    assert(always.isEmpty, s"docs selected in all 12 uniform draws: $always")
  }

  test("corpusOverlap: sketch mode matches exact mode at fixture cardinality; slices behave") {
    val a = docs.where(col("doc_id") < 300)
    val b = docs.where(col("doc_id") >= 200)
    val key = TextOps.normalize(col("text"))
    val exact = Sketches.corpusOverlap(a, b, key, key, exact = true).head()
    val sk = Sketches.corpusOverlap(a, b, key, key).head()
    (0 until 4).foreach(i =>
      assert(sk.getLong(i) == exact.getLong(i),
        s"col $i: sketch ${sk.getLong(i)} vs exact ${exact.getLong(i)}"))
    // invariants: union >= max side, intersect <= min side, jaccard in [0,1]
    assert(exact.getLong(2) >= math.max(exact.getLong(0), exact.getLong(1)))
    assert(exact.getLong(3) <= math.min(exact.getLong(0), exact.getLong(1)))
    assert(exact.getDouble(4) >= 0.0 && exact.getDouble(4) <= 1.0)
    // disjoint id-keyed sets: zero intersection, zero ratios
    val dis = Sketches.corpusOverlap(
      docs.where(col("doc_id") < 100), docs.where(col("doc_id") >= 400),
      col("doc_id"), col("doc_id"), exact = true).head()
    assert(dis.getLong(3) == 0 && dis.getDouble(4) == 0.0)
    // identical sets: jaccard and containments exactly 1
    val same = Sketches.corpusOverlap(docs, docs,
      col("doc_id"), col("doc_id"), exact = true).head()
    assert(same.getLong(0) == same.getLong(3))
    assert(same.getDouble(4) == 1.0 && same.getDouble(5) == 1.0 &&
      same.getDouble(6) == 1.0)
    // an EMPTY side: sketch mode must report the same zeros exact does
    // (a null HLL sketch must not leak null counts)
    val empty = docs.where(col("doc_id") < 0)
    val se = Sketches.corpusOverlap(empty, docs,
      col("doc_id"), col("doc_id")).head()
    val ee = Sketches.corpusOverlap(empty, docs,
      col("doc_id"), col("doc_id"), exact = true).head()
    (0 until 4).foreach(i => assert(se.getLong(i) == ee.getLong(i),
      s"col $i: sketch ${se.getLong(i)} vs exact ${ee.getLong(i)}"))
    val bothEmpty = Sketches.corpusOverlap(empty, empty,
      col("doc_id"), col("doc_id")).head()
    (0 until 4).foreach(i => assert(bothEmpty.getLong(i) == 0L))
  }

  test("DSIR kernels equal the HOF featurizer/fold reference bit-for-bit") {
    import org.apache.spark.sql.Column
    val docs = Tables.load(spark, "/root/testdata/sf0.001")("documents")
    val edge = Seq((9001L, "", "en"), (9002L, "one", "en"),
      (9003L, "one two three", "de")).toDF("doc_id", "text", "lang")
    val all = docs.select("doc_id", "text", "lang").unionByName(edge)
    val B = 64
    def hofBuckets(text: Column): Column = {
      val norm = TextOps.normalize(text)
      val grams = filter(
        concat(graft.functions.TextKernels.ngramsCol(norm, 1),
          graft.functions.TextKernels.ngramsCol(norm, 2)),
        g => length(g) > 0)
      transform(grams,
        g => pmod(TextOps.portableHash60(g), lit(B)).cast("int"))
    }
    // bucket arrays: kernel == HOF (order included)
    val bk = all.select(
      graft.functions.TextKernels.dsirGramBucketsCol(
        TextOps.normalize(col("text")), B, portable = true).as("k"),
      hofBuckets(col("text")).as("h"))
    val badB = bk.filter(not(col("k") <=> col("h")))
    assert(badB.isEmpty, badB.collect().take(3).mkString("\n"))
    // fused scorer: kernel == HOF fold, doubles bit-identical
    val lam = (0 until B).map(i => math.log((i + 1.0) / (B + i)))
    val lamLit = typedLit(lam)
    val sc = all.select(
      graft.functions.TextKernels.dsirScoreCol(
        TextOps.normalize(col("text")), lam, B, portable = true).as("k"),
      struct(
        size(hofBuckets(col("text"))).as("n_grams"),
        aggregate(hofBuckets(col("text")), lit(0.0),
          (acc, b) => acc + element_at(lamLit, b + 1)).as("score")).as("h"))
    val badS = sc.filter(not(col("k") <=> col("h")))
    assert(badS.isEmpty, badS.collect().take(3).mkString("\n"))
  }
}
