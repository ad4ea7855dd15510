package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.{SparkTestBase, Tables}

/** Unigram-LM tokenizer: Viterbi decode rule, hard-EM training. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private val charModel: Seq[(String, Double)] =
    ('a' to 'z').map(c => c.toString -> -5.0)

  private def model(extra: (String, Double)*): Unigram.Model = {
    val all = charModel ++ extra
    Unigram.Model(all.map(_._1), all.map(_._2))
  }

  private def seg(text: String, m: Unigram.Model): Seq[String] =
    Seq(text).toDF("text")
      .select(Unigram.segment(TextOps.normalize(col("text")), m).as("p"))
      .head().getSeq[String](0)

  test("Viterbi picks the max-likelihood segmentation, not greedy prefixes") {
    val m = model("foo" -> -2.0, "bar" -> -2.0, "foobar" -> -3.5,
      "na" -> -2.5, "tion" -> -2.0)
    assert(seg("foobar", m) == Seq("foobar"))           // -3.5 beats -4
    assert(seg("nation", m) == Seq("na", "tion"))       // -4.5 beats chars
    assert(seg("barfoo zebra", m) ==
      Seq("bar", "foo", "z", "e", "b", "r", "a"))
    // whole-word piece loses when the split is more likely
    val m2 = model("foo" -> -2.0, "bar" -> -2.0, "foobar" -> -4.5)
    assert(seg("foobar", m2) == Seq("foo", "bar"))
  }

  test("unknown characters fall back to single-char unk pieces; ties prefer the longer piece") {
    assert(seg("xq7", model()) == Seq("x", "q", "7"))
    // exact tie: "aa" at -10 equals a+a at -10 → longer piece wins
    val m = model("aa" -> -10.0)
    assert(seg("aa", m) == Seq("aa"))
    assert(seg("", model()) == Seq.empty)
    // an unseen SUPPLEMENTARY code point falls back as ONE piece (a
    // UTF-16 walk would emit two lone surrogates); the word still
    // concatenates back
    val withEmoji = seg("a𝄞b", model())
    assert(withEmoji == Seq("a", "𝄞", "b"))
    assert(withEmoji.mkString("") == "a𝄞b")
  }

  test("corpusNll is per WORD and train(emIters = 0) still prunes to vocabSize") {
    val docs = Seq((1L, "ab ab")).toDF("doc_id", "text")
    // hand model: chars at -5 → each word = 2 pieces = -10 → NLL/word 10
    assert(math.abs(Unigram.corpusNll(docs, model()) - 10.0) < 1e-12)
    val big = Seq.fill(20)("ab ab cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m0 = Unigram.train(big, vocabSize = 5, maxPieceLen = 2, emIters = 0)
    // ≤ vocabSize top pieces plus the never-pruned character floor
    assert(m0.pieces.size <= 5 + 4, m0.pieces.toString)
  }

  test("hard-EM training recovers planted composite pieces and is deterministic") {
    val docs = Seq.fill(50)("ab ab cd").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val m = Unigram.train(docs, vocabSize = 6, maxPieceLen = 2, emIters = 3)
    val top = m.pieces.zip(m.logps).sortBy(-_._2).take(2).map(_._1).toSet
    assert(top == Set("ab", "cd"), m.pieces.zip(m.logps).toString)
    // segmentation under the trained model uses the composites
    assert(seg("abcd", m) == Seq("ab", "cd"))
    // deterministic refit
    val m2 = Unigram.train(docs, vocabSize = 6, maxPieceLen = 2, emIters = 3)
    assert(m.pieces == m2.pieces && m.logps == m2.logps)
    // the trained model explains the corpus better than its char baseline
    val chars = Unigram.train(docs, vocabSize = 6, maxPieceLen = 1,
      emIters = 1)
    assert(Unigram.corpusNll(docs, m) < Unigram.corpusNll(docs, chars))
  }

  test("tokenize covers the corpus exactly: pieces concatenate back to the normalized words") {
    val docs = Tables.load(spark, "/root/testdata/sf0.001")("documents")
      .limit(100)
    val m = Unigram.train(docs, vocabSize = 500, maxPieceLen = 4,
      emIters = 2)
    val bad = Unigram.tokenize(docs, m)
      .select(
        regexp_replace(TextOps.normalize(col("text")), " ", "").as("want"),
        concat_ws("", col("unigram_pieces")).as("got"))
      .where(col("want") =!= col("got"))
    assert(bad.count() == 0)
    // vocabDf exports the aligned model
    val v = Unigram.vocabDf(spark, m)
    assert(v.count() == m.pieces.size)
    assert(v.where(col("logp") > 0).count() == 0)

    // ids round-trip: id k>0 names pieces(k-1); unk only for unseen chars
    val ids = Unigram.tokenizeIds(docs, m)
      .select(explode(col("token_ids")).as("id"))
    assert(ids.where(col("id") === 0).count() == 0) // corpus chars all covered
    val back = Unigram.tokenizeIds(docs, m)
      .select(col("doc_id"),
        transform(col("token_ids"),
          i => element_at(typedLit(m.pieces), i)).as("p"))
    val direct = Unigram.tokenize(docs, m)
      .select(col("doc_id"), col("unigram_pieces").as("p"))
    assert(back.exceptAll(direct).count() == 0 &&
      direct.exceptAll(back).count() == 0)
  }

  test("byte-level mode: no unk on covered input, pieces decode back through the proxy") {
    val docs = Seq((1L, "héllo héllo wörld"), (2L, "héllo wörld"))
      .toDF("doc_id", "text")
    val m = Unigram.trainBytes(docs, vocabSize = 40, maxPieceLen = 4,
      emIters = 2)
    val ids = Unigram.tokenizeIdsBytes(docs, m)
      .select(explode(col("token_ids")).as("id"))
    assert(ids.count() > 0 && ids.where(col("id") === 0).count() == 0)
    // multi-byte words survive the proxy round trip piece-by-piece
    val bad = Unigram.tokenizeBytes(docs, m)
      .select(
        regexp_replace(TextOps.normalize(col("text")), " ", "").as("want"),
        graft.functions.TextKernels.byteUnproxyCol(
          concat_ws("", col("unigram_pieces"))).as("got"))
      .where(col("want") =!= col("got"))
    assert(bad.count() == 0)
    // characters whose bytes never appeared in training DO take unk
    val unseen = Unigram.tokenizeIdsBytes(
      Seq((9L, "zzz")).toDF("doc_id", "text"), m)
      .select(explode(col("token_ids")).as("id"))
    assert(unseen.where(col("id") === 0).count() > 0)
  }
}
