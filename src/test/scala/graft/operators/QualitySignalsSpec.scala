package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Entropy quality signals and URL lexical features. */
class QualitySignalsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def ent(text: String): (Double, Double) = {
    val r = TextOps.entropyMetrics(Seq((1L, text)).toDF("doc_id", "text"))
      .select("char_entropy", "word_entropy").head()
    (r.getDouble(0), r.getDouble(1))
  }

  test("entropyMetrics: closed-form cases") {
    // "abab" → chars a,b equiprobable = 1 bit; words: single word = 0
    assert(ent("abab") == (1.0, 0.0))
    // "aaaa" → 0 bits both levels
    assert(ent("aaaa") == (0.0, 0.0))
    // 4 equiprobable words of one shared char → word entropy 2 bits
    val (_, we) = ent("a aa aaa aaaa")
    assert(math.abs(we - 2.0) < 1e-12)
    // uniform 16 distinct chars → 4 bits/char
    val (ce, _) = ent("abcdefghijklmnop")
    assert(math.abs(ce - 4.0) < 1e-12)
  }

  test("entropyMetrics: gibberish scores above template boilerplate on word entropy") {
    val spamE = ent("buy now buy now buy now buy now")._2
    val proseE = ent("the quick brown fox jumps over a lazy dog today")._2
    assert(proseE > spamE, s"prose $proseE vs template $spamE")
    // normalization: case and whitespace collapse before measuring
    assert(ent("AB  ab\tAb") == ent("ab ab ab"))
    // null text → null metrics
    val r = TextOps.entropyMetrics(
      Seq((1L, null: String)).toDF("doc_id", "text")).head()
    assert(r.isNullAt(2) && r.isNullAt(3))
  }

  test("urlFeatures: parse features and unparseable-URL nulls") {
    val d = Seq(
      ("https://a.b.co.uk/x/y/z?p=1&q=2&utm_x=3#frag", 1L),
      ("http://plain.com", 2L),
      ("not a url", 3L)).toDF("url", "id")
    val f = WebOps.urlFeatures(d).orderBy("id").collect()
    // deep decorated URL
    assert(f(0).getAs[Int]("url_depth") == 3)
    assert(f(0).getAs[Int]("n_params") == 3)
    assert(f(0).getAs[Int]("n_host_labels") == 4)
    assert(f(0).getAs[Boolean]("has_tracking"))
    // bare host: depth 0 (path "/"), no params, no tracking
    assert(f(1).getAs[Int]("url_depth") == 0)
    assert(f(1).getAs[Int]("n_params") == 0)
    assert(!f(1).getAs[Boolean]("has_tracking"))
    // unparseable: host-derived features NULL, lexical ones still real
    assert(f(2).isNullAt(f(2).fieldIndex("url_depth")))
    assert(f(2).isNullAt(f(2).fieldIndex("n_host_labels")))
    assert(f(2).getAs[Int]("url_len") == 9)
    // utm must be a parameter PREFIX at a boundary, not a substring
    val g = WebOps.urlFeatures(
      Seq(("http://x.com/?last_utm_x=1&p=butm_z", 1L)).toDF("url", "id"))
      .head()
    assert(!g.getAs[Boolean]("has_tracking"))
    // trailing/doubled '&' must not inflate the parameter count
    val h = WebOps.urlFeatures(
      Seq(("http://x.com/p?a=1&", 1L), ("http://x.com/p?a=1&&b=2", 2L))
        .toDF("url", "id")).orderBy("id").collect()
    assert(h(0).getAs[Int]("n_params") == 1)
    assert(h(1).getAs[Int]("n_params") == 2)
  }
}
