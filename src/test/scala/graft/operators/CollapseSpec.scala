package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkTestBase

/** Repeated n-gram run collapse semantics. */
class CollapseSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def run(text: String, maxN: Int, keep: Int): String =
    Seq(text).toDF("t")
      .select(TextOps.collapseRepeats(col("t"), maxN, keep).as("c"))
      .head().getString(0)

  test("single-word runs collapse to keep copies, non-runs untouched") {
    assert(run("x spam spam spam spam y", 1, 2) == "x spam spam y")
    assert(run("x x x", 1, 1) == "x")
    assert(run("had had enough", 1, 2) == "had had enough")
    assert(run("a b c", 3, 1) == "a b c")
    assert(run("", 3, 2) == "")
  }

  test("phrase runs collapse greedily, smallest n first") {
    assert(run("click here click here click here now", 2, 1) ==
      "click here now")
    // the word-level pass runs first: "a a a a" is a word run, never an
    // "a a" phrase run
    assert(run("a a a a b", 2, 2) == "a a b")
    // interleaved: word run inside a phrase context
    assert(run("go go go stop go go go stop done", 4, 1) ==
      "go stop done")
    // trigram run
    assert(run("one two three one two three one two three end", 3, 1) ==
      "one two three end")
  }

  test("normalization applies (case, whitespace) and nulls propagate") {
    assert(run("Buy NOW  buy now\tBUY now", 2, 1) == "buy now")
    val r = Seq((1, null: String)).toDF("id", "t")
      .select(TextOps.collapseRepeats(col("t")).as("c")).head()
    assert(r.isNullAt(0))
  }

  test("collapse is idempotent at n=1 and bounded-output") {
    val once = run("w w w w w w w w", 1, 3)
    assert(once == "w w w")
    assert(run(once, 1, 3) == once)
    intercept[IllegalArgumentException](run("x", 0, 1))
    intercept[IllegalArgumentException](run("x", 1, 0))
  }
}
