package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** A/B harness for the profile-family operators whose ORACLE mode is
  * exact percentile: measures exact vs approx (the 100 TB default) for
  * psiReport and clipOutliers, plus the DSIR featurize/score pass, on
  * SPARK_GRAFT_SF_DIR. Mirrors the other Tune mains: min-of-3 draws,
  * one line per reading. */
object DriftTune {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val t = Tables.load(spark, sf)
    val li = t("lineitem")
    val docs = t("documents")
    val cols = Seq("l_quantity", "l_extendedprice", "l_discount")
    val ref = li.where(pmod(col("l_orderkey"), lit(2)) === 0)
    val cur = li.where(pmod(col("l_orderkey"), lit(2)) === 1)

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def minOf3(name: String)(body: => Unit): Unit = {
      val ds = (1 to 3).map(_ => time(body))
      println(f"$name%-28s min ${ds.min}%.3f s  draws ${ds.map(d => f"$d%.3f").mkString(" ")}")
    }

    // warm-up
    li.count(); docs.count()
    minOf3("psi exact") {
      operators.Profile.psiReport(ref, cur, cols, exact = true)
        .agg(sum("psi_term")).head()
    }
    minOf3("psi approx") {
      operators.Profile.psiReport(ref, cur, cols)
        .agg(sum("psi_term")).head()
    }
    minOf3("clip exact") {
      operators.Profile.clipOutliers(li, cols, exact = true)
        .agg(sum(cols.head)).head()
    }
    minOf3("clip approx") {
      operators.Profile.clipOutliers(li, cols)
        .agg(sum(cols.head)).head()
    }
    minOf3("dsir weights (B=4096)") {
      operators.Sampling.importanceWeights(
          docs, docs.where(col("lang") === "en"))
        .agg(sum("dsir_score")).head()
    }
    spark.stop()
  }
}
