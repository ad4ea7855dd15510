package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev main: quiet-box 2M/20M scale ratio for the CEP smoke shape —
  * BENCH_r10 (a timeout-killed, contended run) read cep@20M at 21.1 s
  * (13× the 2M label, 2.7× the r9 artifact's 7.7 s) on code untouched
  * since r9; this harness replays the exact Bench smoke (same pattern,
  * same replicated events stream) so the ratio can be adjudicated
  * without the surrounding 30-minute run. */
object CepTune {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val events = Tables.load(spark, sfDir)("events")
    def rep(k: Int) = events
      .crossJoin(spark.range(k).select(col("id").as("__rep"))).drop("__rep")
      .cache()
    val sql =
      "SELECT * FROM stream MATCH_RECOGNIZE ( PARTITION BY user_id " +
        "ORDER BY ts MEASURES COUNT(*) AS n ONE ROW PER MATCH " +
        "PATTERN (A{3}) WITHIN '12h' DEFINE A AS value > 50 )"
    val small = rep(20); small.count()
    val big = rep(200); big.count()
    def run(df: org.apache.spark.sql.DataFrame): Double = {
      val t0 = System.nanoTime()
      GraftEngine.sql(sql, Map("stream" -> df))
        .write.format("noop").mode("overwrite").save()
      val s = (System.nanoTime() - t0) / 1e9
      System.gc(); Thread.sleep(1000)
      s
    }
    run(small) // warm-up
    for (pass <- 1 to 3; (label, df) <- Seq("2m" -> small, "20m" -> big))
      println(f"cep $label%4s pass $pass: ${run(df)}%.1f s")
    spark.stop()
  }
}
