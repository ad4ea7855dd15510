package graft

import org.apache.spark.sql.SparkSession

/** Dev CLI: run a dialect query against the test tables.
  *
  *   sbt "runMain graft.Shell <sfDir> <sql> [--explain]"
  *
  * The FROM clause may name any table in TESTDATA.md (`stream` = events).
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sql = args.lift(1).getOrElse("SELECT * FROM stream LIMIT 5")
    val explain = args.contains("--explain")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = GraftEngine.sql(sql, Tables.load(spark, sfDir))
    if (explain) df.explain("formatted")
    df.show(50, truncate = false)
    spark.stop()
  }
}
