ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "streamsqlspark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
)
Test / fork := true
run / fork := true
// Pass the forked process's stdout through verbatim (no "[info] " prefix):
// the bench/verify drivers parse Bench's single JSON stdout line.
outputStrategy := Some(OutputStrategy.StdoutOutput)
// Spark 4.x on JDK 17 needs these when SparkSession is created outside
// spark-submit (which normally injects them). Matches
// org.apache.spark.launcher.JavaModuleOptions.defaultModuleOptions().
val jdk17AddOpens = Seq(
  "java.base/java.lang", "java.base/java.lang.invoke",
  "java.base/java.lang.reflect", "java.base/java.io",
  "java.base/java.net", "java.base/java.nio",
  "java.base/java.util", "java.base/java.util.concurrent",
  "java.base/java.util.concurrent.atomic",
  "java.base/sun.nio.ch", "java.base/sun.nio.cs",
  "java.base/sun.security.action", "java.base/sun.util.calendar",
).flatMap(p => Seq("--add-opens", s"$p=ALL-UNNAMED"))
scalacOptions ++= Seq("-deprecation")
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // the 20M-row pipeline scale smoke (Bench) caches ~15 GB of synthetic
  // corpus + shingle intermediates in one local JVM; 8g OOM-kills the
  // whole bench run (Spark exits 52). The box has 128 GiB — a high max
  // is safe (heap grows on demand) and still env-overridable.
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
  // pre-size the heap: growing from the tiny default to tens of GB
  // mid-pass costs repeated full GCs exactly once — on the FIRST heavy
  // execution — which made first-position 20M smoke numbers read 1.5-3x
  // their steady state (r11 DupSpansTune A/B: first 20M remove_spans
  // pass 546.5 s at default -Xms vs 343.5 s pre-sized; the pass after,
  // 416.8 s vs 153.4 s). Benchmarks must measure the operator, not the
  // heap ramp.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "48g")}",
) ++ (
  // OPT-IN heap pre-touch (SPARK_GRAFT_PRETOUCH=1): moves lazy heap
  // fault-in out of the first measured stages and into JVM startup.
  // Deliberately NOT the default: r13 measured this host serving
  // first-touch anonymous pages at ~200 MB/s beyond the first ~16 GB
  // (a degraded overcommit backend — incremental bytearray probe;
  // cache-resident CPU loops read normal), and pre-touching 48 GB at
  // that rate costs ~4 minutes of dead startup on EVERY forked run
  // (Shell, Verify, tests) for a benefit only benchmarks care about.
  if (sys.env.get("SPARK_GRAFT_PRETOUCH").contains("1"))
    Seq("-XX:+AlwaysPreTouch")
  else Seq.empty
)
