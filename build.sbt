ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flinkrealtimesessionizesamplespark"
// Spark jars ship with the image at /opt/spark/jars (zero-egress):
unmanagedBase := file("/opt/spark/jars")
// Test-only deps resolve from the pre-warmed coursier cache; anything
// else is intentionally not resolvable (COURSIER_MODE=offline).
libraryDependencies ++= Seq(
  "org.scalatest" %% "scalatest" % "3.2.19" % Test,
  "org.scalacheck" %% "scalacheck" % "1.18.0" % Test,
  // Attempted (2026-08-12, re-verified 2026-08-13, 2026-08-15 twice,
  // 2026-08-16 rounds 14 AND 15 — latest: round-15 scratch-project
  // `sbt update` against the offline mirror still returns "Not found"
  // for both the POM and every local cache path): the Kafka connector,
  // to execute the Streams.kafkaLines/kafkaJsonSink paths. Resolution
  // fails in this container — offline coursier mirror has no
  // org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 ("Not found"), no
  // jar under /opt/spark/jars, and a filesystem-wide search finds no
  // spark-sql-kafka or kafka-clients artifact in any cache (~/.cache/
  // coursier, ~/.ivy2, ~/.m2) — so the Kafka paths remain
  // config-complete but unexecutable here (KafkaUnavailableSpec pins the
  // exact in-container failure mode).
  // "org.apache.spark" %% "spark-sql-kafka-0-10" % "4.1.2",
)
Test / fork := true
run / fork := true
// Forked run output goes RAW to this process's stdout/stderr instead of
// through sbt's logger: the driver tail-parses graft.Bench's final JSON
// line, and sbt's "[info] " decoration would make every line unparseable
// (no BENCH_r* round has ever carried a parsed payload because of this).
run / outputStrategy := Some(OutputStrategy.StdoutOutput)
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
