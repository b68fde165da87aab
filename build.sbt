ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "pdf_extractspark"
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
val driverMemGb: Int =
  scala.util.Try(sys.env.getOrElse("SPARK_DRIVER_MEM", "8g").toLowerCase.stripSuffix("g").toInt).getOrElse(8)
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${driverMemGb}g",
  // throughput GC: measured 0.81 scaling efficiency 8→32 threads on the
  // allocation-heavy extraction kernel vs 0.70 with default G1
  "-XX:+UseParallelGC",
  // large young gen for the allocation-heavy kernel (interleaved A/B:
  // +5-13% at 16 threads); scaled to the heap so smaller SPARK_DRIVER_MEM
  // settings still start
  s"-Xmn${math.max(1, driverMemGb * 5 / 8)}g",
)
