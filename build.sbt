ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "scragspark"
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
javaOptions ++= jdk17AddOpens ++ Seq(
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  // Pre-committed, pre-touched heap: this sandbox is a Firecracker
  // microVM where JVM heap grow/uncommit cycles cause page-fault storms
  // (~80% system time, 10-30x CPU inflation at 32 threads). Fixed-size
  // pre-touched heap makes throughput stable and ~15x faster.
  s"-Xms${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "24g")}",
  // Young gen sized for 32 allocation-heavy mutator threads: with the
  // default NewRatio the extraction kernel's allocation rate forces a
  // minor-GC cadence that serializes 32 threads often enough to cost
  // ~25-30% at full width (A/B: 103k -> 130-134k docs/s at local[32],
  // flat at local[8]); a half-heap young gen restores the headroom the
  // 8-thread level gets for free.
  s"-Xmn${sys.env.getOrElse("SPARK_DRIVER_XMN", "16g")}",
  "-XX:+AlwaysPreTouch",
  "-XX:+UseParallelGC",
)
