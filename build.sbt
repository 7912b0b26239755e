ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "rucdcspark"
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
// Default `sbt test` excludes graft.Soak-tagged bodies (multi-minute
// soak/scale/crash-replay runs) so the suite completes inside an automated
// verification window; `GRAFT_SOAK=1 sbt test` runs the full set. JUnit XML
// reports land in target/test-reports so per-suite durations are auditable.
Test / testOptions ++= {
  val soak = sys.env.get("GRAFT_SOAK").contains("1")
  val excl = if (soak) Seq.empty
    else Seq(Tests.Argument(TestFrameworks.ScalaTest, "-l", "graft.Soak"))
  excl :+ Tests.Argument(TestFrameworks.ScalaTest, "-u", "target/test-reports")
}
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
  // Tests render java.sql.Timestamp/Date via toString (JVM default TZ);
  // pin it so assertions don't depend on the host zone.
  "-Duser.timezone=UTC",
  // 16g default: the sf0.1 dedup/self-join queries GC-thrash in 8g when the
  // driver runs Bench without SPARK_DRIVER_MEM set (the box has 125 GiB).
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "16g")}",
  // Whole-stage codegen across a 50+-query corpus overflows the default
  // 240m JIT code cache → random interpreted-mode slowdowns mid-bench.
  "-XX:ReservedCodeCacheSize=1g",
)
