ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "haystacktracesspark"
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
// Forked run output must reach stdout raw: the bench driver greps the
// process tail for a line starting with {"metric" — sbt's default
// LoggedOutput would prefix it with "[info] " and break the match.
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
  // JIT code cache sized to a query-LIBRARY workload (r14): the JVM
  // default 240m was measured 9.8 MB from full halfway through the
  // 322-surface pack (jcmd Compiler.codecache: non-profiled nmethods
  // 109/116 MB at query 150), after which code-cache sweeps evict the
  // very nmethods the later queries just JIT'd — the late-alphabet
  // surfaces ran 1.5-2x their isolated times in-pack. Reserved (not
  // committed) memory, so the only cost is virtual address space.
  // Same class of fix as the r13 spark.sql.codegen.cache.maxEntries
  // raise: any long-lived driver serving hundreds of distinct plans
  // wants its compiled code resident.
  s"-XX:ReservedCodeCacheSize=${sys.env.getOrElse("SPARK_CODE_CACHE", "512m")}",
)
