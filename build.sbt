ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "flytemosaicspark"
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
// The bench/verify contract is "ONE parseable JSON line on stdout". Under
// the default LoggedOutput strategy sbt prefixes every forked-run line
// with "[info] " and appends its own "[success] Total time..." trailer —
// both of which break a last-line JSON parse. Pipe the child's stdout
// through untouched and drop the trailer.
run / outputStrategy := Some(StdoutOutput)
showSuccess := false
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
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "32g")}",
  // Whole-stage codegen emits fresh classes for every distinct plan; a
  // multi-hundred-query run overflows the JVM default 240 MB code cache,
  // and the resulting sweeper/deopt/recompile storms burn multiple cores
  // and inflate individual queries 3-10x (observed: 261 CPU-s for a pass
  // whose steady state is 31 CPU-s, with C2/Sweeper threads hot). The
  // reservation is virtual memory — committed only as used.
  "-XX:ReservedCodeCacheSize=1g",
  // G1 humongous-allocation fragmentation is the other measurement
  // artifact of a multi-hundred-query JVM: dedup/shingle queries allocate
  // many arrays above half a region, and on an aged heap the resulting
  // region fragmentation turns into concurrent-GC churn that inflates
  // whichever heavy query runs mid-bench 2-3x (q109 18.8 s in a full pass
  // vs 5.9 s isolated — same tree, same data). Measured A/B on the full
  // 255-query bench, same host, quiet: 8g/G1 290.2 s, 32g/G1 269.5 s,
  // 8g/G1+32m-regions 261.4 s, 32g/G1+32m 251.3 s, 32g/ParallelGC 265.1 s
  // (ParallelGC full-GC stalls: q115 18.4 s). Heap is env-overridable for
  // smaller hosts; both flags change no semantics and no query plan.
  "-XX:G1HeapRegionSize=32m",
)
