ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "maggyspark"
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
// Pass the forked run's stdout through verbatim (no "[info] " logger
// prefix) so the Bench JSON line parses as a bare line of stdout.
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
  // lets dev.ludovic.netlib load its Vector-API BLAS (MLlib KMeans/BLAS
  // paths run a JIT'd fallback without it — measured minutes-vs-tens-of-
  // minutes on a k=1000 coarse-quantizer fit); harmless elsewhere
  "--add-modules", "jdk.incubator.vector",
  "-Dspark.ui.enabled=false",
  "-Dspark.sql.session.timeZone=UTC",
  s"-Xmx${sys.env.getOrElse("SPARK_DRIVER_MEM", "8g")}",
)
// local-cluster masters (ClusterSpec; SPARK_GRAFT_MASTER on Verify/Bench)
// launch executor JVMs through SPARK_HOME's launcher, which needs the Scala
// version pinned when SPARK_HOME is a release layout without build dirs.
Test / envVars ++= Map("SPARK_SCALA_VERSION" -> "2.13", "SPARK_HOME" -> "/opt/spark")
run / envVars ++= Map("SPARK_SCALA_VERSION" -> "2.13", "SPARK_HOME" -> "/opt/spark")
// ClusterSpec boots a multi-JVM local-cluster SparkContext and must not
// share a JVM with the local[4] suites (getOrCreate would hand it theirs):
// split the forked test run into two sequential JVM groups.
Test / testGrouping := {
  val opts = (Test / forkOptions).value
  val (cluster, rest) = (Test / definedTests).value
    .partition(_.name.endsWith("ClusterSpec"))
  Seq(
    Tests.Group("rest", rest, Tests.SubProcess(opts)),
    Tests.Group("cluster", cluster, Tests.SubProcess(opts)),
  ).filter(_.tests.nonEmpty)
}
