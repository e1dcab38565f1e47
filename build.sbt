ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "leftjoinontimeoutspark"
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
// Driver bench-parse contract (three rounds of BENCH parsed:null): the
// forked run's stdout must reach the caller UNPREFIXED — sbt's default
// LoggedOutput wraps every line as "[info] {...}", which the driver's
// JSON parser does not strip. StdoutOutput passes the child's stdout
// through verbatim (stderr likewise stays stderr).
outputStrategy := Some(StdoutOutput)
// ... and sbt's own trailing "[success] Total time ..." line must not
// land AFTER the bench's final JSON line on stdout (Global scope — the
// project-scoped setting is ignored by the command engine).
Global / showSuccess := false
// showSuccess is consumed by the command engine, not a task — exclude it
// from the unused-key lint so the warning doesn't precede every build.
Global / excludeLintKeys += showSuccess
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
  // Throughput collector: G1 on a near-empty ~100 GB heap showed
  // multi-second collection storms (59 s summed GC in one stage at
  // sf0.1) and 10-30x CPU swings between identical query repetitions;
  // Parallel GC's simple young-gen sizing is stable for this
  // batch-bench workload.
  "-XX:+UseParallelGC",
  // 27 queries x whole-stage-codegen generate hundreds of classes; the
  // default 240 MB code cache fills mid-run, silently disabling the JIT
  // for whatever had not compiled yet (measured as 10-30x per-query
  // slowdowns appearing at random positions in the bench order).
  "-XX:ReservedCodeCacheSize=1g",
) ++ {
  // JVM scratch on tmpfs when available: the VM's virtio disk shows
  // sporadic multi-second D-state stalls (loadavg ~10 at 97% idle) that
  // surface as random query slowdowns whenever anything touches /tmp.
  val shm = new java.io.File("/dev/shm/graft-tmp")
  if (shm.isDirectory || shm.mkdirs()) Seq(s"-Djava.io.tmpdir=${shm.getAbsolutePath}")
  else Seq.empty
}
