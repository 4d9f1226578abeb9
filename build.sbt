ThisBuild / scalaVersion := "2.13.17"
ThisBuild / version := "0.1.0"
name := "hiveplanservicespark"
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
// Without this, sbt re-logs the forked process's stdout with an
// "[info] " prefix — which breaks any consumer that expects a
// machine-readable line (the bench driver json-parses Bench's one
// metric line and has to find it starting at column 0).
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
  // local[32] runs 32 concurrent tasks inside THIS heap. At 8g the
  // unified memory pool is ~4.6 GB for 32 shingle-explode/hash-agg
  // tasks plus localCheckpoint blocks — measured GC thrash made the
  // same sf0.1 query swing 12.7 s ↔ 160 s run-to-run. The box has
  // 125 GB; size the heap like the executor fleet it stands in for.
  // Xms = Xmx + AlwaysPreTouch: this is a microVM whose memory is
  // faulted in on first touch — thread dumps during "slow" runs showed
  // 2-3 tasks burning 40-70 s of apparent CPU inside plain allocation/
  // copy paths (serializer, BytesToBytesMap page acquire) while 30
  // threads idled, i.e. page-fault service time billed to the task.
  // Pre-faulting the whole heap at JVM start moves that cost out of
  // every first-run measurement.
  // Default is ADAPTIVE, not a baked-in 32g: on a box with less free
  // memory than the heap, -Xms + AlwaysPreTouch would fail the JVM at
  // start (or thrash swap pre-faulting it). Pick min(32g, ~half of
  // MemAvailable), floored at 4g; SPARK_DRIVER_MEM still overrides.
  s"-Xms$graftHeap", s"-Xmx$graftHeap",
) ++ (if (graftPreTouch) Seq("-XX:+AlwaysPreTouch") else Nil)

// Heap sizing helper for the javaOptions above. AlwaysPreTouch only
// pays off when the full target heap actually fits (the microVM
// first-touch-fault fix, see the comment block above) — skip it when
// the adaptive default had to shrink below 32g.
lazy val graftHeap: String = sys.env.getOrElse("SPARK_DRIVER_MEM", {
  val availGb: Long =
    try {
      val src = scala.io.Source.fromFile("/proc/meminfo")
      try src.getLines().find(_.startsWith("MemAvailable:"))
        .map(_.split("\\s+")(1).toLong / (1024 * 1024)).getOrElse(8L)
      finally src.close()
    } catch { case _: Throwable => 8L }
  s"${math.max(4L, math.min(32L, availGb / 2))}g"
})
lazy val graftPreTouch: Boolean =
  sys.env.contains("SPARK_DRIVER_MEM") || graftHeap == "32g"
