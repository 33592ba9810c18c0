package graft
import org.apache.spark.sql.SparkSession
import scala.util.control.NonFatal

/** Dev-only measurement harness (optimization rounds, guide §1):
  * for each named query, separately times
  *   - df construction (query-function call: plan assembly, any eager
  *     driver work the surface does before returning its DataFrame),
  *   - analysis+optimization+physical planning (executedPlan force),
  *   - N executions against the noop sink (full computation, no bytes
  *     written — §1.4),
  * and can dump the formatted plan to a file for the plans/r13
  * deliverables. NOT part of the driver contract; Bench stays the
  * adjudicated surface.
  *
  * Usage: tools/graft-run.sh graft.Probe <sfDir> <q1,q2,...> [planDir]
  * Env: SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_TRIALS (default 3),
  *      SPARK_GRAFT_PROBE_WARM=0 to skip the warm-cache pass.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(',').toSeq
    val planDir = if (args.length > 2) Some(args(2)) else None
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt.max(1)
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.codegen.cache.maxEntries",
        sys.env.getOrElse("SPARK_GRAFT_CODEGEN_CACHE", "10000"))
      .config("spark.ui.enabled", "false")
    // dev-only A/B hook: SPARK_GRAFT_CONF="k1=v1;k2=v2" sets arbitrary
    // confs on the probe session (config experiments stay out of Bench
    // until measured here)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(';').filter(_.contains("="))
      .foreach { kv => val Array(k, v) = kv.split("=", 2); builder.config(k, v) })
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // mirror Bench's warm pass so probe numbers are comparable to pack
    // numbers: cache the hot relations (size-gated) + JIT warmup
    try SparkEntry.queries("q_topk")(spark, sfDir).count()
    catch { case NonFatal(_) => }
    if (!sys.env.get("SPARK_GRAFT_PROBE_WARM").contains("0")) {
      val cap = sys.env.getOrElse("SPARK_GRAFT_CACHE_ROW_CAP", "20000000").toLong
      try {
        Seq(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
          Tables.customer(spark, sfDir), Tables.part(spark, sfDir),
          Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir),
          graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir)))
          .foreach(df => if (df.count() <= cap) df.cache().count())
        SparkEntry.queries("trace_partitioned_scan")(spark, sfDir).count()
        graft.operators.IndexStore.ensure(spark, sfDir)
        graft.operators.IndexStore.ensureIvfPq(spark, sfDir)
      } catch { case NonFatal(_) => }
    }

    def t[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f
      ((System.nanoTime() - t0) / 1e9, a)
    }

    // q1 control so numbers are weather-normalizable
    def ctl(): Double = {
      val ts = (1 to 3).map { _ =>
        t(SparkEntry.queries("q1_agg")(spark, sfDir)
          .write.mode("overwrite").format("noop").save())._1
      }
      ts.min
    }
    println(f"[probe] q1_ctl_start ${ctl()}%.3f s")

    names.foreach { name =>
      System.gc()
      try {
        spark.sparkContext.setJobDescription(s"probe: $name")
        val (tBuild, df) = t(SparkEntry.queries(name)(spark, sfDir))
        val (tPlan, _) = t(df.queryExecution.executedPlan)
        val execs = (1 to trials).map { _ =>
          // rebuild per trial: surfaces with eager internals (checkpoints,
          // index builds) must pay them per run exactly as Bench does
          val (tAll, _) = t {
            SparkEntry.queries(name)(spark, sfDir)
              .write.mode("overwrite").format("noop").save()
          }
          tAll
        }
        planDir.foreach { pd =>
          new java.io.File(pd).mkdirs()
          val txt = df.queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          java.nio.file.Files.writeString(
            java.nio.file.Paths.get(s"$pd/$name.txt"), txt)
          // SPARK_GRAFT_PROBE_FINAL=1: ALSO capture the post-execution
          // adaptive plan (final query stages, ReusedQueryStage nodes) —
          // the only view that shows whether AQE actually deduplicated
          // semantically-equal exchanges at runtime
          if (sys.env.get("SPARK_GRAFT_PROBE_FINAL").contains("1")) {
            val df2 = SparkEntry.queries(name)(spark, sfDir)
            val plan = df2.queryExecution.executedPlan
            plan.execute().foreach(_ => ())
            java.nio.file.Files.writeString(
              java.nio.file.Paths.get(s"$pd/${name}_final.txt"), plan.toString)
          }
        }
        println(f"[probe] $name build=$tBuild%.3f plan=$tPlan%.3f " +
          s"exec=${execs.map(e => f"$e%.3f").mkString(",")} min=${f"${execs.min}%.3f"}")
      } catch {
        case NonFatal(e) =>
          println(s"[probe] $name FAILED: ${Option(e.getMessage).getOrElse(e.getClass.getName).linesIterator.take(1).mkString}")
      }
    }
    println(f"[probe] q1_ctl_end ${ctl()}%.3f s")
    spark.stop()
  }
}
