package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Two passes:
  *  - `cold_queries`: scan-heavy queries timed BEFORE any caching —
  *    these exercise parquet scans, pushdown, and pruning, the things
  *    the 100 TB design actually pays for (a warm-cache-only bench
  *    hides scan regressions).
  *  - `queries` (and `total`): the full suite over cached hot
  *    relations — the serving-tier analogue of the reference reading
  *    from warm Cassandra/ES, and the round-over-round comparable.
  *
  * A query that throws is reported as -1 in its map and listed in
  * `errors` (never a normal-looking elapsed time), so regressions
  * can't hide behind a swallowed exception.
  */
object Bench {

  /** Scan-dominated queries worth timing uncached. */
  private val ColdQueries = Seq(
    "q1_agg", "q6_filter", "q3_join", "q_factjoin",
    "trace_search", "dedup_exact", "text_quality", "ann_topk_brute")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val errors = scala.collection.mutable.LinkedHashMap[String, String]()
    def timed(name: String, tag: String): (String, Double) = {
      val t0 = System.nanoTime()
      try {
        SparkEntry.queries(name)(spark, sfDir).count()
        name -> (System.nanoTime() - t0) / 1e9
      } catch {
        case e: Throwable =>
          errors(s"$tag:$name") = Option(e.getMessage).getOrElse(e.getClass.getName)
            .linesIterator.take(1).mkString.take(200)
          name -> -1.0
      }
    }

    // JIT/codegen/classloader warmup on one tiny query so the first
    // cold measurement isn't charged JVM startup
    try SparkEntry.queries("q_topk")(spark, sfDir).count()
    catch { case _: Throwable => }

    // pass 1: cold scans — nothing cached yet
    val cold = ColdQueries.map(timed(_, "cold"))

    // pass 2 warmup: pin the hot relations (CacheManager substitutes by
    // logical plan, so every query over the same scans hits the cache)
    // and pre-build the partitioned layout so its query times the
    // pruned read, not the setup write
    try {
      Seq(Tables.lineitem(spark, sfDir), Tables.orders(spark, sfDir),
        Tables.customer(spark, sfDir), Tables.part(spark, sfDir),
        Tables.documents(spark, sfDir), Tables.embeddings(spark, sfDir),
        graft.operators.SpanOps.spansFromEvents(Tables.events(spark, sfDir)))
        .foreach(df => df.cache().count())
      SparkEntry.queries("trace_partitioned_scan")(spark, sfDir).count()
    } catch { case _: Throwable => }

    val results = SparkEntry.queries.keys.toSeq.sorted.map(timed(_, "warm"))

    def jmap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    def jq(s: String): String =
      "\"" + s.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case c if c < ' ' => " "
        case c => c.toString
      } + "\""
    val errJson = errors.map { case (k, v) => s"${jq(k)}: ${jq(v)}" }.mkString("{", ",", "}")
    val total = results.collect { case (_, v) if v >= 0 => v }.sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":${jmap(results)},"cold_queries":${jmap(cold)},"errors":$errJson,"sf":"$sfDir"}""")
    spark.stop()
  }
}
