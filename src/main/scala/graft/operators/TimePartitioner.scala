package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Time-partitioned span layout (SURVEY.md §2 A22) — the Spark
  * analogue of the reference's hourly ES index buckets + TTL
  * (reader/.../SpansIndexConfiguration.indexHourBucket/indexHourTtl and
  * ESUtils.getESIndexes index-name fan-out).
  *
  * Spans land under dt=YYYY-MM-DD/hr=HH directories; every time-ranged
  * query filters on the partition columns so the scan prunes whole
  * directories before reading a byte — at 100 TB with hourly partitions
  * a one-day search touches 24/8760ths of the data. Retention (the
  * reference's TTL) is `drop partition`, not a delete-scan.
  */
object TimePartitioner {

  /** Write a span relation partitioned by start time: (dt, hr) when
    * `hourly` (the 100 TB layout — keeps each directory's data volume
    * bounded), dt-only otherwise (right-sized for small corpora, where
    * hourly dirs would be a small-files pathology). */
  def writePartitioned(spans: DataFrame, outDir: String, hourly: Boolean = true): Unit = {
    val withCols = spans
      .withColumn("start_ts", timestamp_micros(col("start_us")))
      .withColumn("dt", date_format(col("start_ts"), "yyyy-MM-dd"))
      .withColumn("hr", date_format(col("start_ts"), "HH"))
      .drop("start_ts")
    val (df, cols) =
      if (hourly) (withCols, Seq("dt", "hr")) else (withCols.drop("hr"), Seq("dt"))
    df.write.mode(SaveMode.Overwrite)
      .partitionBy(cols: _*)
      .parquet(outDir)
  }

  /** Retention (the reference's index TTL): drop whole dt=… partition
    * directories strictly older than the cutoff. A metadata/filesystem
    * operation — no scan, no rewrite, no tombstones — which is the
    * entire point of time-partitioned layouts at 100 TB (the reference
    * achieves the same by letting whole hourly ES indexes age out).
    * Uses the Hadoop FileSystem API, so URI-form and remote paths
    * (file:/, hdfs://, s3a://) work like local ones, and a partition
    * is only reported dropped if the recursive delete actually
    * succeeded. Returns the dropped partition names. */
  def expire(spark: SparkSession, dir: String, cutoffUs: Long): Seq[String] = {
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    val cutoffDt =
      java.time.Instant.ofEpochSecond(0, cutoffUs * 1000).atZone(zone).toLocalDate.toString
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("dt="))
      .filter(_.getPath.getName.stripPrefix("dt=") < cutoffDt)
      .filter(st => fs.delete(st.getPath, true))
      .map(_.getPath.getName)
      .sorted
  }

  /** Small-file compaction for one or all dt=… partitions — the other
    * half of the layout's lifecycle (write → prune → expire →
    * COMPACT). Streaming ingest and incremental backfills leave many
    * small files per partition; each costs a task + footer read +
    * catalog entry, and at 100 TB the metadata tax outruns the data.
    * Rewrites each selected partition's files into
    * `ceil(bytes / targetBytes)` files via a per-partition coalesce,
    * atomically-ish: writes to a `_compact_tmp` sibling, then swaps
    * directories (Hadoop FileSystem rename — same API as [[expire]],
    * so object-store URIs behave). Returns (partition, filesBefore,
    * filesAfter) for each rewritten partition; partitions already at
    * or under one target file per `targetBytes` are left untouched. */
  def compact(
      spark: SparkSession, dir: String, targetBytes: Long): Seq[(String, Int, Int)] = {
    require(targetBytes > 0, s"targetBytes must be positive, got $targetBytes")
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return Seq.empty
    // A crashed prior run may have stranded tmp dirs (underscore prefix
    // hides them from readers). The crash window between delete(target)
    // and rename(tmp, target) leaves the tmp dir holding the ONLY copy
    // of that partition — so recovery must FINISH an interrupted swap
    // (target missing → rename tmp into place), and may only discard a
    // tmp whose target still exists (crash before the swap started, so
    // the tmp is an unreferenced spare copy). Tmp dirs live NEXT TO
    // their target (same parent, name = "_compact_tmp_" + =-encoded target name)
    // precisely so the target is recoverable from the tmp path alone.
    // Spark's hidden-path filter keeps underscore names that CONTAIN
    // "=" (shouldFilterOut is `startsWith("_") && !contains("=")`), so
    // a working name like "_compact_tmp_dt=X" is NOT reader-hidden —
    // partition discovery would infer a bogus "_compact_tmp_dt" column
    // for any reader that lists mid-compact. Working names therefore
    // escape reversibly: '~'→"~t" then '='→"~e"
    // ("_compact_tmp_dt~e2024-01-01") — injective on ANY name, where a
    // blanket '='↔'~' swap destroys the distinction for names that
    // already contain '~'. decode() inverts a fully valid new-style
    // name (every '~' followed by t/e); anything else falls back to
    // the legacy blanket form (legacy-encoded partition names put a
    // digit after '~', never t/e, so the grammars don't collide).
    def encode(name: String): String =
      name.replace("~", "~t").replace("=", "~e")
    def decode(name: String): String =
      if (name.contains("~") && !name.matches(".*~(?![te]).*"))
        name.replace("~e", "=").replace("~t", "~")
      else name.replace("~", "=")
    // Only names the CURRENT writer produces may be auto-renamed into
    // place: "dt=yyyy-MM-dd" at the root, "hr=HH" inside a dt dir. A
    // stranded tmp whose decoded name doesn't parse (e.g. a
    // legacy-format "_compact_tmp_dt=X_hr=05" parked at the root) must
    // NOT become a bogus partition dir that corrupts the layout for
    // every reader — and must not be deleted either, since it may hold
    // the only copy. It is quarantined under a reader-hidden orphan
    // name for manual recovery.
    def validTarget(parent: org.apache.hadoop.fs.Path, name: String): Boolean =
      if (parent == root) name.matches("dt=\\d{4}-\\d{2}-\\d{2}")
      else name.matches("hr=\\d{2}")
    def sweepTmp(parent: org.apache.hadoop.fs.Path): Unit =
      fs.listStatus(parent).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("_compact_tmp_"))
        .foreach { st =>
          val rawSuffix = st.getPath.getName.stripPrefix("_compact_tmp_")
          val name = decode(rawSuffix)
          val target = new org.apache.hadoop.fs.Path(parent, name)
          if (fs.exists(target)) fs.delete(st.getPath, true)
          else if (!validTarget(parent, name)) {
            // quarantine under the encoded RAW suffix — encode is
            // injective, so the original tmp name (not a lossy
            // decode of it) is recoverable for manual repair
            val orphan = new org.apache.hadoop.fs.Path(
              parent, s"_compact_orphan_${encode(rawSuffix)}")
            // loud on ANY failure to move it aside — silently leaving
            // an "="-named tmp in place poisons partition discovery
            // for every reader (it is NOT hidden, see encode above)
            if (fs.exists(orphan))
              throw new java.io.IOException(
                s"compact: quarantine destination $orphan already exists; " +
                  s"resolve it manually so ${st.getPath} can be moved aside")
            if (!fs.rename(st.getPath, orphan))
              throw new java.io.IOException(
                s"compact: failed to quarantine unrecognized tmp ${st.getPath}")
          } else if (!fs.rename(st.getPath, target))
            throw new java.io.IOException(
              s"compact: failed to recover interrupted swap ${st.getPath} -> $target")
        }
    sweepTmp(root)
    val dtDirs = fs.listStatus(root).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("dt="))
    dtDirs.foreach(d => sweepTmp(d.getPath))
    // leaf partitions hold the files: dt=… directly for the dt-only
    // layout, dt=…/hr=… for the hourly one — compact whichever level
    // the files actually live at
    val leaves = dtDirs.flatMap { d =>
      val hrs = fs.listStatus(d.getPath).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.startsWith("hr="))
      if (hrs.nonEmpty) hrs else Seq(d)
    }
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    // independent per-partition rewrites run as concurrent Spark jobs —
    // a serial loop leaves the cluster idle between hundreds of small
    // jobs at the stated 100 TB posture
    val rewrites = leaves.map { part => Future {
      val files = fs.listStatus(part.getPath).toSeq
        .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
      val bytes = files.map(_.getLen).sum
      val want = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
      if (files.size <= want) None
      else {
        val rel = fs.makeQualified(part.getPath).toString
          .stripPrefix(fs.makeQualified(root).toString).stripPrefix("/")
        // sibling of the target, target name recoverable by stripping + decoding
        // the prefix — the startup sweep depends on this invariant
        val tmp = new org.apache.hadoop.fs.Path(part.getPath.getParent,
          s"_compact_tmp_${encode(part.getPath.getName)}")
        spark.read.parquet(part.getPath.toString)
          .coalesce(want)
          .write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        val rewritten = fs.listStatus(tmp).count(f =>
          f.isFile && f.getPath.getName.endsWith(".parquet"))
        // the swap must be loud on failure: a false return here means
        // duplicate data (old dir survived) or a hidden partition (data
        // stranded under the underscore tmp name) — never report either
        // as success (expire() checks delete's return the same way)
        if (!fs.delete(part.getPath, true))
          throw new java.io.IOException(s"compact: failed to remove ${part.getPath}")
        if (!fs.rename(tmp, part.getPath))
          throw new java.io.IOException(s"compact: failed to swap $tmp into ${part.getPath}")
        Some((rel, files.size, rewritten))
      }
    } }
    Await.result(Future.sequence(rewrites), Duration.Inf).flatten.sortBy(_._1)
  }

  /** Read back with partition pruning for a time window: the dt/hr
    * predicates bind to partition directories (PartitionFilters in the
    * scan), the start_us predicate refines within surviving files. */
  def readRange(spark: SparkSession, dir: String, fromUs: Long, toUs: Long): DataFrame = {
    // dt partition values were produced by date_format, which renders in
    // the SESSION time zone — derive the directory bounds in the same
    // zone or boundary rows silently fall outside the pruned range
    val zone = java.time.ZoneId.of(
      spark.conf.get("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID))
    def dt(us: Long): String =
      java.time.Instant.ofEpochSecond(0, us * 1000).atZone(zone).toLocalDate.toString
    val fromDt = dt(fromUs)
    val toDt = dt(toUs)
    spark.read.parquet(dir)
      .filter(col("dt") >= fromDt && col("dt") <= toDt)
      .filter(col("start_us").between(fromUs, toUs))
  }
}
