package graft

/** Dev tool: dump formatted plans for plan-shape inspection.
  * Run: sbt "Test/runMain graft.PlanProbe q3_join trace_span_buffer" */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkTestBase.session
    val names = if (args.nonEmpty) args.toSeq else Seq("q3_join")
    names.foreach { n =>
      println(s"\n===================== $n =====================")
      SparkEntry.allDefs(n).fn(spark, "/root/testdata/sf0.01").explain("formatted")
    }
    spark.stop()
  }
}
