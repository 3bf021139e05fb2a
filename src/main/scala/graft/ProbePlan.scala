package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan/timing inspector for a declared query: prints the FORMATTED
  * plan after one timed materialization (so AQE's final decisions are in)
  * plus per-stage task counts — the `.explain`-and-iterate loop the build
  * rules require, packaged as a main so it runs under the same session
  * conf as Bench. Usage: runMain graft.ProbePlan <query> [sfDir] [reps]. */
object ProbePlan {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = MasterEnv.standardBuilder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val run = si.taskMetrics.executorRunTime / 1e3
        if (run > 0.5)
          Console.err.println(f"[stage] ${si.stageId}%4d ${si.numTasks}%4d tasks ${run}%8.1f s-cpu  ${si.name.take(80)}")
      }
    })
    for (i <- 1 to reps) {
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      val secs = (System.nanoTime() - t0) / 1e9
      Console.err.println(f"[probeplan] $name rep $i: $secs%.2f s")
      if (i == reps) {
        Console.err.println(df.queryExecution.executedPlan.toString.take(12000))
      }
      graft.data.Frames.releaseTracked()
    }
    spark.stop()
  }
}
