package graft

import org.apache.spark.sql.SparkSession

/** Dev tool: print the formatted physical plan (and optionally time) of
  * one declared query — explain-driven plan review.
  *
  * Usage: runMain graft.PlanDump <queryName> [sfDir] [time]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = Engine.tune(
      SparkSession.builder().master(s"local[$cpus]"), shufflePartitions = cpus)
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.queries(name)(spark, sfDir)
    println(s"===== $name @ $sfDir =====")
    df.explain("formatted")
    if (args.contains("stages")) {
      import org.apache.spark.scheduler._
      spark.sparkContext.addSparkListener(new SparkListener {
        override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime} yield c - s).getOrElse(-1L)
          println(f"[stage] id=${si.stageId}%3d tasks=${si.numTasks}%4d wall=${wall / 1000.0}%7.2fs  ${si.name.takeWhile(_ != '\n').take(80)}")
        }
      })
    }
    args.count(_ == "time") match {
      case 0 => ()
      case reps =>
        (1 to reps).foreach { i =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          println(f"[timed] $name #$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
        }
    }
    spark.stop()
  }
}
