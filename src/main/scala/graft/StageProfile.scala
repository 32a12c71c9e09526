package graft

/** Measurement tool (guide §1/§7): run named registry queries with a
  * stage listener and print per-stage wall time, task count, and name,
  * plus per-query job count — the empirical loop's substitute for the
  * (disabled) Spark UI. Not part of the driver contract.
  *
  * Usage: runMain graft.StageProfile <query> [query...]
  */
object StageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-stageprofile")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE",
          graft.session.ShuffleWidth.forBytes(
            graft.session.ShuffleWidth.dirBytes(sfDir), cpus.toInt).toString))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    // experiment pass-through: SPARK_GRAFT_EXTRA_CONF="k=v;k=v"
    sys.env.get("SPARK_GRAFT_EXTRA_CONF").foreach(_.split(";").foreach { kv =>
      val Array(k, v) = kv.split("=", 2)
      spark.conf.set(k, v)
    })
    spark.sparkContext.setLogLevel("WARN")

    final case class St(id: Int, name: String, tasks: Int,
        submitted: Long, completed: Long, shuffleReadMs: Long,
        execRunMs: Long, gcMs: Long)
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[St]()
    val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val m = i.taskMetrics
        stages.add(St(i.stageId, i.name.linesIterator.next().take(90),
          i.numTasks,
          i.submissionTime.getOrElse(0L), i.completionTime.getOrElse(0L),
          m.shuffleReadMetrics.fetchWaitTime,
          m.executorRunTime, m.jvmGCTime))
      }
      override def onJobStart(
          e: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        jobs.incrementAndGet(); ()
      }
    }
    spark.sparkContext.addSparkListener(listener)

    val byName = SparkEntry.registry.map(q => q.name -> q).toMap
    // warm codegen/listing paths
    try SparkEntry.queries("q6_forecast_revenue")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }

    args.foreach { name =>
      byName.get(name).foreach { q =>
        // warm run (codegen), then profiled run
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
        stages.clear(); jobs.set(0)
        val t0 = System.nanoTime()
        q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener drain
        println(f"== $name wall=$wall%.3f jobs=${jobs.get()}")
        import scala.jdk.CollectionConverters._
        val ss = stages.asScala.toSeq.sortBy(_.submitted)
        val t00 = ss.headOption.map(_.submitted).getOrElse(0L)
        ss.foreach { s =>
          println(f"   stage ${s.id}%4d +${s.submitted - t00}%6dms dur=${
            s.completed - s.submitted}%5dms tasks=${s.tasks}%4d execRun=${
            s.execRunMs}%6dms gc=${s.gcMs}%4dms fetchWait=${
            s.shuffleReadMs}%4dms  ${s.name}")
        }
        spark.sparkContext.getPersistentRDDs.values
          .foreach(_.unpersist(blocking = true))
      }
    }
    spark.stop()
  }
}
