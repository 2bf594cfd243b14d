package graft
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Dev-only measurement main (guide §1: measure first). For each named
  * query, runs construction + `count()` REPEAT times in one JVM and
  * prints, per run: wall seconds, Spark job count, stage count, task
  * count, and summed executor task time — the empirical attribution
  * the optimization rounds work from (is a query slow because of data
  * work, or because of plan/stage overhead?). Optionally writes
  * `.explain("formatted")` to plans/<tag>/<query>.txt so plan-shape
  * claims in OPTIMIZATION notes are reproducible artifacts.
  *
  * Not part of the driver contract; changes nothing about Bench. */
object Spot {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val repeat = sys.env.getOrElse("SPARK_GRAFT_SPOT_REPEAT", "3").toInt
    val planDir = sys.env.get("SPARK_GRAFT_PLAN_DIR") // e.g. plans/r18 + suffix
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    val tasks = new AtomicInteger(0)
    val taskNanos = new AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(st: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (t.taskMetrics != null)
          taskNanos.addAndGet(t.taskMetrics.executorRunTime * 1000000L)
      }
    })
    def resetCounters(): Unit = { jobs.set(0); stages.set(0); tasks.set(0); taskNanos.set(0L) }

    val names = args.toSeq
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      (1 to repeat).foreach { i =>
        resetCounters()
        val t0 = System.nanoTime()
        val df = fn(spark, sfDir)
        val tCons = (System.nanoTime() - t0) / 1e9
        df.count()
        val wall = (System.nanoTime() - t0) / 1e9
        Thread.sleep(200) // let listener events drain
        println(f"[spot] $name run=$i wall=$wall%.3f cons=$tCons%.3f " +
          f"jobs=${jobs.get} stages=${stages.get} tasks=${tasks.get} " +
          f"taskTime=${taskNanos.get / 1e9}%.3f")
        if (i == repeat) planDir.foreach { pd =>
          val p = java.nio.file.Paths.get(pd)
          java.nio.file.Files.createDirectories(p)
          java.nio.file.Files.write(p.resolve(s"$name.txt"),
            df.queryExecution.explainString(
              org.apache.spark.sql.execution.FormattedMode).getBytes("UTF-8"))
        }
      }
    }
    spark.stop()
  }
}
