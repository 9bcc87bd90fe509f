package graft.examples

import graft.{GraftSession, SparkEntry}
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}

/** Per-job/stage timing of one named SparkEntry query — the measure-first
  * loop's microscope: which jobs (and which stages inside them) a query's
  * wall time actually goes to. `runMain graft.examples.JobProfile <sfDir>
  * <queryName> [reps]`. Dev scratchpad; the bench gate is graft.Bench.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: JobProfile <sfDir> <queryName> [reps]")
    val dir = args(0)
    val name = args(1)
    val reps = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.local()
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(Int, String, Long, Long, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.put(js.jobId, (js.time, Option(js.properties.getProperty("spark.job.description")).getOrElse("")))
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        val (t0, desc) = jobs.getOrDefault(je.jobId, (je.time, "?"))
        done.add((je.jobId, je.time - t0, desc))
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for { a <- si.submissionTime; b <- si.completionTime } yield b - a).getOrElse(-1L)
        stages.add((si.stageId, si.name.takeWhile(_ != '\n'), wall, si.numTasks.toLong,
          si.taskMetrics.executorRunTime))
      }
    })

    val fn = SparkEntry.queries(name)
    // rep 0 warms codegen/JIT; later reps are the measured ones
    for (r <- 0 until reps) {
      jobs.clear(); done.clear(); stages.clear()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val n = fn(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"%nrep $r: $name $wall%.2f s ($n rows)")
      // drain asynchronously-delivered listener events before reading:
      // poll until the queue sizes stabilize (a fixed 300 ms sleep dropped
      // events that arrived later under load; the bus itself is
      // private[spark], so stabilization is the accessible proxy)
      var seen = (-1, -1)
      var cur = (done.size(), stages.size())
      var spins = 0
      while (seen != cur && spins < 50) {
        seen = cur; Thread.sleep(100); cur = (done.size(), stages.size()); spins += 1
      }
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_._1)
      println(f"  ${js.size} jobs, sum ${js.map(_._2).sum / 1e3}%.2f s")
      js.foreach { case (id, ms, desc) =>
        if (ms >= 40) println(f"  job $id%3d ${ms / 1e3}%6.2f s  ${desc.take(90)}")
      }
      val ss = stages.asScala.toSeq.sortBy(-_._3).take(12)
      println("  slowest stages (wall ms, tasks, execRunTime ms):")
      ss.foreach { case (id, nm, w, nt, rt) =>
        println(f"  stage $id%4d wall $w%6d  tasks $nt%3d  run $rt%6d  ${nm.take(70)}")
      }
    }
    spark.stop()
  }
}
