package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerJobEnd, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Stage-level wall profile of one (or more) SparkEntry queries at bench
  * conditions: `runMain graft.tools.ProfileQuery <query> [query...]`
  * (sfDir from SPARK_GRAFT_SF_DIR, default sf0.1). One warm-up pass, one
  * profiled pass; prints every job (with duration) and the stages above
  * ~50 ms so the dominant exchanges/aggregations are attributable. The
  * r19 optimization round's measure-first harness (guide §1). */
object ProfileQuery {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.autoBroadcastJoinThreshold", s"${64 * 1024 * 1024}")
      .config("spark.sql.optimizer.excludedRules",
        "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class JobRec(id: Int, desc: String, var ms: Long = -1,
                      stages: mutable.Buffer[(Int, String, Long, Long)] = mutable.Buffer())
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    val starts = mutable.Map[Int, Long]()
    val stageJob = mutable.Map[Int, Int]()
    var capture = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (capture) {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description"))).getOrElse("")
        jobs.synchronized {
          jobs(js.jobId) = JobRec(js.jobId, desc)
          starts(js.jobId) = js.time
          js.stageIds.foreach(sid => stageJob(sid) = js.jobId)
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (capture) {
        jobs.synchronized {
          jobs.get(je.jobId).foreach(r => r.ms = je.time - starts.getOrElse(je.jobId, je.time))
        }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = if (capture) {
        val si = sc.stageInfo
        val ms = (for (a <- si.completionTime; b <- si.submissionTime) yield a - b).getOrElse(0L)
        jobs.synchronized {
          for (jid <- stageJob.get(si.stageId); r <- jobs.get(jid))
            r.stages += ((si.stageId, si.name.takeWhile(_ != '\n'), ms, si.numTasks.toLong))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    // capture the final (post-AQE) executed plan of the noop write
    @volatile var lastPlan: String = ""
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        lastPlan = qe.executedPlan.toString
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    val dumpPlans = sys.env.get("GRAFT_PROFILE_PLANS").contains("1")

    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      def run(): Double = {
        val t0 = System.nanoTime()
        fn(spark, d).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val warm = run()
      jobs.clear(); starts.clear(); stageJob.clear()
      capture = true
      val timed = run()
      capture = false
      Thread.sleep(500) // let the listener bus drain
      println(f"\n=== $name warm=$warm%.2fs profiled=$timed%.2fs jobs=${jobs.size} ===")
      jobs.values.foreach { j =>
        println(f"  job ${j.id}%3d ${j.ms}%6d ms  ${j.desc.take(80)}")
        j.stages.sortBy(-_._3).filter(_._3 >= 50).foreach { case (sid, nm, ms, nt) =>
          println(f"      stage $sid%4d ${ms}%6d ms ${nt}%4d tasks  ${nm.take(70)}")
        }
      }
      if (dumpPlans) {
        val p = java.nio.file.Paths.get(s"/tmp/graft_exec_plans/$name.txt")
        java.nio.file.Files.createDirectories(p.getParent)
        java.nio.file.Files.writeString(p, lastPlan)
        println(s"  executed plan -> $p")
      }
    }
    spark.stop()
  }
}
