package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins the two contracts of [[LineageCut]]: (1) per-round plan size
  * stays O(1) across iterations (the lineage actually gets cut), and
  * (2) the `spark.graft.checkpointDir` knob switches to RELIABLE
  * checkpointing — blocks land in the configured directory (the
  * cluster-scale mode where executor loss must not kill an iterative
  * job), with identical results. */
class LineageCutSpec extends SparkSpec {
  import graft.functions.LineageCut.CutOps

  private def planSize(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect { case p => p }.size

  private def iterate(cutting: Boolean): DataFrame = {
    var df = spark.range(100).select(col("id").as("node"), col("id").as("lab"))
    for (_ <- 1 to 4) {
      val next = df.select(col("node"), (col("lab") * 3 % 97).as("lab"))
        .groupBy(col("lab")).agg(min(col("node")).as("node"))
        .select(col("node"), col("lab"))
      df = if (cutting) next.lineageCut else next
    }
    df
  }

  test("lineage cut keeps per-round plan size O(1)") {
    val cut = iterate(cutting = true)
    val raw = iterate(cutting = false)
    assert(planSize(cut) <= 3, "cut plan must be a scan of materialized blocks")
    assert(planSize(raw) > planSize(cut), "uncut plan grows with iterations")
    // identical results either way
    assert(cut.orderBy("lab").collect().toSeq == raw.orderBy("lab").collect().toSeq)
  }

  test("lazy cut truncates lineage at the next action, identical results") {
    // the r19 iterative-round shape: the convergence-checksum action both
    // materializes the checkpoint and reads it — no dedicated job
    var df = spark.range(100).select(col("id").as("node"), col("id").as("lab"))
    for (_ <- 1 to 4) {
      val next = df.select(col("node"), (col("lab") * 3 % 97).as("lab"))
        .groupBy(col("lab")).agg(min(col("node")).as("node"))
        .select(col("node"), col("lab")).lineageCutLazy
      next.agg(sum(col("lab"))).head() // the per-round action
      df = next
    }
    assert(planSize(df) <= 3, "lazy cut must truncate after the action")
    assert(df.orderBy("lab").collect().toSeq ==
      iterate(cutting = true).orderBy("lab").collect().toSeq)
  }

  test("checkpointDir knob switches to reliable checkpointing") {
    val dir = java.nio.file.Files.createTempDirectory("graft_reliable_ckpt")
    try {
      spark.conf.set(LineageCut.ConfKey, dir.toString)
      val df = spark.range(50).select(col("id"), (col("id") % 7).as("k")).lineageCut
      assert(df.count() == 50)
      // blocks must be ON DISK under the configured dir, not executor memory
      val files = java.nio.file.Files.walk(dir)
      val n = try files.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally files.close()
      assert(n > 0, s"reliable checkpoint must write files under $dir")
    } finally {
      spark.conf.unset(LineageCut.ConfKey)
      // leave checkpoint files for the session lifetime (RDD may still read them)
    }
  }

  test("re-points when the configured dir changes to a PREFIX of the old one") {
    // regression: the old check substring-matched the active checkpoint
    // path against the configured parent, so switching /tmp/x/ckpt2 ->
    // /tmp/x/ckpt (a prefix) silently kept writing into the stale dir
    val base = java.nio.file.Files.createTempDirectory("graft_ckpt_prefix")
    val oldDir = base.resolve("ckpt2"); val newDir = base.resolve("ckpt")
    try {
      spark.conf.set(LineageCut.ConfKey, oldDir.toString)
      assert(spark.range(5).toDF("id").lineageCut.count() == 5)
      spark.conf.set(LineageCut.ConfKey, newDir.toString)
      assert(spark.range(5).toDF("id").lineageCut.count() == 5)
      val files = java.nio.file.Files.walk(newDir)
      val n = try files.filter(java.nio.file.Files.isRegularFile(_)).count()
      finally files.close()
      assert(n > 0, s"checkpoint after dir change must land under $newDir")
    } finally spark.conf.unset(LineageCut.ConfKey)
  }

  test("default mode (no knob) localCheckpoints — no external writes") {
    assert(spark.conf.getOption(LineageCut.ConfKey).isEmpty)
    val df = spark.range(10).toDF("id").lineageCut
    assert(df.count() == 10)
  }
}
