package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import graft.zarr.ZarrMeta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** PERCENTILE_CONT / PERCENTILE_DISC aggregate pushdown (A-family
  * extension, r17): `median(v)` and the WITHIN-GROUP percentile forms
  * route into the exact quantile-by-pruning rank machinery
  * ([[graft.operators.MdioStats.kthSmallest]]) as a COMPLETE pushdown —
  * the optimized plan is a bare relation, no Spark-side aggregate, and
  * the answer must be BIT-identical to Spark's own Percentile (the CONT
  * interpolation replicates PercentileBase's double arithmetic). Every
  * semantics-risking shape must DECLINE: possible NaN (Spark ranks NaN
  * greatest; the rank machinery ranks finite cells), dim-range filters
  * (ranks are global), grouping, descending order, stale stats. */
class MdioPctPushdownSpec extends SparkSpec {
  import spark.implicits._

  private def create(values: Long => Double, dtype: String = "float64"): String = {
    val dir = Files.createTempDirectory("mdio_pct").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      s"""{
         |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
         |  "variables": [
         |    {"name": "x", "dataType": "int64",
         |     "dimensions": [{"name": "x", "size": 64}]},
         |    {"name": "v", "dataType": "$dtype",
         |     "dimensions": [{"name": "x", "size": 64}],
         |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
         |  ]
         |}""".stripMargin), dir)
    val fn = udf(values.apply _)
    val vcol = if (dtype.startsWith("float")) fn($"id") else fn($"id").cast("long")
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), vcol.as("v")), dir, "v")
    dir
  }

  private def aggDF(dir: String): DataFrame =
    spark.read.format("mdio").load(dir).agg(
      median(col("v")).as("med"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").as("p90"),
      expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY v)").as("p25"),
      expr("percentile_disc(1.0) WITHIN GROUP (ORDER BY v)").as("p100"))

  private def pushed(df: DataFrame): Boolean = {
    val plan = df.queryExecution.optimizedPlan.toString
    plan.contains("vpct") && !plan.contains("Aggregate")
  }

  /** Seq equality where NaN == NaN (boxed-double == is numeric). */
  private def sameSeq(a: Seq[Any], b: Seq[Any]): Boolean =
    a.size == b.size && a.zip(b).forall {
      case (x: Double, y: Double) => (x.isNaN && y.isNaN) || x == y
      case (x, y) => x == y
    }

  private def sparkSide(vs: Seq[Double]): Seq[Any] =
    vs.toDF("v").agg(
      median(col("v")),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)"),
      expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY v)"),
      expr("percentile_disc(1.0) WITHIN GROUP (ORDER BY v)")).head.toSeq

  test("median/percentile push down completely and match Spark bit-for-bit") {
    // odd-ish distribution with ties across chunk boundaries
    val vals = (0 until 64).map(i => ((i * 7) % 13).toDouble)
    val dir = create(i => vals(i.toInt))
    val df = aggDF(dir)
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head.toSeq == sparkSide(vals), "pushed percentile diverged")
    MdioWriter.delete(dir)
  }

  test("integral columns push down; result is double like Spark's") {
    val vals = (0 until 64).map(i => ((i * 11) % 17).toDouble)
    val dir = create(i => vals(i.toInt), dtype = "int32")
    val df = aggDF(dir)
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head.toSeq ==
      vals.map(_.toLong).toDF("v").agg(
        median(col("v")),
        expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)"),
        expr("percentile_cont(0.25) WITHIN GROUP (ORDER BY v)"),
        expr("percentile_disc(1.0) WITHIN GROUP (ORDER BY v)")).head.toSeq)
    MdioWriter.delete(dir)
  }

  test("possible NaN declines the pushdown; Spark's NaN-is-greatest answer stands") {
    val vals = (0 until 64).map(i => if (i % 9 == 4) Double.NaN else i.toDouble)
    val dir = create(i => vals(i.toInt))
    val df = aggDF(dir)
    assert(!pushed(df), df.queryExecution.optimizedPlan.toString)
    assert(sameSeq(df.head.toSeq, sparkSide(vals)))
    MdioWriter.delete(dir)
  }

  test("grouped (slab) percentiles push down and match Spark's groupBy") {
    val vals = (0 until 64).map(i => ((i * 7) % 13).toDouble)
    val dir = create(i => vals(i.toInt))
    val base = spark.read.format("mdio").load(dir)
    val df = base.groupBy(floor($"x" / 16).as("slab")).agg(
      median($"v").as("med"),
      expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)").as("p90"),
      max($"v").as("mx")) // mixed with a metadata-answered agg
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    val got = df.orderBy("slab").collect().map(_.toSeq).toSeq
    val want = vals.zipWithIndex.map { case (v, x) => (v, x.toLong) }
      .toDF("v", "x")
      .groupBy(floor($"x" / 16).as("slab")).agg(
        median($"v"), expr("percentile_disc(0.9) WITHIN GROUP (ORDER BY v)"),
        max($"v"))
      .orderBy("slab").collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    // a slab width that splits chunks declines (boxRanks needs whole
    // chunks per box) but stays correct through Spark's aggregate
    val dfm = base.groupBy(floor($"x" / 12).as("slab")).agg(median($"v").as("m"))
    assert(!pushed(dfm))
    assert(dfm.orderBy("slab").collect().map(_.toSeq).toSeq ==
      vals.zipWithIndex.map { case (v, x) => (v, x.toLong) }.toDF("v", "x")
        .groupBy(floor($"x" / 12).as("slab")).agg(median($"v"))
        .orderBy("slab").collect().map(_.toSeq).toSeq)
    MdioWriter.delete(dir)
  }

  test("u64 (decimal) columns push down; ranking stays decimal-exact past 2^63") {
    val dir = Files.createTempDirectory("mdio_pct").resolve("u.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "u", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "u", "dataType": "uint64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    val twoTo63 = BigDecimal("9223372036854775808")
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"),
        ($"id".cast("decimal(21,0)") + lit(twoTo63)).cast("decimal(20,0)").as("u")),
      dir, "u")
    val df = spark.read.format("mdio").load(dir).agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY u)").as("q1"),
      median(col("u")).as("med"))
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    val plain = (0 until 64).map(i => (twoTo63 + i).underlying).toDF("u").agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY u)"),
      median(col("u"))).head
    assert(df.head.toSeq == plain.toSeq)
    MdioWriter.delete(dir)
  }

  test("2-D tile grouping pushes down: GROUP BY two slab dims") {
    val dir = Files.createTempDirectory("mdio_pct").resolve("t.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "inline", "dataType": "int64",
        |     "dimensions": [{"name": "inline", "size": 16}]},
        |    {"name": "crossline", "dataType": "int64",
        |     "dimensions": [{"name": "crossline", "size": 8}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "inline", "size": 16}, {"name": "crossline", "size": 8}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [4, 4]}}}}
        |  ]
        |}""".stripMargin), dir)
    val cells = spark.range(16).select($"id".as("inline"))
      .crossJoin(spark.range(8).select($"id".as("crossline")))
      .select($"inline", $"crossline",
        (($"inline" * 3 + $"crossline" * 7) % 11).cast("double").as("v"))
    MdioWriter.writeVariable(spark, cells, dir, "v")
    val df = spark.read.format("mdio").load(dir)
      .groupBy(floor($"inline" / 8).as("ti"), floor($"crossline" / 4).as("tj"))
      .agg(median($"v").as("med"),
        expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").as("p75"))
    assert(pushed(df), df.queryExecution.optimizedPlan.toString)
    val got = df.orderBy("ti", "tj").collect().map(_.toSeq).toSeq
    val want = cells
      .groupBy(floor($"inline" / 8).as("ti"), floor($"crossline" / 4).as("tj"))
      .agg(median($"v"), expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)"))
      .orderBy("ti", "tj").collect().map(_.toSeq).toSeq
    assert(got == want, s"got $got want $want")
    MdioWriter.delete(dir)
  }

  test("filters, non-slab grouping, descending order, and stale stats all decline") {
    val dir = create(_.toDouble)
    val base = spark.read.format("mdio").load(dir)
    assert(!pushed(base.filter($"x" >= 8).agg(median($"v").as("m"))))
    assert(!pushed(base.groupBy(($"x" % 2).as("g")).agg(median($"v").as("m"))))
    assert(!pushed(base.agg(
      expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v DESC)").as("m"))))
    // all of the above still answer correctly through Spark's aggregate
    assert(base.filter($"x" >= 8).agg(median($"v")).head.getDouble(0) == 35.5)
    MdioChunkStats.bump(ZarrMeta.path(dir).resolve("v")) // stale sidecar
    assert(!pushed(base.agg(median($"v").as("m"))))
    assert(base.agg(median($"v")).head.getDouble(0) == 31.5)
    MdioWriter.delete(dir)
  }
}
