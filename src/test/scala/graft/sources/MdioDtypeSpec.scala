package graft.sources

import graft.SparkSpec
import graft.spec.MdioSpec
import graft.sources.MdioWriter
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** SURVEY §7.4 hard part 1: unsigned/complex widening applied consistently
  * on read AND write so Zarr round-trips are byte-exact (the reference's
  * fill-value-parity test family, mdio/acceptance_test.cc:1243-1320). */
class MdioDtypeSpec extends SparkSpec {
  import spark.implicits._

  private def make(dtype: String): String = {
    val dir = Files.createTempDirectory("mdio_dt").resolve("d.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      s"""{
         |  "metadata": {"name": "d", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
         |  "variables": [
         |    {"name": "i", "dataType": "int64", "dimensions": [{"name": "i", "size": 4}]},
         |    {"name": "v", "dataType": "$dtype", "dimensions": [{"name": "i", "size": 4}]}
         |  ]
         |}""".stripMargin), dir)
    dir
  }

  test("int64 round-trips losslessly above 2^53") {
    val dir = make("int64")
    val big = Seq(0L, (1L << 60) + 7L, Long.MaxValue - 1, -42L)
    MdioWriter.writeVariable(spark,
      big.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v"), dir, "v")
    val got = spark.read.format("mdio").load(dir).orderBy("i").select("v").as[Long].collect().toSeq
    assert(got == big)
    MdioWriter.delete(dir)
  }

  test("uint64 round-trips through decimal(20,0), incl. values above 2^63") {
    val dir = make("uint64")
    val vals = Seq(BigDecimal(0), BigDecimal("18446744073709551614"),
      BigDecimal("9223372036854775808"), BigDecimal(17))
    MdioWriter.writeVariable(spark,
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v"), dir, "v")
    val df = spark.read.format("mdio").load(dir)
    assert(df.schema("v").dataType.simpleString == "decimal(20,0)")
    val got = df.orderBy("i").select(col("v").cast("string")).as[String].collect().toSeq
    assert(got == vals.map(_.toBigInt.toString))
    MdioWriter.delete(dir)
  }

  test("complex64 round-trips as struct(re, im); missing cells fill NaN") {
    val dir = make("complex64")
    // write only 3 of 4 cells — cell 3 materializes the [NaN, NaN] fill
    val rows = Seq((0L, (1.5f, -2.5f)), (1L, (0.0f, 1.0f)), (2L, (3.25f, 4.75f)))
    MdioWriter.writeVariable(spark,
      rows.toDF("i", "v").select(col("i"),
        struct(col("v._1").as("re"), col("v._2").as("im")).as("v")), dir, "v")
    val df = spark.read.format("mdio").load(dir)
    assert(df.schema("v").dataType.simpleString == "struct<re:float,im:float>")
    val got = df.orderBy("i").select("v.re", "v.im").as[(Float, Float)].collect()
    assert(got.take(3).toSeq == rows.map(_._2))
    assert(got(3)._1.isNaN && got(3)._2.isNaN)
    MdioWriter.delete(dir)
  }

  test("rechunk carries the exotic dtype matrix byte-exactly (u64 above 2^63, complex)") {
    // the store-lifecycle ops reconstruct the spec from on-disk metadata;
    // this pins the dtype inverse map + write path over the widened types
    val d64 = make("uint64")
    val vals = Seq(BigDecimal("18446744073709551614"), BigDecimal("9223372036854775808"),
      BigDecimal(0), BigDecimal(17))
    MdioWriter.writeVariable(spark,
      vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("i", "v"), d64, "v")
    MdioWriter.rechunk(spark, d64, d64 + "_rc", Map("v" -> Seq(2L)))
    val got = spark.read.format("mdio").load(d64 + "_rc")
      .orderBy("i").select(col("v").cast("string")).as[String].collect().toSeq
    assert(got == vals.map(_.toBigInt.toString))
    MdioWriter.delete(d64 + "_rc"); MdioWriter.delete(d64)

    val dcx = make("complex64")
    MdioWriter.writeVariable(spark,
      Seq((0L, (1.5f, -2.5f)), (1L, (0f, 3f)), (2L, (-7f, 0.25f)), (3L, (4f, 4f)))
        .map { case (i, (re, im)) => (i, re, im) }.toDF("i", "re", "im")
        .select(col("i"), struct(col("re").as("re"), col("im").as("im")).as("v")),
      dcx, "v")
    MdioWriter.rechunk(spark, dcx, dcx + "_rc", Map("v" -> Seq(3L)))
    val gotC = spark.read.format("mdio").load(dcx + "_rc")
      .orderBy("i").select("v.re", "v.im").as[(Float, Float)].collect().toSeq
    assert(gotC == Seq((1.5f, -2.5f), (0f, 3f), (-7f, 0.25f), (4f, 4f)))
    MdioWriter.delete(dcx + "_rc"); MdioWriter.delete(dcx)
  }

  test("uint64 missing chunk fills with type max (reference fill parity)") {
    val dir = make("uint64")
    val got = spark.read.format("mdio").load(dir)
      .select(col("v").cast("string")).distinct().as[String].collect().toSeq
    assert(got == Seq("18446744073709551615"))
    MdioWriter.delete(dir)
  }

  test("complex and u64 scans take the VECTORIZED path (ColumnarToRow in plan)") {
    for (dtype <- Seq("uint64", "complex64")) {
      val dir = make(dtype)
      val df = spark.read.format("mdio").load(dir).select("i", "v")
      val hasColumnar = df.queryExecution.executedPlan.exists(
        _.isInstanceOf[org.apache.spark.sql.execution.ColumnarToRowExec])
      assert(hasColumnar, s"$dtype read did not go columnar:\n" +
        df.queryExecution.executedPlan.treeString.take(800))
      df.collect() // and the batch actually materializes
      MdioWriter.delete(dir)
    }
  }
}
