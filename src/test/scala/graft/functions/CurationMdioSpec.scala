package graft.functions

import graft.SparkSpec
import graft.sources.MdioWriter
import graft.spec.MdioSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Cross-cutting integration: the curation pipeline's OUTPUT lands in an
  * MDIO store and round-trips — pack documents into training windows,
  * persist the per-bin manifest (docs, tokens) as chunked 1-D variables
  * over the bin index, read it back through the connector, and verify
  * against the DataFrame that produced it. This is the production shape:
  * curation emits a bin manifest that trainers read by slice. */
class CurationMdioSpec extends SparkSpec {
  import spark.implicits._

  test("packed-bin manifest round-trips through a chunked MDIO store") {
    val docs = graft.Tables.documents(spark, sf)
    // pack one group (lang-independent) so bins form one contiguous index
    val packed = Curation.packSequences(
      docs.withColumn("g", lit(1)), "text", "doc_id", Seq("g"), 512L)
    val manifest = packed.groupBy(col("bin"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
           sum(col("n_tok")).cast("double").as("tokens"))
      .orderBy("bin").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val nBins = manifest.length
    assert(nBins > 1, "corpus must pack into multiple bins")

    val dir = Files.createTempDirectory("mdio_cur").resolve("bins.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      s"""{
         |  "metadata": {"name": "bins", "apiVersion": "v1.0",
         |               "createdOn": "2026-01-01T00:00:00Z"},
         |  "variables": [
         |    {"name": "bin", "dataType": "int64",
         |     "dimensions": [{"name": "bin", "size": $nBins}]},
         |    {"name": "n_docs", "dataType": "int64",
         |     "dimensions": [{"name": "bin", "size": $nBins}],
         |     "metadata": {"chunkGrid": {"name": "regular",
         |       "configuration": {"chunkShape": [8]}}}},
         |    {"name": "tokens", "dataType": "float64",
         |     "dimensions": [{"name": "bin", "size": $nBins}],
         |     "metadata": {"chunkGrid": {"name": "regular",
         |       "configuration": {"chunkShape": [8]}}}}
         |  ]
         |}""".stripMargin), dir)
    val manifestDf = manifest.toSeq.toDF("bin", "n_docs", "tokens")
    MdioWriter.writeVariable(spark, manifestDf.select("bin", "n_docs"), dir, "n_docs")
    MdioWriter.writeVariable(spark, manifestDf.select("bin", "tokens"), dir, "tokens")

    val back = spark.read.format("mdio").load(dir)
      .select("bin", "n_docs", "tokens")
      .as[(Long, Long, Double)].collect().toSet
    assert(back == manifest.toSet, "manifest must round-trip bit-exactly")

    // slice read: a trainer fetching bins [2, 5) sees exactly those bins
    val slice = graft.operators.MdioDataset.open(spark, dir)
      .isel("bin", 2L, 5L).data
      .select("bin", "n_docs").as[(Long, Long)].collect().toSet
    assert(slice == manifest.slice(2, 5).map(t => (t._1, t._2)).toSet)
    MdioWriter.delete(dir)
  }
}
