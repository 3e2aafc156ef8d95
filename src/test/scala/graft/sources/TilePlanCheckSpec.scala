package graft.sources
import graft.SparkSpec
class TilePlanCheckSpec extends SparkSpec {
  test("zarr_stats_by_tile plans metadata-only") {
    val df = graft.queries.Mdio.qZarrStatsByTile(spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode)
    assert(p.contains("group by inline/8,crossline/4"), p.take(900))
    assert(!p.contains("HashAggregate"), p.take(900))
    assert(df.count() == 8)
  }
}
