package graft.sources

import graft.SparkSpec
import graft.operators.MdioFsck
import graft.spec.MdioSpec
import graft.zarr.ZarrMeta
import java.nio.file.Files

/** [[MdioFsck]] — every corruption class the audit claims to detect,
  * injected for real: a clean store audits clean with exact totals, a
  * tampered sidecar bound is caught by the DISTRIBUTED recompute, a
  * beyond-grid chunk file and an orphan stat fragment surface from the
  * inventory sweep, a garbage shard file reads as torn, and a stale
  * generation downgrades to the single legal-state warning. */
class MdioFsckSpec extends SparkSpec {
  import spark.implicits._

  private def create(): String = {
    val dir = Files.createTempDirectory("mdio_fsck").resolve("s.mdio").toString
    MdioWriter.create(MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
        |  "variables": [
        |    {"name": "x", "dataType": "int64",
        |     "dimensions": [{"name": "x", "size": 64}]},
        |    {"name": "v", "dataType": "float64",
        |     "dimensions": [{"name": "x", "size": 64}],
        |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [8]}}}}
        |  ]
        |}""".stripMargin), dir)
    MdioWriter.writeVariable(spark,
      spark.range(64).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
    dir
  }

  private def findings(dir: String) =
    MdioFsck.check(spark, dir, "v").findings
      .select("severity", "kind", "subject").collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).toSeq

  test("a clean store audits clean with exact totals") {
    val dir = create()
    val a = MdioFsck.check(spark, dir, "v")
    assert(a.findings.count() == 0L, a.findings.collect().mkString("\n"))
    assert(a.chunksAudited == 8L && a.cells == 64L, a)
    MdioWriter.delete(dir)
  }

  test("checkAll audits every variable, coordinates included") {
    val dir = create()
    val a = MdioFsck.checkAll(spark, dir)
    // v: 8 chunks / 64 cells; the x coordinate array audits too (its own
    // sidecar state contributes whatever it has — no errors either way)
    assert(a.findings.filter($"severity" === "error").count() == 0L,
      a.findings.collect().mkString("\n"))
    assert(a.chunksAudited >= 8L && a.cells >= 64L, a)
    MdioWriter.delete(dir)
  }

  test("a tampered sidecar bound is caught by the distributed recompute") {
    val dir = create()
    val varDir = ZarrMeta.path(dir).resolve("v")
    val entries = MdioChunkStats.current(varDir).get
    val bad = entries.updated("3",
      entries("3").map(b => b.copy(min = b.min + 1))) // claims min 25, data has 24
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir), bad)
    val f = findings(dir)
    assert(f == Seq(("error", "recompute", "3")), f)
    MdioWriter.delete(dir)
  }

  test("inventory: beyond-grid chunk files and orphan fragments surface") {
    val dir = create()
    val varDir = ZarrMeta.path(dir).resolve("v")
    varDir.resolve("9").write(Array[Byte](1, 2, 3)) // grid has chunks 0-7
    varDir.resolve(".mdio_statfrag.deadjob.x").writeString("[]")
    val f = findings(dir)
    assert(f.contains(("error", "inventory", "9")) &&
      f.contains(("warning", "inventory", ".mdio_statfrag.deadjob.x")), f)
    MdioWriter.delete(dir)
  }

  test("a corrupt chunk key inside a shard is a finding, not a crash") {
    val dir = create()
    val varDir = ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 4)
    // corrupt shard 0's key "0" into a non-numeric key in place — the
    // audit must keep going and name the entry (checks 2-4 still run)
    val sf = varDir.resolve(MdioChunkStats.shardFile(0L))
    sf.writeString(new String(sf.readBytesOrNull(), "UTF-8")
      .replaceFirst("\"0\":", "\"bogus\":"))
    val f = findings(dir)
    assert(f.contains(("error", "entry", "bogus")), f)
    MdioWriter.delete(dir)
  }

  test("sharded-manifest audit parses shard files on executors, not the driver") {
    val dir = create()
    val varDir = ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 2) // 4 shard files
    val a = MdioFsck.check(spark, dir, "v")
    assert(a.chunksAudited == 8L && a.cells == 64L, a)
    assert(a.findings.count() == 0L, a.findings.collect().mkString("\n"))
    // the expected side of the recompute join is the DISTRIBUTED shard
    // parse (the serialized map over the shard-id dataset), never a
    // driver-built local relation of chunk entries — the driver holds the
    // manifest and the findings, not the ~1.6 M-entry sidecar
    val plan = a.findings.queryExecution.optimizedPlan.toString
    assert(plan.contains("SerializeFromObject"), plan.take(800))
    assert(!plan.contains("LocalTableScan [key"), plan.take(800))
    MdioWriter.delete(dir)
  }

  test("inventory: v3 nested chunk files check against the on-disk grid") {
    def createV3(shard: Boolean): String = {
      val dir = Files.createTempDirectory("mdio_fsck").resolve("v3.mdio").toString
      val grid = if (shard) "{\"chunkShape\": [8], \"shardShape\": [16]}"
        else "{\"chunkShape\": [8]}"
      MdioWriter.create(MdioSpec.fromJson(
        s"""{
           |  "metadata": {"name": "s", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
           |  "variables": [
           |    {"name": "x", "dataType": "int64",
           |     "dimensions": [{"name": "x", "size": 64}]},
           |    {"name": "v", "dataType": "float64",
           |     "dimensions": [{"name": "x", "size": 64}],
           |     "metadata": {"chunkGrid": {"name": "regular", "configuration": $grid}}}
           |  ]
           |}""".stripMargin), dir, version = 3)
      MdioWriter.writeVariable(spark,
        spark.range(64).select($"id".as("x"), $"id".cast("double").as("v")), dir, "v")
      dir
    }
    // unsharded: chunk files c/<i> live on the 8-chunk grid — c/9 is junk
    val dir = createV3(shard = false)
    ZarrMeta.path(dir).resolve("v").resolve("c/9").write(Array[Byte](1))
    val f = findings(dir)
    assert(f.contains(("error", "inventory", "c/9")), f)
    // sharded: the FILES are shard objects on the 4-shard grid — c/5 is
    // beyond-grid even though the INNER chunk grid has 8 positions
    val dir2 = createV3(shard = true)
    ZarrMeta.path(dir2).resolve("v").resolve("c/5").write(Array[Byte](1))
    val f2 = findings(dir2)
    assert(f2.contains(("error", "inventory", "c/5")), f2)
    assert(!f2.exists(x => x._2 == "inventory" && x._3 == "c/3"), f2)
    MdioWriter.delete(dir); MdioWriter.delete(dir2)
  }

  test("a garbage shard file reads as torn; stale stats downgrade to one warning") {
    val dir = create()
    val varDir = ZarrMeta.path(dir).resolve("v")
    MdioChunkStats.write(varDir, MdioChunkStats.generation(varDir),
      MdioChunkStats.current(varDir).get, span = 4)
    varDir.resolve(MdioChunkStats.shardFile(1L)).writeString("{ not json")
    val torn = findings(dir)
    assert(torn.exists(x => x._1 == "error" && x._2 == "shard" && x._3 == "s1"), torn)
    // stale: bump the data generation past the sidecar — one warning, no
    // recompute false-positives (stale is a legal state, not corruption)
    val dir2 = create()
    MdioChunkStats.bump(ZarrMeta.path(dir2).resolve("v"))
    val f2 = findings(dir2)
    assert(f2 == Seq(("warning", "stats", "v")), f2)
    MdioWriter.delete(dir); MdioWriter.delete(dir2)
  }
}
