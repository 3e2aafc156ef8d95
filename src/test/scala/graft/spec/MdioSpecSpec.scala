package graft.spec

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._

/** Spec-layer parity with the reference's validator/factory
  * (mdio/dataset_validator.h, mdio/dataset_factory.h). */
class MdioSpecSpec extends AnyFunSuite {

  private val good =
    """{
      |  "metadata": {"name": "toy", "apiVersion": "v1.0", "createdOn": "2026-01-01T00:00:00Z"},
      |  "variables": [
      |    {"name": "inline", "dataType": "uint32",
      |     "dimensions": [{"name": "inline", "size": 4}]},
      |    {"name": "crossline", "dataType": "uint32",
      |     "dimensions": [{"name": "crossline", "size": 6}]},
      |    {"name": "cdp-x", "dataType": "float64",
      |     "dimensions": [{"name": "inline", "size": 4}, {"name": "crossline", "size": 6}]},
      |    {"name": "image", "dataType": "float32",
      |     "dimensions": [{"name": "inline", "size": 4}, {"name": "crossline", "size": 6}],
      |     "coordinates": ["cdp-x"],
      |     "metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 3]}}}}
      |  ]
      |}""".stripMargin

  test("parses a valid spec: dims, chunks, coordinates") {
    val ds = MdioSpec.fromJson(good)
    assert(ds.name == "toy" && ds.apiVersion == 1)
    assert(ds.dimensions == Map("inline" -> 4L, "crossline" -> 6L))
    val img = ds.variable("image")
    assert(img.chunks == Seq(2L, 3L))
    assert(img.coordinates == Seq("cdp-x"))
    assert(ds.variable("inline").isDimensionCoordinate)
    // cdp-x is listed as a coordinate of image, so data variables = [image]
    assert(ds.dataVariables.map(_.name) == Seq("image"))
  }

  test("missing required fields error (schema rules)") {
    intercept[IllegalArgumentException](
      MdioSpec.fromJson("""{"metadata": {"name": "x"}, "variables": []}"""))
    intercept[IllegalArgumentException](MdioSpec.fromJson(
      """{"metadata": {"name": "x", "apiVersion": 1, "createdOn": "t"},
        |"variables": [{"name": "v", "dimensions": []}]}""".stripMargin))
  }

  test("v0 specs rejected (mdio/dataset.h:1047-1055)") {
    intercept[IllegalArgumentException](MdioSpec.fromJson(
      """{"metadata": {"name": "x", "apiVersion": "v0.1", "createdOn": "t"},
        |"variables": [{"name": "d", "dataType": "int32", "dimensions": [{"name": "d", "size": 2}]}]}""".stripMargin))
  }

  test("conflicting dimension sizes rejected (get_dimensions)") {
    val bad = good.replace("""{"name": "crossline", "size": 6}],
     |""".stripMargin, "")
    intercept[IllegalArgumentException](MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": 1, "createdOn": "t"},
        |  "variables": [
        |    {"name": "d", "dataType": "int32", "dimensions": [{"name": "d", "size": 2}]},
        |    {"name": "a", "dataType": "int32", "dimensions": [{"name": "d", "size": 3}]}
        |  ]
        |}""".stripMargin))
  }

  test("dimension without dimension-coordinate variable rejected") {
    intercept[IllegalArgumentException](MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": 1, "createdOn": "t"},
        |  "variables": [
        |    {"name": "a", "dataType": "int32", "dimensions": [{"name": "d", "size": 3}]}
        |  ]
        |}""".stripMargin))
  }

  test("unknown listed coordinate rejected") {
    intercept[IllegalArgumentException](MdioSpec.fromJson(
      """{
        |  "metadata": {"name": "t", "apiVersion": 1, "createdOn": "t"},
        |  "variables": [
        |    {"name": "d", "dataType": "int32", "dimensions": [{"name": "d", "size": 2}]},
        |    {"name": "a", "dataType": "int32", "dimensions": [{"name": "d", "size": 2}],
        |     "coordinates": ["ghost"]}
        |  ]
        |}""".stripMargin))
  }

  test("dtype widening policy (SURVEY §1.2)") {
    assert(MdioSpec.sparkType("uint8") == ShortType)
    assert(MdioSpec.sparkType("uint16") == IntegerType)
    assert(MdioSpec.sparkType("uint32") == LongType)
    assert(MdioSpec.sparkType("uint64") == DecimalType(20, 0))
    assert(MdioSpec.sparkType("float16") == FloatType)
    assert(MdioSpec.sparkType("complex64").isInstanceOf[StructType])
    intercept[IllegalArgumentException](MdioSpec.sparkType("float128"))
  }

  test("fill values match mdio-python parity (floats NaN, ints max)") {
    assert(MdioSpec.fillValue("float32").asInstanceOf[Float].isNaN)
    assert(MdioSpec.fillValue("int32") == Int.MaxValue)
    assert(MdioSpec.fillValue("uint16") == 65535)
    assert(MdioSpec.fillValue("bool") == false)
  }

  test("unitsV1 parses all schema forms and validates the vocabulary (F6)") {
    import org.json4s.jackson.JsonMethods
    // object form (the schema's unit models)
    assert(UnitsV1.parse(JsonMethods.parse("""{"length": "m"}""")) == Seq("length" -> "m"))
    // array-of-objects and bare-string forms (mdio/stats.h:450-470)
    assert(UnitsV1.parse(JsonMethods.parse("""[{"length": "ft"}, {"time": "ms"}]"""))
      == Seq("length" -> "ft", "time" -> "ms"))
    assert(UnitsV1.parse(JsonMethods.parse(""""m/s"""")) == Seq("" -> "m/s"))
    // vocabulary enforcement (mdio/impl.h:78-118)
    UnitsV1.validate(Seq("speed" -> "ft/s", "voltage" -> "mV"), "t")
    intercept[IllegalArgumentException](UnitsV1.validate(Seq("length" -> "furlong"), "t"))
    intercept[IllegalArgumentException](UnitsV1.validate(Seq("sound" -> "dB"), "t"))
  }

  test("unitsV1 round-trips through a spec variable and fails validation when bad") {
    val withUnits = good.replace(
      """"metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 3]}}}""",
      """"metadata": {"chunkGrid": {"name": "regular", "configuration": {"chunkShape": [2, 3]}},
        | "unitsV1": {"length": "m"}}""".stripMargin)
    assert(MdioSpec.fromJson(withUnits).variable("image").units == Seq("length" -> "m"))
    val badUnits = withUnits.replace(""""length": "m"""", """"length": "parsec"""")
    intercept[IllegalArgumentException](MdioSpec.fromJson(badUnits))
  }

  test("rectilinear chunk grids rejected (schema-defined, not realizable)") {
    val rect = good.replace(""""chunkGrid": {"name": "regular"""",
      """"chunkGrid": {"name": "rectilinear"""")
    val e = intercept[IllegalArgumentException](MdioSpec.fromJson(rect))
    assert(e.getMessage.contains("rectilinear"))
  }

  test("blosc compressor object shape validated (dataset_factory.h:288-367)") {
    def withComp(comp: String) = good.replace(
      """"coordinates": ["cdp-x"],""",
      s""""coordinates": ["cdp-x"], "compressor": $comp,""")
    // reference aliases + defaults resolve
    val v = MdioSpec.fromJson(withComp("""{"name": "blosc"}""")).variable("image")
    assert(v.blosc.contains(graft.zarr.ChunkCodec.Blosc("lz4", 5, 1)))
    // the full BloscCname enum resolves (blosclz and snappy included)
    for (cname <- Seq("lz4", "lz4hc", "blosclz", "snappy", "zlib", "zstd"))
      assert(MdioSpec.fromJson(withComp(s"""{"name": "blosc", "cname": "$cname"}"""))
        .variable("image").blosc.exists(_.cname == cname))
    // the whole BloscShuffle enum resolves, bitshuffle included (r07)
    assert(MdioSpec.fromJson(withComp("""{"name": "blosc", "shuffle": "bitshuffle"}"""))
      .variable("image").blosc.exists(_.shuffle == 2))
    assert(MdioSpec.fromJson(withComp("""{"name": "blosc", "shuffle": "noshuffle"}"""))
      .variable("image").blosc.exists(_.shuffle == 0))
    // clevel out of range / unknown cname / out-of-enum shuffle reject
    intercept[IllegalArgumentException](
      MdioSpec.fromJson(withComp("""{"name": "blosc", "clevel": 12}""")))
    intercept[IllegalArgumentException](
      MdioSpec.fromJson(withComp("""{"name": "blosc", "cname": "lzma"}""")))
    intercept[IllegalArgumentException](
      MdioSpec.fromJson(withComp("""{"name": "blosc", "shuffle": 3}""")))
  }
}
