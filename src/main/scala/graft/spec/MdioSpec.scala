package graft.spec

import org.apache.spark.sql.types._
import org.json4s._
import org.json4s.jackson.JsonMethods

/** MDIO v1 dataset-spec model: parse + validate the JSON dataset spec and
  * map it onto Spark types.
  *
  * Mirrors the reference's driver-side metadata layer, re-expressed as plain
  * Scala (no Catalyst involvement — SURVEY.md §1.3, §7.2 M0):
  *  - required dataset metadata `name`/`apiVersion`/`createdOn`
  *    (mdio/dataset_schema.h:368-372) and per-variable
  *    `name`/`dataType`/`dimensions` (mdio/dataset_schema.h:880-884);
  *  - dimension-size consistency across variables
  *    (mdio/dataset_factory.h:676-701 get_dimensions);
  *  - every referenced dimension needs a same-named 1-D dimension-coordinate
  *    variable (mdio/dataset_validator.h:135-197);
  *  - v0 specs rejected (mdio/dataset.h:1047-1055);
  *  - dtype → Spark type widening policy (SURVEY §1.2): Spark has no
  *    unsigned/half types, so u8/u16/u32 widen to the next signed type,
  *    u64 → decimal(20,0), float16 → float; complex → struct(re, im);
  *  - per-dtype fill values match mdio-python (mdio/dataset_factory.h:500-545):
  *    floats → NaN, signed ints → type max, bool → false.
  */
object MdioSpec {

  final case class Dimension(name: String, size: Long)

  final case class Variable(
      name: String,
      dataType: String,
      dimensions: Seq[Dimension],
      longName: Option[String] = None,
      chunkShape: Option[Seq[Long]] = None,   // default: whole shape, one chunk
      compressor: Option[String] = None,      // None | blosc | zlib | zstd | lz4
      coordinates: Seq[String] = Nil,
      metadata: Option[JValue] = None,
      /** cname/clevel/shuffle when compressor == Some("blosc") — the only
        * compressor the reference's spec layer accepts
        * (mdio/dataset_factory.h:288-367). */
      blosc: Option[graft.zarr.ChunkCodec.Blosc] = None,
      /** zarr v3 sharding_indexed shard shape (beyond-reference scale
        * extension; must be a multiple of chunkShape). */
      shardShape: Option[Seq[Long]] = None) {
    /** Typed unitsV1 pairs (F6): validated against the reference
      * vocabulary (mdio/impl.h:78-118) on access and in [[validate]]. */
    def units: Seq[(String, String)] = UnitsV1.fromMetadata(metadata, s"variable '$name'")
    def shape: Seq[Long] = dimensions.map(_.size)
    def chunks: Seq[Long] = chunkShape.getOrElse(shape)
    def isDimensionCoordinate: Boolean =
      dimensions.size == 1 && dimensions.head.name == name
  }

  final case class Dataset(
      name: String,
      apiVersion: Long,
      createdOn: String,
      variables: Seq[Variable],
      attributes: Option[JValue] = None) {

    /** label -> size, validated consistent. */
    def dimensions: Map[String, Long] =
      variables.flatMap(_.dimensions).map(d => d.name -> d.size).toMap

    def variable(name: String): Variable =
      variables.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(s"no variable '$name'"))

    /** Data variables = non-coordinate, non-1-D-dim-coordinate variables. */
    def dataVariables: Seq[Variable] = {
      val coordNames = variables.flatMap(_.coordinates).toSet
      variables.filterNot(v => v.isDimensionCoordinate || coordNames.contains(v.name))
    }
  }

  /** Spark type for an MDIO dtype (widening policy, SURVEY §1.2). */
  def sparkType(dtype: String): DataType = dtype match {
    case "bool"    => BooleanType
    case "int8"    => ByteType
    case "int16"   => ShortType
    case "int32"   => IntegerType
    case "int64"   => LongType
    case "uint8"   => ShortType
    case "uint16"  => IntegerType
    case "uint32"  => LongType
    case "uint64"  => DecimalType(20, 0)
    case "float16" => FloatType
    case "float32" => FloatType
    case "float64" => DoubleType
    case "complex64"  => StructType(Seq(StructField("re", FloatType), StructField("im", FloatType)))
    case "complex128" => StructType(Seq(StructField("re", DoubleType), StructField("im", DoubleType)))
    case other => throw new IllegalArgumentException(s"unsupported dtype '$other'")
  }

  /** Zarr v2 numpy typestring for an MDIO dtype. */
  def zarrDtype(dtype: String): String = dtype match {
    case "bool"   => "|b1"
    case "int8"   => "|i1"
    case "int16"  => "<i2"
    case "int32"  => "<i4"
    case "int64"  => "<i8"
    case "uint8"  => "|u1"
    case "uint16" => "<u2"
    case "uint32" => "<u4"
    case "uint64" => "<u8"
    case "float16" => "<f2"
    case "float32" => "<f4"
    case "float64" => "<f8"
    case "complex64"  => "<c8"
    case "complex128" => "<c16"
    case other => throw new IllegalArgumentException(s"no zarr dtype for '$other'")
  }

  /** Fill value per dtype (mdio-python parity, mdio/dataset_factory.h:500-545):
    * floats NaN, signed ints type max, unsigned type max, bool false. */
  def fillValue(dtype: String): Any = dtype match {
    case "bool"    => false
    case "int8"    => Byte.MaxValue
    case "int16"   => Short.MaxValue
    case "int32"   => Int.MaxValue
    case "int64"   => Long.MaxValue
    case "uint8"   => 255.toShort
    case "uint16"  => 65535
    case "uint32"  => 4294967295L
    case "uint64"  => BigDecimal("18446744073709551615")
    case "float16" | "float32" => Float.NaN
    case "float64" => Double.NaN
    case "complex64" | "complex128" => Double.NaN // [NaN, NaN] per component
    case other => throw new IllegalArgumentException(s"no fill value for '$other'")
  }

  /** Parse + validate a dataset spec (throws IllegalArgumentException with
    * the reference's failure modes). */
  def fromJson(json: String): Dataset = {
    implicit val fmts: Formats = DefaultFormats
    val root = JsonMethods.parse(json)

    val meta = root \ "metadata"
    def req(j: JValue, field: String, where: String): JValue = j \ field match {
      case JNothing => throw new IllegalArgumentException(s"$where: missing required field '$field'")
      case v => v
    }
    val name = req(meta, "name", "metadata").extract[String]
    val api = req(meta, "apiVersion", "metadata") match {
      case JString(s) => s.stripPrefix("v").takeWhile(_.isDigit) match {
        case "" => throw new IllegalArgumentException(s"bad apiVersion '$s'")
        case d  => d.toLong
      }
      case JInt(i) => i.toLong
      case other => throw new IllegalArgumentException(s"bad apiVersion $other")
    }
    if (api < 1)
      throw new IllegalArgumentException(
        s"apiVersion $api not supported (v0 datasets rejected, reference mdio/dataset.h:1047-1055)")
    val createdOn = req(meta, "createdOn", "metadata").extract[String]

    val vars = (root \ "variables") match {
      case JArray(items) => items.map(parseVariable)
      case _ => throw new IllegalArgumentException("spec needs a 'variables' array")
    }

    val ds = Dataset(name, api, createdOn, vars, (meta \ "attributes").toOption)
    validate(ds)
    ds
  }

  private def parseVariable(j: JValue)(implicit fmts: Formats): Variable = {
    def req(field: String): JValue = j \ field match {
      case JNothing => throw new IllegalArgumentException(s"variable: missing required field '$field'")
      case v => v
    }
    val name = req("name").extract[String]
    val dataType = req("dataType").extract[String]
    sparkType(dataType) // fail fast on unknown dtypes
    val dims = req("dimensions") match {
      case JArray(items) => items.map {
        case JObject(fields) =>
          val m = fields.toMap
          Dimension(m("name").extract[String], m("size").extract[Long])
        case other => throw new IllegalArgumentException(s"bad dimension $other")
      }
      case other => throw new IllegalArgumentException(s"bad dimensions $other")
    }
    // only regular chunk grids are realizable: the schema also defines
    // RectilinearChunkGrid (mdio/dataset_schema.h:538-557) but the engine's
    // chunked storage (like the reference's zarr driver) has uniform chunks
    (j \ "metadata" \ "chunkGrid" \ "name") match {
      case JString(grid) if grid != "regular" =>
        throw new IllegalArgumentException(
          s"variable '$name': chunkGrid '$grid' unsupported (only 'regular'; " +
            "rectilinear grids are schema-defined but not realizable in zarr)")
      case _ => ()
    }
    val chunks = (j \ "metadata" \ "chunkGrid" \ "configuration" \ "chunkShape") match {
      case JArray(items) => Some(items.map(_.extract[Long]))
      case _ => None
    }
    chunks.foreach { c =>
      require(c.size == dims.size, s"variable '$name': chunkShape rank ${c.size} != ${dims.size}")
      require(c.forall(_ > 0), s"variable '$name': chunkShape must be positive")
    }
    // beyond-reference extension: zarr v3 sharding_indexed — shardShape
    // groups inner chunks into shard objects (must be a chunk multiple)
    val shardShape = (j \ "metadata" \ "chunkGrid" \ "configuration" \ "shardShape") match {
      case JArray(items) => Some(items.map(_.extract[Long]))
      case _ => None
    }
    shardShape.foreach { sh =>
      val c = chunks.getOrElse(throw new IllegalArgumentException(
        s"variable '$name': shardShape requires an explicit chunkShape"))
      require(sh.size == dims.size, s"variable '$name': shardShape rank ${sh.size} != ${dims.size}")
      require(sh.zip(c).forall { case (a, b) => a > 0 && a % b == 0 },
        s"variable '$name': shardShape must be a positive multiple of chunkShape")
    }
    val compressor = (j \ "compressor" \ "name").toOption.map(_.extract[String])
    // Blosc settings, with the reference's aliases and defaults
    // (mdio/dataset_factory.h: "cname"/"algorithm", "clevel"/"level",
    //  shuffle as string enum or legacy int; defaults lz4/5/shuffle)
    val blosc = compressor.filter(_ == "blosc").map { _ =>
      val c = j \ "compressor"
      val cname = (c \ "cname").toOption.orElse((c \ "algorithm").toOption)
        .map(_.extract[String]).getOrElse("lz4")
      val clevel = (c \ "clevel").toOption.orElse((c \ "level").toOption)
        .map(_.extract[Int]).getOrElse(5)
      require(clevel >= 0 && clevel <= 9,
        s"variable '$name': compressor level must be between 0 and 9, got $clevel")
      val shuffle = (c \ "shuffle") match {
        case JString("noshuffle") => 0
        case JString("bitshuffle") => 2
        case JString(_) => 1
        case JInt(i) => i.toInt
        case _ => 1
      }
      // full BloscCname enum (mdio/dataset_schema.h:145-152)
      require(Set("lz4", "lz4hc", "blosclz", "snappy", "zlib", "zstd").contains(cname),
        s"variable '$name': blosc cname '$cname' unsupported " +
          "(lz4/lz4hc/blosclz/snappy/zlib/zstd)")
      // full shuffle enum accepted: 0 none / 1 byte / 2 bit (the
      // reference's BloscShuffle matrix, mdio/dataset_schema.h:145-165)
      require(shuffle >= 0 && shuffle <= 2,
        s"variable '$name': blosc shuffle must be noshuffle|shuffle|bitshuffle, got $shuffle")
      graft.zarr.ChunkCodec.Blosc(cname, clevel, shuffle)
    }
    val coords = (j \ "coordinates") match {
      case JArray(items) => items.map(_.extract[String])
      case JString(s) => s.split("\\s+").toSeq.filter(_.nonEmpty) // space-separated form
      case _ => Nil
    }
    Variable(name, dataType, dims,
      longName = (j \ "longName").toOption.map(_.extract[String]),
      chunkShape = chunks, compressor = compressor, coordinates = coords,
      metadata = (j \ "metadata").toOption, blosc = blosc, shardShape = shardShape)
  }

  /** Structural validation (reference validate_dataset,
    * mdio/dataset_validator.h:208-220). */
  def validate(ds: Dataset): Unit = {
    require(ds.variables.nonEmpty, "dataset needs at least one variable")
    val dupNames = ds.variables.groupBy(_.name).filter(_._2.size > 1).keys
    require(dupNames.isEmpty, s"duplicate variable names: ${dupNames.mkString(", ")}")

    // dimension-size consistency (mdio/dataset_factory.h:676-701)
    ds.variables.flatMap(_.dimensions).groupBy(_.name).foreach { case (label, ds2) =>
      val sizes = ds2.map(_.size).distinct
      require(sizes.size == 1,
        s"dimension '$label' has conflicting sizes ${sizes.mkString(", ")}")
    }

    // every referenced dimension needs a same-named 1-D coordinate variable
    // (mdio/dataset_validator.h:135-197)
    val dimCoords = ds.variables.filter(_.isDimensionCoordinate).map(_.name).toSet
    val referenced = ds.variables.filterNot(_.isDimensionCoordinate)
      .flatMap(_.dimensions.map(_.name)).toSet
    val missing = referenced -- dimCoords
    require(missing.isEmpty,
      s"dimensions without a dimension-coordinate variable: ${missing.mkString(", ")}")

    // listed coordinates must exist (mdio/dataset_validator.h coordinate check)
    val names = ds.variables.map(_.name).toSet
    ds.variables.foreach { v =>
      val bad = v.coordinates.filterNot(names.contains)
      require(bad.isEmpty, s"variable '${v.name}' lists unknown coordinates: ${bad.mkString(", ")}")
    }

    // unitsV1 vocabulary (F6, mdio/dataset_schema.h unit models)
    ds.variables.foreach(_.units)
  }
}
