package graft.zarr

import org.json4s._
import org.json4s.jackson.JsonMethods
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Zarr v2 on-disk metadata: `.zgroup`, `.zarray`, `.zattrs`, consolidated
  * `.zmetadata` — the same layout the reference writes
  * (mdio/zarr/zarr_v2.h:221-367 WriteDatasetMetadata, GetZarray at 67-97)
  * re-expressed as plain-JVM file I/O. Storage drivers: local paths here;
  * `s3a://`/`gs://` URIs go through Hadoop FS in the connector (free in
  * Spark — SURVEY §2.1 S7).
  */
object ZarrMeta {

  final case class ArrayMeta(
      shape: Seq[Long],
      chunks: Seq[Long],
      dtype: String,                       // numpy typestring, e.g. "<f4"
      compressor: Option[String],          // None | "zlib" | "zstd" | "lz4"
      fillValue: Option[Double],
      order: String = "C") {
    def rank: Int = shape.size
    /** Number of chunks along each dimension. */
    def chunkGrid: Seq[Long] = shape.zip(chunks).map { case (s, c) => (s + c - 1) / c }
    def elemSize: Int = ChunkCodec.elemSize(dtype)
  }

  private implicit val fmts: Formats = DefaultFormats

  def renderArrayMeta(m: ArrayMeta): String = {
    val comp = m.compressor match {
      case None => "null"
      case Some(id) => s"""{"id": "$id"}"""
    }
    val fill = m.fillValue match {
      case None => "null"
      case Some(f) if f.isNaN => "\"NaN\""
      case Some(f) if f == f.floor && !f.isInfinite && math.abs(f) < 1e15 => f.toLong.toString
      case Some(f) => f.toString
    }
    s"""{
       |  "zarr_format": 2,
       |  "shape": [${m.shape.mkString(", ")}],
       |  "chunks": [${m.chunks.mkString(", ")}],
       |  "dtype": "${m.dtype}",
       |  "compressor": $comp,
       |  "fill_value": $fill,
       |  "order": "${m.order}",
       |  "filters": null
       |}""".stripMargin
  }

  def parseArrayMeta(json: String): ArrayMeta = {
    val j = JsonMethods.parse(json)
    val shape = (j \ "shape").extract[Seq[Long]]
    val chunks = (j \ "chunks").extract[Seq[Long]]
    val dtype = (j \ "dtype").extract[String]
    val comp = (j \ "compressor") match {
      case JNull | JNothing => None
      case obj => Some((obj \ "id").extract[String])
    }
    val fill = (j \ "fill_value") match {
      case JNull | JNothing => None
      case JString("NaN") => Some(Double.NaN)
      case JString("Infinity") => Some(Double.PositiveInfinity)
      case JString("-Infinity") => Some(Double.NegativeInfinity)
      case JDouble(d) => Some(d)
      case JInt(i) => Some(i.toDouble)
      case JLong(l) => Some(l.toDouble)
      case JBool(b) => Some(if (b) 1.0 else 0.0)
      case _ => None
    }
    val order = (j \ "order").extractOrElse[String]("C")
    ArrayMeta(shape, chunks, dtype, comp, fill, order)
  }

  /** Chunk file key, C-order: "0.0", "1.2", … (zarr v2 default separator). */
  def chunkKey(coords: Seq[Long]): String = coords.mkString(".")

  // ---- local-filesystem group I/O ------------------------------------------

  def writeGroup(root: Path, attrs: Option[String]): Unit = {
    Files.createDirectories(root)
    Files.writeString(root.resolve(".zgroup"), """{"zarr_format": 2}""")
    attrs.foreach(a => Files.writeString(root.resolve(".zattrs"), a))
  }

  def writeArray(root: Path, name: String, meta: ArrayMeta, attrs: Option[String]): Unit = {
    val dir = root.resolve(name)
    Files.createDirectories(dir)
    Files.writeString(dir.resolve(".zarray"), renderArrayMeta(meta))
    attrs.foreach(a => Files.writeString(dir.resolve(".zattrs"), a))
  }

  /** Consolidated metadata (.zmetadata): every .zgroup/.zarray/.zattrs under
    * the root, exactly the keys zarr-python consolidates. */
  def consolidate(root: Path): Unit = {
    val keys = Files.walk(root).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .map(p => root.relativize(p).toString.replace('\\', '/'))
      .filter(k => k.endsWith(".zgroup") || k.endsWith(".zarray") || k.endsWith(".zattrs"))
      .toSeq.sorted
    val entries = keys.map { k =>
      val v = Files.readString(root.resolve(k))
      s""""$k": ${v.trim}"""
    }
    val body = entries.mkString(",\n    ")
    Files.writeString(root.resolve(".zmetadata"),
      s"""{
         |  "zarr_consolidated_format": 1,
         |  "metadata": {
         |    $body
         |  }
         |}""".stripMargin)
  }

  /** Read consolidated metadata if present; else discover arrays by listing
    * (the reference's v2-consolidated vs v3-listing duality,
    * mdio/zarr/zarr_v2.h:467-489 / zarr_v3.h:638-653). Returns
    * (groupAttrs, arrayName -> (meta, attrs)). */
  def readGroup(root: Path): (Option[String], Map[String, (ArrayMeta, Option[String])]) = {
    val zmeta = root.resolve(".zmetadata")
    if (Files.exists(zmeta)) {
      val j = JsonMethods.parse(Files.readString(zmeta))
      val entries = (j \ "metadata") match {
        case JObject(fields) => fields.toMap
        case _ => Map.empty[String, JValue]
      }
      val groupAttrs = entries.get(".zattrs").map(JsonMethods.compact)
      val arrays = entries.keys.filter(_.endsWith("/.zarray")).map { k =>
        val name = k.stripSuffix("/.zarray")
        val meta = parseArrayMeta(JsonMethods.compact(entries(k)))
        val attrs = entries.get(s"$name/.zattrs").map(JsonMethods.compact)
        name -> (meta, attrs)
      }.toMap
      (groupAttrs, arrays)
    } else {
      val groupAttrs = {
        val p = root.resolve(".zattrs")
        if (Files.exists(p)) Some(Files.readString(p)) else None
      }
      val arrays = Files.list(root).iterator().asScala
        .filter(p => Files.isDirectory(p) && Files.exists(p.resolve(".zarray")))
        .map { dir =>
          val meta = parseArrayMeta(Files.readString(dir.resolve(".zarray")))
          val ap = dir.resolve(".zattrs")
          val attrs = if (Files.exists(ap)) Some(Files.readString(ap)) else None
          dir.getFileName.toString -> (meta, attrs)
        }.toMap
      (groupAttrs, arrays)
    }
  }

  def path(s: String): Path = Paths.get(s)
}
