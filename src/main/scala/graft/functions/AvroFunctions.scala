package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, DecoderFactory}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import scala.jdk.CollectionConverters._

/** Native Avro binary decode for Kafka value bytes.
  *
  * The Spark distribution in this environment bundles the Avro FILE
  * format but not the spark-avro SQL module (`from_avro` raises
  * AVRO_NOT_LOADED_SQL_FUNCTIONS_UNUSABLE), so the registry-encoded
  * ingest path (reference schemas/avro/trade.avsc:1-42,
  * scripts/register_schemas.py:17-20) gets its own expression built
  * on the plain Avro Java API (avro-1.12.1, on the classpath).
  *
  * Scope: flat records of the primitive types the market contracts
  * use — string, boolean, int, long, float, double, bytes, and
  * arrays/nullable-unions thereof. Nested records are out of scope by
  * design (the reference registers none); the schema parser rejects
  * them up front rather than failing per-row.
  */
case class AvroDecode(child: Expression, schemaJson: String,
                      writerSchemaJson: Option[String] = None)
    extends UnaryExpression with CodegenFallback with Serializable {

  @transient private lazy val schema: Schema =
    new Schema.Parser().parse(schemaJson)

  // Registry-style evolution: when the bytes on the wire were written
  // under a DIFFERENT registered schema version, Avro schema
  // resolution bridges the two — reader fields absent from the writer
  // are filled from their defaults (BACKWARD compat, the mode the
  // reference registers: register_schemas.py:122), writer fields
  // absent from the reader are skipped (FORWARD reads). The output
  // type is always the READER schema's.
  @transient private lazy val writerSchema: Schema =
    writerSchemaJson.map(new Schema.Parser().parse(_)).getOrElse(schema)

  override lazy val dataType: DataType = AvroFunctions.toSqlType(schema)
  override def nullable: Boolean = true
  override def prettyName: String = "avro_decode"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects binary input, got $other")
  }

  // Decoder state is per-thread: expression instances can be shared
  // across partition-evaluating threads in local mode.
  @transient private lazy val local =
    new ThreadLocal[(GenericDatumReader[GenericRecord], Array[BinaryDecoder])] {
      override def initialValue() =
        (new GenericDatumReader[GenericRecord](writerSchema, schema),
          new Array[BinaryDecoder](1))
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    val (reader, decoderHolder) = local.get()
    decoderHolder(0) = DecoderFactory.get().binaryDecoder(bytes, decoderHolder(0))
    val record = reader.read(null, decoderHolder(0))
    AvroFunctions.convert(record, schema).asInstanceOf[InternalRow]
  }

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object AvroFunctions {

  /** Avro schema -> Catalyst type for the supported flat subset.
    * Nested records are rejected HERE, at schema-parse time — the
    * documented flat-contract scope guard, not a per-row failure.
    */
  def toSqlType(s: Schema): DataType = toSqlType(s, top = true)

  private def toSqlType(s: Schema, top: Boolean): DataType = s.getType match {
    case Schema.Type.RECORD if top =>
      StructType(s.getFields.asScala.map { f =>
        StructField(f.name(), toSqlType(f.schema(), top = false),
          nullable = isNullable(f.schema()))
      }.toSeq)
    case Schema.Type.RECORD =>
      throw new IllegalArgumentException(
        s"nested record '${s.getFullName}' unsupported — AvroDecode covers the " +
          "flat market contracts only")
    case Schema.Type.ARRAY => ArrayType(toSqlType(s.getElementType, top = false))
    case Schema.Type.UNION =>
      val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      require(nonNull.size == 1, s"only nullable unions supported, got $s")
      toSqlType(nonNull.head, top = false)
    case Schema.Type.STRING => StringType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BYTES => BinaryType
    case other => throw new IllegalArgumentException(
      s"unsupported Avro type $other (flat market contracts only)")
  }

  private def isNullable(s: Schema): Boolean =
    s.getType == Schema.Type.UNION &&
      s.getTypes.asScala.exists(_.getType == Schema.Type.NULL)

  /** Avro runtime value -> Catalyst value. */
  def convert(value: AnyRef, s: Schema): Any = {
    if (value == null) return null
    s.getType match {
      case Schema.Type.RECORD =>
        val rec = value.asInstanceOf[GenericRecord]
        val fields = s.getFields.asScala
        val row = new GenericInternalRow(fields.size)
        var i = 0
        while (i < fields.size) {
          row.update(i, convert(rec.get(i), fields(i).schema()))
          i += 1
        }
        row
      case Schema.Type.ARRAY =>
        val elemSchema = s.getElementType
        val items = value.asInstanceOf[java.util.Collection[AnyRef]].asScala
        new GenericArrayData(items.map(convert(_, elemSchema)).toArray)
      case Schema.Type.UNION =>
        val nonNull = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
        convert(value, nonNull.head)
      case Schema.Type.STRING => UTF8String.fromString(value.toString)
      case Schema.Type.BYTES => value match {
        case b: java.nio.ByteBuffer =>
          val out = new Array[Byte](b.remaining()); b.duplicate().get(out); out
        case a: Array[Byte] => a
      }
      case _ => value // boolean/int/long/float/double are 1:1
    }
  }

  /** from_avro analog over the bundled Avro runtime. */
  def fromAvro(data: Column, schemaJson: String): Column =
    ColumnBridge.column(AvroDecode(ColumnBridge.expression(data), schemaJson))

  /** Evolution form: decode bytes written under `writerSchemaJson`
    * (an older/newer registered version) into `readerSchemaJson`'s
    * shape via Avro schema resolution — the data-plane half of the
    * registry's BACKWARD-compat contract.
    */
  def fromAvroEvolved(data: Column, readerSchemaJson: String,
                      writerSchemaJson: String): Column =
    ColumnBridge.column(AvroDecode(ColumnBridge.expression(data),
      readerSchemaJson, Some(writerSchemaJson)))
}
