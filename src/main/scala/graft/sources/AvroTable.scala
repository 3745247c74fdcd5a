package graft.sources

import org.apache.avro.{LogicalTypes, Schema => AvroSchema}
import org.apache.avro.file.{CodecFactory, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

import scala.jdk.CollectionConverters._

/** Avro source/sink — the row-interchange format of the Kafka/schema-
  * registry world (where CSV is the spreadsheet boundary and JSONL the
  * log boundary, Avro is what typed event streams land as). Same
  * boundary contract as [[CsvTable]]/[[JsonLines]]: row formats at the
  * pipeline EDGE, parquet inside it.
  *
  * This distribution ships Avro CORE and avro-mapred but not the
  * `spark-avro` module, so the boundary is built directly on the
  * public Avro container API — which is also what makes the scale
  * properties explicit rather than inherited:
  *
  *  - **Write**: one container file per partition, written by the task
  *    through the Hadoop FileSystem API (local/HDFS/object store alike;
  *    nothing funnels through the driver). The Avro schema is derived
  *    from the DataFrame schema ONCE on the driver and shipped as its
  *    canonical JSON string. Snappy-compressed blocks by default:
  *    Avro compresses PER BLOCK inside the container, so compression
  *    never costs splittability (the gzip-CSV trap does not exist
  *    here).
  *  - **Read**: `AvroKeyInputFormat` over the container's sync
  *    markers — files SPLIT at block boundaries, so one huge file
  *    still fans out across tasks (`mapreduce.input
  *    .fileinputformat.split.maxsize` sizes the splits); the writer
  *    schema is read from each file's own header (schema-on-read
  *    without an inference pass — the ORC property, not the CSV one).
  *    Records decode to Rows INSIDE the scan task (GenericRecord
  *    never crosses a shuffle). The declared `StructType` is the
  *    reader's contract: fields are matched BY NAME against the
  *    writer schema, so column order may drift between producers
  *    without corrupting the read.
  *
  * Honest limits (the row-format contract): there is no predicate
  * pushdown or column pruning below the decode — every scan decodes
  * whole records, like CSV/JSONL and unlike parquet/ORC. Supported
  * types: the flat interchange set (long/int/double/float/string/
  * boolean/binary/timestamp-micros/date); nested structs and arrays
  * are out of scope for the boundary — land them as parquet.
  */
object AvroTable {

  /** Spark field → Avro schema (nullable fields become the canonical
    * `union ["null", T]` with a null default). Unsupported types fail
    * at WRITE-PLAN time, never as a mid-job task error. */
  private def avroFieldType(dt: DataType): AvroSchema = dt match {
    case LongType => AvroSchema.create(AvroSchema.Type.LONG)
    case IntegerType => AvroSchema.create(AvroSchema.Type.INT)
    case DoubleType => AvroSchema.create(AvroSchema.Type.DOUBLE)
    case FloatType => AvroSchema.create(AvroSchema.Type.FLOAT)
    case StringType => AvroSchema.create(AvroSchema.Type.STRING)
    case BooleanType => AvroSchema.create(AvroSchema.Type.BOOLEAN)
    case BinaryType => AvroSchema.create(AvroSchema.Type.BYTES)
    case TimestampType => LogicalTypes.timestampMicros()
      .addToSchema(AvroSchema.create(AvroSchema.Type.LONG))
    case DateType => LogicalTypes.date()
      .addToSchema(AvroSchema.create(AvroSchema.Type.INT))
    case other => throw new IllegalArgumentException(
      s"AvroTable: unsupported type $other — the Avro boundary " +
        "carries the flat interchange set (long/int/double/float/" +
        "string/boolean/binary/timestamp/date); land nested data as " +
        "parquet")
  }

  private def avroSchemaFor(schema: StructType): AvroSchema = {
    val fields = schema.fields.map { f =>
      val base = avroFieldType(f.dataType)
      val t =
        if (!f.nullable) base
        else AvroSchema.createUnion(
          AvroSchema.create(AvroSchema.Type.NULL), base)
      new AvroSchema.Field(f.name, t, null,
        if (f.nullable) AvroSchema.Field.NULL_DEFAULT_VALUE else null)
    }
    AvroSchema.createRecord("row", null, "graft", false,
      fields.toSeq.asJava)
  }

  /** java.sql.Timestamp → microseconds since epoch (exact; floor
    * semantics for pre-epoch instants). */
  private def toMicros(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  private def fromMicros(us: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Write `df` as Avro container files under `path` (one
    * `part-NNNNN.avro` per non-empty partition, snappy block codec).
    * Overwrites `path`. */
  def write(df: DataFrame, path: String,
      codec: String = "snappy"): Unit = {
    val spark = df.sparkSession
    val schema = df.schema
    val avroJson = avroSchemaFor(schema).toString
    val root = new org.apache.hadoop.fs.Path(path)
    val fs0 = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs0.delete(root, true)
    fs0.mkdirs(root)
    df.foreachPartition { (it: Iterator[Row]) =>
      if (it.hasNext) {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        val avro = new AvroSchema.Parser().parse(avroJson)
        // default task-side conf, the writeBlobFiles convention
        val fs = new org.apache.hadoop.fs.Path(path)
          .getFileSystem(new org.apache.hadoop.conf.Configuration())
        val out = fs.create(new org.apache.hadoop.fs.Path(path,
          f"part-$pid%05d.avro"), true)
        val w = new DataFileWriter(new GenericDatumWriter[GenericRecord](avro))
        w.setCodec(CodecFactory.fromString(codec))
        w.create(avro, out)
        try {
          it.foreach { row =>
            val rec = new GenericData.Record(avro)
            var i = 0
            while (i < schema.length) {
              val v =
                if (row.isNullAt(i)) null
                else schema(i).dataType match {
                  case TimestampType => Long.box(toMicros(
                    row.getAs[java.sql.Timestamp](i)))
                  case DateType => Int.box(
                    row.getAs[java.sql.Date](i).toLocalDate.toEpochDay.toInt)
                  case BinaryType => java.nio.ByteBuffer.wrap(
                    row.getAs[Array[Byte]](i))
                  case _ => row.get(i).asInstanceOf[AnyRef]
                }
              rec.put(i, v)
              i += 1
            }
            w.append(rec)
          }
        } finally w.close() // closes the FS stream too
      }
    }
  }

  /** Read Avro container files under `path` into `schema` (fields
    * matched BY NAME against each file's writer schema; a declared
    * field the writer lacks reads as null). Splittable at block sync
    * markers via `AvroKeyInputFormat`. */
  def read(spark: SparkSession, path: String, schema: StructType)
      : DataFrame = {
    import org.apache.avro.mapred.AvroKey
    import org.apache.avro.mapreduce.AvroKeyInputFormat
    import org.apache.hadoop.io.NullWritable
    val conf = spark.sessionState.newHadoopConf()
    val rdd = spark.sparkContext.newAPIHadoopFile(
      new org.apache.hadoop.fs.Path(path, "*.avro").toString,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable],
      conf)
    val fields = schema.fields
    // decode to Row in the SCAN task — GenericRecord never leaves it
    val rows = rdd.mapPartitions(_.map { case (k, _) =>
      val rec = k.datum()
      val vals = new Array[Any](fields.length)
      var i = 0
      while (i < fields.length) {
        val raw =
          if (rec.getSchema.getField(fields(i).name) == null) null
          else rec.get(fields(i).name)
        vals(i) =
          if (raw == null) null
          else fields(i).dataType match {
            case StringType => raw.toString // Utf8 → String
            case TimestampType => fromMicros(raw.asInstanceOf[Long])
            case DateType => java.sql.Date.valueOf(
              java.time.LocalDate.ofEpochDay(raw.asInstanceOf[Int].toLong))
            case BinaryType =>
              val bb = raw.asInstanceOf[java.nio.ByteBuffer]
              val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a); a
            case _ => raw
          }
        i += 1
      }
      Row.fromSeq(vals.toIndexedSeq)
    })
    spark.createDataFrame(rows, schema)
  }
}
