package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.simple.SimpleGroup
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.hadoop.metadata.CompressionCodecName
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{MessageType, PrimitiveType, Type, Types}
import org.apache.parquet.schema.LogicalTypeAnnotation
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types._

/** Driver-side parquet landing for a handful of DRIVER-KNOWN rows —
  * the audit-row shape (`Seq(scalars).toDF.coalesce(1).write`) without
  * the Spark job: a drain's per-batch audit is one row of counts the
  * driver already holds, so scheduling a task, a shuffle-free stage
  * and a committer for it is pure fixed cost (the composed crawl tick
  * pays it five-plus times per tick — VERDICT r18 next #2). Writes one
  * snappy parquet file through parquet-hadoop directly, with the same
  * directory-replace semantics as `SaveMode.Overwrite` on the batch
  * dir: stage under a dot-prefixed temp name (hidden to Spark/DuckDB
  * readers), fs.rename into place, exactly as atomic as the job-based
  * Overwrite it replaces.
  *
  * Scale note: this is for METADATA rows (audits, manifests, single
  * pointers) whose values are already on the driver — never for data
  * planes. Anything row-count-proportional stays a distributed write.
  */
object DriverParquet {

  private def parquetField(f: StructField): Type = {
    val b = f.dataType match {
      case LongType    => Types.optional(PrimitiveTypeName.INT64)
      case IntegerType => Types.optional(PrimitiveTypeName.INT32)
        .as(LogicalTypeAnnotation.intType(32, true))
      case DoubleType  => Types.optional(PrimitiveTypeName.DOUBLE)
      case BooleanType => Types.optional(PrimitiveTypeName.BOOLEAN)
      case StringType  => Types.optional(PrimitiveTypeName.BINARY)
        .as(LogicalTypeAnnotation.stringType())
      case other => throw new IllegalArgumentException(
        s"DriverParquet: unsupported column type $other for '${f.name}'")
    }
    b.named(f.name)
  }

  /** Replace directory `dir` with one parquet file holding `rows`
    * (each row a Seq of values in `schema` field order; nulls allowed).
    */
  def overwriteRows(spark: SparkSession, dir: String, schema: StructType,
      rows: Seq[Seq[Any]]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new Path(dir)
    val fs = target.getFileSystem(conf)
    val parent = target.getParent
    fs.mkdirs(parent)
    // stage the finished directory beside the target, then swap — a
    // reader never sees a half-written dir, and a crash leaves only a
    // dot-prefixed orphan the next overwrite deletes
    val stg = new Path(parent, s".${target.getName}.dpq.stg")
    fs.delete(stg, true)
    fs.mkdirs(stg)
    val msg: MessageType = new MessageType("spark_schema",
      schema.fields.map(parquetField): _*)
    val file = new Path(stg, "part-00000.snappy.parquet")
    val writer = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(file, conf))
      .withConf(conf)
      .withType(msg)
      .withCompressionCodec(CompressionCodecName.SNAPPY)
      .build()
    try rows.foreach { row =>
      require(row.size == schema.size,
        s"DriverParquet: row arity ${row.size} != schema ${schema.size}")
      val g = new SimpleGroup(msg)
      schema.fields.zip(row).foreach { case (f, v) =>
        if (v != null) f.dataType match {
          case LongType    => g.add(f.name, v.asInstanceOf[Number].longValue)
          case IntegerType => g.add(f.name, v.asInstanceOf[Number].intValue)
          case DoubleType  => g.add(f.name, v.asInstanceOf[Number].doubleValue)
          case BooleanType => g.add(f.name, v.asInstanceOf[Boolean])
          case StringType  => g.add(f.name, v.toString)
          case other => throw new IllegalArgumentException(
            s"DriverParquet: unsupported $other")
        }
      }
      writer.write(g)
    } finally writer.close()
    fs.delete(target, true)
    if (!fs.rename(stg, target))
      throw new java.io.IOException(
        s"DriverParquet: cannot promote $stg to $target")
  }

  /** Read a tiny parquet directory's rows on the DRIVER (no Spark
    * job) — the probe side of [[overwriteRows]]: a replay guard that
    * needs one stored audit row must not pay a scheduler round-trip
    * for it. Returns field-name → value maps (absent/null fields
    * omitted); empty when the directory is missing. For METADATA
    * directories only — row-count-proportional data stays on the
    * distributed read path.
    */
  def readRows(spark: SparkSession, dir: String): Seq[Map[String, Any]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    if (!fs.exists(d)) return Seq.empty
    val parts = fs.listStatus(d).filter { st =>
      val n = st.getPath.getName
      st.isFile && !n.startsWith(".") && !n.startsWith("_") &&
        st.getLen > 0
    }.map(_.getPath).sortBy(_.getName)
    val out = scala.collection.mutable.ArrayBuffer[Map[String, Any]]()
    parts.foreach { p =>
      val reader = org.apache.parquet.hadoop.ParquetReader
        .builder(new org.apache.parquet.hadoop.example.GroupReadSupport(), p)
        .withConf(conf).build()
      try {
        var g = reader.read()
        while (g != null) {
          val schema = g.getType
          val row = (0 until schema.getFieldCount).flatMap { i =>
            val f = schema.getType(i)
            val name = f.getName
            if (g.getFieldRepetitionCount(i) == 0) None
            else {
              val prim = f.asPrimitiveType().getPrimitiveTypeName
              val v: Any = prim match {
                case PrimitiveTypeName.INT64   => g.getLong(i, 0)
                case PrimitiveTypeName.INT32   => g.getInteger(i, 0)
                case PrimitiveTypeName.DOUBLE  => g.getDouble(i, 0)
                case PrimitiveTypeName.BOOLEAN => g.getBoolean(i, 0)
                case PrimitiveTypeName.BINARY  => g.getString(i, 0)
                case other => throw new IllegalArgumentException(
                  s"DriverParquet.readRows: unsupported $other for '$name'")
              }
              Some(name -> v)
            }
          }.toMap
          out += row
          g = reader.read()
        }
      } finally reader.close()
    }
    out.toSeq
  }
}
