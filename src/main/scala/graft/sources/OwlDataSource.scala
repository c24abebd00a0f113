package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * DataSourceV2 connector for OWL/RDF XML: `spark.read.format("owl")
 * .load(path)` (registered as `owl` via DataSourceRegister) — the
 * catalog-integrated face of [[OwlSource]]. One input partition per file,
 * StAX streaming inside the partition reader, so a directory of ontology
 * dumps parallelizes file-per-task with flat memory, and the scan
 * composes with every V2 feature the engine doesn't hand-roll (column
 * pruning happens post-scan; rows are 5 narrow strings).
 *
 * Output schema: (s, p, o, sKind, oKind) — identical to
 * [[OwlSource.readOwl]] (equivalence is spec-asserted).
 */
class OwlDataSource extends TableProvider
  with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "owl"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    OwlDataSource.SCHEMA

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new OwlTable(Option(properties.get("path")).toSeq ++
      Option(properties.get("paths")).toSeq.flatMap(_.split(",")))
}

object OwlDataSource {
  val SCHEMA: StructType = StructType(Seq(
    StructField("s", StringType), StructField("p", StringType),
    StructField("o", StringType), StructField("sKind", StringType),
    StructField("oKind", StringType)))
}

private[sources] class OwlTable(paths: Seq[String]) extends Table with SupportsRead {
  override def name(): String = s"owl(${paths.mkString(",")})"
  override def schema(): StructType = OwlDataSource.SCHEMA
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = OwlDataSource.SCHEMA
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        // driver-side glob resolution with the session's Hadoop conf
        val conf = SparkSession.active.sparkContext.hadoopConfiguration
        paths.flatMap { p =>
          val hp = new Path(p)
          val fs = hp.getFileSystem(conf)
          Option(fs.globStatus(hp)).map(_.toSeq).getOrElse(Nil).flatMap { st =>
            if (st.isDirectory) fs.listStatus(st.getPath).toSeq else Seq(st)
          }
        }.filter(_.isFile)
          .map(st => OwlInputPartition(st.getPath.toString): InputPartition)
          .toArray
      }

      override def createReaderFactory(): PartitionReaderFactory =
        // ship the DRIVER's Hadoop conf to the executors — a blank
        // Configuration would silently drop S3/HDFS credentials and custom
        // FS settings, confining the connector to file:// despite the scan
        // being FS-agnostic everywhere else
        new OwlReaderFactory(new org.apache.spark.util.SerializableConfiguration(
          SparkSession.active.sparkContext.hadoopConfiguration))
    }
}

private[sources] case class OwlInputPartition(file: String) extends InputPartition

private[sources] class OwlReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration)
  extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[OwlInputPartition].file
    new PartitionReader[InternalRow] {
      private val it: Iterator[OwlSource.RawTriple] = {
        val hp = new Path(file)
        val fs = hp.getFileSystem(conf.value)
        val in = fs.open(hp)
        val bytes =
          try org.apache.hadoop.io.IOUtils.readFullyToByteArray(in)
          finally in.close()
        OwlSource.parseBytes(file, bytes)
      }
      private var current: OwlSource.RawTriple = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow = InternalRow(
        UTF8String.fromString(current.s), UTF8String.fromString(current.p),
        UTF8String.fromString(current.o), UTF8String.fromString(current.sKind),
        UTF8String.fromString(current.oKind))
      override def close(): Unit = ()
    }
  }
}
