package graft.sources.v2

import java.util

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, SupportsTruncate, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, IsNotNull}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.sources.Xlsx

/** XLSX workbooks as a full DataSource V2 — the reference's R1 dim-table
  * ingest (`RSS PARSER/gcp_rss.py:24-28`, `pd.read_excel`) promoted to
  * the catalog-integration rung of the engine's Catalyst extension
  * ladder (custom `Expression`,
  * `TypedImperativeAggregate`, `LogicalPlan`+`Strategy`+`SparkPlan`,
  * optimizer `Rule`, and now `TableProvider`):
  *
  *   spark.read.format("graft-xlsx").load(dir)
  *
  * resolved by SHORT NAME through the `DataSourceRegister` service-loader
  * entry (META-INF/services), exactly how parquet/csv register.
  *
  * What V2 buys over the RDD-based `Xlsx.read`:
  *  - **Planner-visible schema**: `inferSchema` reads ONE header row from
  *    the lexicographically-first workbook on the driver; the relation
  *    enters Catalyst with named columns instead of post-hoc casts.
  *  - **Column pruning pushdown**: `SupportsPushDownRequiredColumns`
  *    narrows the reader to the projected columns — `.explain` shows the
  *    pruned ReadSchema, and the reader materializes only those cells.
  *  - **One `InputPartition` per workbook**: file-parallel scheduling is
  *    the planner's (C11 per-file parallelism as scan metadata, not a
  *    hand-rolled `binaryFiles` fan-out).
  *
  * Parsing itself reuses the JDK-only ECMA-376 walk in
  * [[graft.sources.Xlsx]] — zip + StAX, executor-side, no third-party
  * dependency. All cells surface as nullable strings (schema-on-read;
  * callers cast — the house CSV-cleansing convention). Each file's own
  * first row is its header and is skipped; files are assumed
  * column-compatible with the inferred header (the dim-directory
  * contract of the original reader).
  */
class XlsxDataSource extends TableProvider with DataSourceRegister {

  override def shortName(): String = "graft-xlsx"

  override def supportsExternalMetadata(): Boolean = true

  private[v2] def listFilesForScan(path: String): Seq[String] =
    listFiles(path).map(_.toString)

  private def listFiles(path: String): Seq[Path] = {
    val p = new Path(path)
    val fs = p.getFileSystem(HadoopConfs.sessionConf())
    val st = fs.getFileStatus(p)
    val files =
      if (st.isDirectory) fs.listStatus(p).toSeq.filter(_.isFile).map(_.getPath)
      else Seq(p)
    files.filter(f => f.getName.endsWith(".xlsx")).sortBy(_.toString)
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-xlsx: 'path' option required"))
    val first = listFiles(path).headOption.getOrElse(
      throw new IllegalArgumentException(s"graft-xlsx: no .xlsx files under $path"))
    val fs = first.getFileSystem(HadoopConfs.sessionConf())
    val in = fs.open(first)
    val bytes = try in.readAllBytes() finally in.close()
    val header = Xlsx.parseWorkbook(bytes).headOption.getOrElse(
      throw new IllegalArgumentException(s"graft-xlsx: empty workbook $first"))
    StructType(header.map(h => StructField(h, StringType, nullable = true)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new XlsxTable(schema, properties.get("path"), this)
}

/** Session-aware Hadoop configuration plumbing. Driver-side code asks
  * the active session (so `spark.hadoop.*` settings, credentials, and
  * non-default filesystems apply, as the built-in file sources do);
  * executor-side code receives a [[HadoopConfs.SerConf]] snapshot —
  * `Configuration` is Hadoop-`Writable` but not JDK-serializable, so
  * the wrapper bridges it through task serialization. */
private[graft] object HadoopConfs {
  def sessionConf(): Configuration =
    org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      // Bare `new Configuration()` (site-xml defaults only, no
      // spark.hadoop.* overlay) is reachable ONLY with no active session
      // — i.e. outside any query execution, where no session settings
      // exist to lose. Kept deliberately: throwing here would break
      // schema inference from bare-JVM tooling contexts.
      .getOrElse(new Configuration())

  final class SerConf(@transient private var conf: Configuration)
      extends Serializable {
    def value: Configuration = conf
    private def writeObject(out: java.io.ObjectOutputStream): Unit = {
      out.defaultWriteObject()
      conf.write(out)
    }
    private def readObject(in: java.io.ObjectInputStream): Unit = {
      in.defaultReadObject()
      conf = new Configuration(false)
      conf.readFields(in)
    }
  }
}

private[v2] class XlsxTable(schema: StructType, path: String,
                            provider: XlsxDataSource)
    extends Table with SupportsRead with org.apache.spark.sql.connector.catalog.SupportsWrite {
  override def name(): String = s"graft-xlsx:$path"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new XlsxScanBuilder(schema, provider.listFilesForScan(path))
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new XlsxWriteBuilder(info.schema(), path, info.queryId())
}

/** Write half of the V2 table, with job-level atomicity: each task
  * stages one workbook (`part-<pid>-<tid>.xlsx`) into a job-unique
  * SIBLING staging directory (`<path>_staging-<queryId>` — outside the
  * output dir, so readers and the truncate never see half a job), and
  * only `BatchWrite.commit` publishes: it performs the truncate (if
  * requested), renames exactly the files named in the task commit
  * messages into the final directory, and deletes the staging dir —
  * which also sweeps away stragglers from speculative/retried task
  * attempts the driver rejected. `abort` just deletes the staging dir,
  * leaving pre-existing output untouched. Typed values survive:
  * numerics land as numeric cells, everything else through shared
  * strings — so a read-back sees the same schema-on-read strings the
  * reader contract promises. */
private[v2] class XlsxWriteBuilder(schema: StructType, path: String, queryId: String)
    extends WriteBuilder with SupportsTruncate {
  private var doTruncate = false
  override def truncate(): WriteBuilder = { doTruncate = true; this }
  override def build(): Write = new Write {
    override def toBatch: BatchWrite = new BatchWrite {
      private val staging = s"${path}_staging-$queryId"
      override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory = {
        val p = new Path(staging)
        val fs = p.getFileSystem(HadoopConfs.sessionConf())
        fs.mkdirs(p)
        XlsxWriterFactory(schema, staging,
          new HadoopConfs.SerConf(HadoopConfs.sessionConf()))
      }
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val out = new Path(path)
        val fs = out.getFileSystem(HadoopConfs.sessionConf())
        if (doTruncate) {
          if (fs.exists(out)) fs.delete(out, true)
        }
        fs.mkdirs(out)
        messages.foreach { case XlsxCommit(staged) =>
          val src = new Path(staged)
          require(fs.rename(src, new Path(out, src.getName)),
            s"graft-xlsx: publish failed for $staged")
        }
        fs.delete(new Path(staging), true)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        val p = new Path(staging)
        p.getFileSystem(HadoopConfs.sessionConf()).delete(p, true)
      }
    }
  }
}

private[v2] case class XlsxCommit(file: String) extends WriterCommitMessage

private[v2] case class XlsxWriterFactory(schema: StructType, stagingPath: String,
                                         conf: HadoopConfs.SerConf)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
      override def write(row: InternalRow): Unit = {
        val vals = schema.fields.zipWithIndex.map { case (f, i) =>
          if (row.isNullAt(i)) null
          else f.dataType match {
            case org.apache.spark.sql.types.LongType => Long.box(row.getLong(i))
            case org.apache.spark.sql.types.IntegerType => Int.box(row.getInt(i))
            case org.apache.spark.sql.types.DoubleType => Double.box(row.getDouble(i))
            case org.apache.spark.sql.types.BooleanType => row.getBoolean(i).toString
            case StringType => row.getUTF8String(i).toString
            case dt => row.get(i, dt).toString
          }
        }.toSeq
        buf += vals
      }
      override def commit(): WriterCommitMessage = {
        // one workbook per task, staged only at task commit — nothing
        // durable exists for a task that never commits, and the staged
        // file is published solely by the driver's job commit
        val target = s"$stagingPath/part-$partitionId-$taskId.xlsx"
        val local = java.io.File.createTempFile("graft_xlsx_w", ".xlsx")
        Xlsx.write(schema.fieldNames.toSeq, buf.toSeq, local)
        val p = new Path(target)
        val fs = p.getFileSystem(conf.value)
        fs.copyFromLocalFile(true, true, new Path(local.getAbsolutePath), p)
        XlsxCommit(target)
      }
      override def abort(): Unit = ()
      override def close(): Unit = ()
    }
}

private[v2] class XlsxScanBuilder(fullSchema: StructType, files: Seq[String])
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with SupportsPushDownFilters {
  private var required: StructType = fullSchema
  private var pushed: Array[Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Accept string-equality and not-null filters (the dim-lookup shapes)
    * for executor-side row skipping; everything else stays with Spark.
    * Accepted filters are NOT removed from the residual (we return them
    * as still-needing-evaluation) — the reader's skipping is an
    * optimization, Spark's post-filter remains the correctness gate. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter {
      case EqualTo(_, _: String) => true
      case IsNotNull(_) => true
      case _ => false
    }
    filters // all remain Spark-side residuals
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def build(): Scan = new XlsxScan(fullSchema, required, pushed, files)
}

private[v2] class XlsxScan(fullSchema: StructType, required: StructType,
                           pushed: Array[Filter], files: Seq[String])
    extends Scan with Batch with SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"graft-xlsx [${files.length} file(s)] pruned to ${required.fieldNames.mkString(",")}" +
      (if (pushed.nonEmpty) s" pushed [${pushed.mkString(", ")}]" else "")
  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => XlsxInputPartition(f): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    XlsxReaderFactory(fullSchema.fieldNames, required.fieldNames, pushed,
      new HadoopConfs.SerConf(HadoopConfs.sessionConf()))

  /** Workbook byte size on disk — an over-estimate of row-data size
    * (zip + XML markup), which is the SAFE direction for the planner's
    * broadcast decision, and enough for Catalyst to auto-broadcast a
    * small dim without an explicit hint (plan-asserted in XlsxSpec). */
  override def estimateStatistics(): Statistics = new Statistics {
    private val bytes = {
      val conf = HadoopConfs.sessionConf()
      files.map { f =>
        val p = new Path(f)
        p.getFileSystem(conf).getFileStatus(p).getLen
      }.sum
    }
    override def sizeInBytes(): java.util.OptionalLong =
      java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      java.util.OptionalLong.empty()
  }
}

private[graft] case class XlsxInputPartition(file: String) extends InputPartition

/** Executor-side: parse the partition's workbook, skip its header row,
  * apply the pushed row filters, and materialize ONLY the pruned column
  * indices. */
private[graft] case class XlsxReaderFactory(allCols: Array[String],
                                         requiredCols: Array[String],
                                         pushed: Array[Filter],
                                         conf: HadoopConfs.SerConf)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[XlsxInputPartition].file
    new PartitionReader[InternalRow] {
      private val idx: Array[Int] = requiredCols.map(c => allCols.indexOf(c))
      // Pushed filters are optimization-only (Spark keeps the residual):
      // an unresolved attribute MUST degrade to constant-true — a
      // constant-false lambda would silently drop every row, and rows
      // the reader skips cannot be restored by Spark's post-filter.
      private val preds: Array[Vector[String] => Boolean] = pushed.map {
        case EqualTo(att, v: String) =>
          val j = allCols.indexOf(att)
          if (j < 0) (_: Vector[String]) => true
          else cells => j < cells.length && cells(j) == v
        case IsNotNull(att) =>
          val j = allCols.indexOf(att)
          if (j < 0) (_: Vector[String]) => true
          else cells => j < cells.length && cells(j) != null
        case _ => (_: Vector[String]) => true
      }
      private val rows: Iterator[Vector[String]] = {
        val p = new Path(file)
        val fs = p.getFileSystem(conf.value)
        val in = fs.open(p)
        val bytes = try in.readAllBytes() finally in.close()
        Xlsx.parseWorkbook(bytes).iterator.drop(1) // this file's header row
          .filter(cells => preds.forall(_(cells)))
      }
      private var current: InternalRow = _
      override def next(): Boolean =
        if (!rows.hasNext) false
        else {
          val cells = rows.next()
          val vals = new Array[Any](idx.length)
          var i = 0
          while (i < idx.length) {
            val j = idx(i)
            val v = if (j >= 0 && j < cells.length) cells(j) else null
            vals(i) = if (v == null) null else UTF8String.fromString(v)
            i += 1
          }
          current = new GenericInternalRow(vals)
          true
        }
      override def get(): InternalRow = current
      override def close(): Unit = ()
    }
  }
}
