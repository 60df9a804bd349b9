package graft.zarr

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}
import java.util
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 source for the graft chunk store (SURVEY S4, the
  * "metadata-first read" the reference builds GTIs for — mosaics.py:33-39):
  *
  * {{{ spark.read.format("graft.zarr.ChunkStoreSource").load(root) }}}
  *
  * The chunk grid IS the manifest: keys (time, band, cy, cx) are encoded in
  * file names, so `SupportsPushDownFilters` prunes the file list at PLAN
  * time from key predicates — a region slice reads exactly its chunks,
  * nothing else, and `.explain` shows `PushedFilters` on the scan. Payload
  * bytes are only touched by executors, split into one InputPartition per
  * core-ish group.
  */
class ChunkStoreSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ChunkStoreSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ChunkStoreTable(properties.get("path"))
  override def supportsExternalMetadata(): Boolean = false
}

object ChunkStoreSource {
  val schema: StructType = StructType(Seq(
    StructField("time", IntegerType, nullable = false),
    StructField("band", IntegerType, nullable = false),
    StructField("cy", IntegerType, nullable = false),
    StructField("cx", IntegerType, nullable = false),
    StructField("data", ArrayType(FloatType, containsNull = false), nullable = false)))

  final case class Key(time: Int, band: Int, cy: Int, cx: Int)

  def listKeys(root: String): Seq[(Key, String)] = {
    val dir = Paths.get(root, "c")
    if (!Files.isDirectory(dir)) return Seq.empty
    val s = Files.list(dir)
    try s.iterator().asScala
      .map(_.getFileName.toString)
      .filterNot(_.startsWith("."))
      .flatMap { n =>
        n.split('.') match {
          case Array(t, b, cy, cx) =>
            Some(Key(t.toInt, b.toInt, cy.toInt, cx.toInt) -> s"$root/c/$n")
          case _ => None
        }
      }.toSeq
    finally s.close()
  }

  /** Evaluate a pushed filter against a chunk key; filters on non-key
    * columns are not accepted for pushdown in the first place. */
  def keep(f: Filter, k: Key): Boolean = {
    def v(attr: String): Option[Int] = attr match {
      case "time" => Some(k.time); case "band" => Some(k.band)
      case "cy" => Some(k.cy); case "cx" => Some(k.cx); case _ => None
    }
    f match {
      case EqualTo(a, x: Int)            => v(a).forall(_ == x)
      case GreaterThan(a, x: Int)        => v(a).forall(_ > x)
      case GreaterThanOrEqual(a, x: Int) => v(a).forall(_ >= x)
      case LessThan(a, x: Int)           => v(a).forall(_ < x)
      case LessThanOrEqual(a, x: Int)    => v(a).forall(_ <= x)
      case In(a, xs)                     => v(a).forall(x => xs.contains(x))
      case And(l, r)                     => keep(l, k) && keep(r, k)
      case Or(l, r)                      => keep(l, k) || keep(r, k)
      case Not(g)                        => !keep(g, k)
      case _                             => true // unknown → don't prune
    }
  }

  def isKeyFilter(f: Filter): Boolean = f.references.forall(
    Set("time", "band", "cy", "cx").contains)
}

class ChunkStoreTable(root: String) extends Table with SupportsRead {
  override def name(): String = s"graft_chunks($root)"
  override def schema(): StructType = ChunkStoreSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ChunkScanBuilder(root)
}

class ChunkScanBuilder(root: String) extends ScanBuilder with SupportsPushDownFilters {
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (accepted, rejected) = filters.partition(ChunkStoreSource.isKeyFilter)
    pushed = accepted
    rejected // residual: Spark re-applies these above the scan
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = new ChunkScan(root, pushed)
}

class ChunkScan(root: String, filters: Array[Filter]) extends Scan with Batch {
  override def readSchema(): StructType = ChunkStoreSource.schema
  override def description(): String =
    s"graft chunk store $root, PushedFilters: [${filters.mkString(", ")}]"
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    // plan-time pruning: only matching chunk files become work
    val files = ChunkStoreSource.listKeys(root)
      .filter { case (k, _) => filters.forall(ChunkStoreSource.keep(_, k)) }
    val slices = math.max(1, math.min(files.size, 32))
    files.grouped(math.max(1, (files.size + slices - 1) / slices))
      .map(g => ChunkInputPartition(g.toArray): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory = ChunkReaderFactory
}

final case class ChunkInputPartition(
    files: Array[(ChunkStoreSource.Key, String)]) extends InputPartition

object ChunkReaderFactory extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val files = p.asInstanceOf[ChunkInputPartition].files
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < files.length }
      override def get(): InternalRow = {
        val (k, path) = files(i)
        val bytes = Files.readAllBytes(Paths.get(path))
        val floats = new Array[Float](bytes.length / 4)
        ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
          .asFloatBuffer().get(floats)
        new GenericInternalRow(Array[Any](
          k.time, k.band, k.cy, k.cx,
          new GenericArrayData(floats.map(f => f: Any))))
      }
      override def close(): Unit = ()
    }
  }
}
