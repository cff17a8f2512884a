package graft.multimodal

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 media table (round-3/4 advice item: make the "blob pages
  * are never read" claim machine-checked, not argued). A real deployment
  * would back this with an object-store manifest + blob fetcher; here the
  * rows are generated deterministically from `media_id` (same splitmix
  * derivation as Media.DecodeStub), which keeps the connector surface —
  * schema, capabilities, COLUMN PRUNING, partition planning — identical to
  * a production source while staying self-contained.
  *
  * Scale design:
  *  - `planInputPartitions` splits the id range into `partitions` splits —
  *    the executor-parallelism contract (a manifest-backed source would
  *    split by object listing / row-group ranges the same way);
  *  - `SupportsPushDownRequiredColumns` receives Catalyst's pruned schema
  *    (including NESTED pruning into `meta`), and the reader materializes
  *    ONLY requested fields: a metadata-only query never constructs a
  *    content byte[] — MediaSourceSpec asserts the `MediaGen.contentReads`
  *    counter stays 0, turning the columnar-pruning claim into a test;
  *  - readers are created per partition, stream rows one at a time, and
  *    hold O(1) state — no blob buffering.
  *
  * Usage: `spark.read.format("graft.multimodal.MediaSource")
  *   .option("rows", n).option("partitions", p).load()`.
  */
class MediaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    Media.mediaSchema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MediaTable(opts.getLong("rows", 100L), opts.getInt("partitions", 8))
  }
}

private[multimodal] class MediaTable(rows: Long, parts: Int)
    extends Table with SupportsRead {
  override def name(): String = s"media_gen(rows=$rows)"
  override def schema(): StructType = Media.mediaSchema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new MediaScanBuilder(rows, parts)
}

private[multimodal] class MediaScanBuilder(rows: Long, parts: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = Media.mediaSchema
  // Catalyst hands us the minimal schema (nested-pruned: a query touching
  // only meta.width arrives as meta: struct<width>) — store verbatim
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new MediaScan(required, rows, parts)
}

private[multimodal] case class MediaRange(start: Long, end: Long)
    extends InputPartition

private[multimodal] class MediaScan(required: StructType, rows: Long, parts: Int)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"MediaScan(rows=$rows, schema=${required.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] = {
    val per = math.max(1L, (rows + parts - 1) / parts)
    (0 until parts).iterator
      .map(i => MediaRange(i * per, math.min(rows, (i + 1) * per)))
      .filter(r => r.start < r.end).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new MediaReaderFactory(required)
}

private[multimodal] class MediaReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val r = p.asInstanceOf[MediaRange]
    new MediaReader(required, r.start, r.end)
  }
}

private[multimodal] class MediaReader(required: StructType, start: Long, end: Long)
    extends PartitionReader[InternalRow] {
  private var id = start - 1
  override def next(): Boolean = { id += 1; id < end }
  override def get(): InternalRow = MediaGen.row(required, id)
  override def close(): Unit = ()
}

/** Deterministic row generator + the test hook proving content bytes are
  * never touched by pruned scans. */
object MediaGen {
  /** Incremented ONLY when a content byte[] is materialized — the
    * machine-checkable form of "metadata queries never read blob pages". */
  val contentReads = new java.util.concurrent.atomic.AtomicLong(0)

  private val Kinds = Array("image", "audio", "video")
  private val Formats = Array("jpeg", "wav", "mp4")

  private def mix(z0: Long): Long = { // splitmix64 — public-domain mixer
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
  private def pmod(x: Long, m: Long): Long = ((x % m) + m) % m

  private def kindIdx(id: Long): Int = pmod(mix(id), 3).toInt

  private def content(id: Long): Array[Byte] = {
    contentReads.incrementAndGet()
    val len = (200 + pmod(mix(id ^ 0x5eedL), 1800)).toInt
    val out = new Array[Byte](len)
    var i = 0
    val s = mix(id)
    while (i < len) { out(i) = (mix(s + i) & 0xff).toByte; i += 1 }
    out
  }

  private def metaValue(id: Long, field: String): Any = field match {
    case "format"      => UTF8String.fromString(Formats(kindIdx(id)))
    case "width"       => (pmod(mix(id ^ 1L), 1920) + 16).toInt
    case "height"      => (pmod(mix(id ^ 2L), 1080) + 16).toInt
    case "sample_rate" => 16000
    case "n_frames"    => (pmod(mix(id ^ 3L), 240) + 8).toInt
  }

  /** Materializes exactly the fields in `required` (top-level AND nested
    * meta fields) — unrequested columns cost nothing. */
  def row(required: StructType, id: Long): InternalRow = {
    val values: Array[Any] = required.fields.map { f =>
      f.name match {
        case "media_id" => id
        case "kind"     => UTF8String.fromString(Kinds(kindIdx(id)))
        case "content"  => content(id)
        case "meta" =>
          val sub = f.dataType.asInstanceOf[StructType]
          new GenericInternalRow(
            sub.fields.map(mf => metaValue(id, mf.name)): Array[Any])
      }
    }
    new GenericInternalRow(values)
  }
}
