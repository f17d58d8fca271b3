package graft.sources

import java.util
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{StringType, StructType, TimestampType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSourceV2 streaming source — the reference's
  * deterministic ClickEventGenerator (flink-prometheus/
  * ClickEventGenerator.java:50-56: EVENTS_PER_WINDOW events per page
  * per 15 s window) as a real `MicroBatchStream`, completing the
  * "custom SourceFunction" row beyond MemoryStream.
  *
  * Options: `pages` (comma list), `eventsPerWindow`, `windows`
  * (finite; the generator stops after that many windows),
  * `startMs` (epoch millis of window 0).
  *
  * Offsets are plain event counts, so restarts resume exactly
  * (deterministic event i → (window, page, ts)) — the property the
  * reference's exactly-once tests rely on.
  *
  * Usage: spark.readStream.format("graft.sources.ClickGenSource")
  *   .option("pages", "/index,/shop").load()
  */
class ClickGenSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ClickGenSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new ClickGenTable(new CaseInsensitiveStringMap(properties))
}

object ClickGenSource {
  val schema: StructType = new StructType()
    .add("ts", TimestampType).add("page", StringType)
  val WindowMs = 15000L
}

private class ClickGenTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = "click_gen"
  override def schema(): StructType = ClickGenSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(opts: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = ClickGenSource.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new ClickGenStream(
          opts.getOrDefault("pages", "/index,/shop,/news").split(",").toSeq,
          opts.getOrDefault("eventsPerWindow", "1000").toInt,
          opts.getOrDefault("windows", "2").toInt,
          opts.getOrDefault("startMs", "1700000000000").toLong)
    }
}

private case class CountOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

private case class ClickRange(start: Long, end: Long, pages: Seq[String],
                              epw: Int, startMs: Long) extends InputPartition

/** Finite deterministic stream: event i belongs to window
  * i / (pages*epw); within a window events round-robin the pages and
  * spread evenly over the 15 s. */
private class ClickGenStream(pages: Seq[String], epw: Int, windows: Int,
                             startMsRaw: Long) extends MicroBatchStream {
  // align to the 15 s epoch grid so generated windows coincide with
  // window(ts, "15 seconds") buckets
  private val startMs = startMsRaw - startMsRaw % ClickGenSource.WindowMs
  private val total: Long = pages.size.toLong * epw * windows

  override def initialOffset(): Offset = CountOffset(0L)
  override def latestOffset(): Offset = CountOffset(total)
  override def deserializeOffset(json: String): Offset =
    CountOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(ClickRange(start.asInstanceOf[CountOffset].n,
      end.asInstanceOf[CountOffset].n, pages, epw, startMs))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[ClickRange]
      new PartitionReader[InternalRow] {
        private var i = p.start - 1
        override def next(): Boolean = { i += 1; i < p.end }
        override def get(): InternalRow = {
          val perWindow = p.pages.size.toLong * p.epw
          val w = i / perWindow
          val j = i % perWindow
          val page = p.pages((j % p.pages.size).toInt)
          val slot = j / p.pages.size // 0 until epw
          val ts = p.startMs + w * ClickGenSource.WindowMs +
            slot * ClickGenSource.WindowMs / p.epw
          InternalRow(ts * 1000L, UTF8String.fromString(page))
        }
        override def close(): Unit = ()
      }
    }
}
