package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** Multimodal-column plumbing: opaque binary payloads + typed metadata.
  *
  * The decode step is a clearly-marked deterministic STUB (no image/audio
  * libs in this container); everything around it — binary schema, typed
  * Dataset pipeline, per-partition batch processing, output schema — is the
  * real shape a decode/feature-extract stage has at scale: `mapPartitions`
  * over a typed Dataset so each task amortizes (stub) codec setup across
  * its whole partition, exactly like a Pandas-UDF batch would.
  */
object Multimodal {

  case class BinaryDoc(doc_id: Long, payload: Array[Byte], source: String)
  case class DecodedMeta(doc_id: Long, n_bytes: Long, first_byte: Long,
                         fake_feature: Long, source: String)

  /** STUB decode: a real pipeline would decode image/audio bytes here
    * (e.g. JPEG → tensor). Deterministic fake: sum of payload bytes mod 256.
    */
  private def stubDecode(payload: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < payload.length) { acc += (payload(i) & 0xff); i += 1 }
    acc % 256L
  }

  case class Frame(doc_id: Long, frame_idx: Long, offset: Long, frame_feature: Long)

  /** m2: frame sampling over opaque binary payloads — the video-pipeline
    * batch shape: each payload yields `nFrames` fixed-stride windows, each
    * "decoded" (STUB) to a feature row. One input row → N typed output
    * rows, all inside a single mapPartitions pass (no shuffle; the
    * explosion happens task-local exactly like a real frame extractor).
    */
  def frameSample(spark: SparkSession, dir: String, nFrames: Int = 4,
                  frameLen: Int = 16): DataFrame = {
    import spark.implicits._
    val binaries: Dataset[BinaryDoc] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[BinaryDoc]

    binaries.mapPartitions { it =>
      it.flatMap { b =>
        val stride = math.max(1, b.payload.length / nFrames)
        (0 until nFrames).iterator.flatMap { f =>
          val off = f * stride
          if (off >= b.payload.length) None
          else {
            val end = math.min(off + frameLen, b.payload.length)
            // STUB decode: a real pipeline would decode the frame bytes
            // (e.g. JPEG frame → tensor); deterministic fake feature here
            var acc = 0L
            var i = off
            while (i < end) { acc = acc * 31 + (b.payload(i) & 0xff); i += 1 }
            Some(Frame(b.doc_id, f.toLong, off.toLong, acc & 0x7fffffffL))
          }
        }
      }
    }.toDF().orderBy("doc_id", "frame_idx")
  }

  /** m1: binary ingestion + per-partition decode → typed metadata. */
  def binaryMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val binaries: Dataset[BinaryDoc] = Tables.documents(spark, dir)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"), col("source"))
      .as[BinaryDoc]

    binaries.mapPartitions { it =>
      // per-partition: open the (stub) codec once, stream the batch through
      it.map { b =>
        DecodedMeta(
          doc_id = b.doc_id,
          n_bytes = b.payload.length.toLong,
          first_byte = if (b.payload.nonEmpty) (b.payload(0) & 0xff).toLong else -1L,
          fake_feature = stubDecode(b.payload),
          source = b.source)
      }
    }.toDF().orderBy("doc_id")
  }
}
