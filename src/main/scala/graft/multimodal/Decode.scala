package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}

/** Multimodal decode plumbing: opaque binary payloads + typed metadata in,
  * typed features out, processed per-partition in bounded batches.
  *
  * The actual decoders (image decode, audio resample, video frame-sample)
  * need native libraries this container doesn't ship — [[FakeCodec]] is a
  * clearly-marked deterministic stand-in. Everything AROUND the codec is
  * the real engine surface and is what DecodeSpec locks in:
  *   - schema: (asset_id, payload binary, meta struct) → typed
  *     [[AssetFeatures]] rows;
  *   - partitioning: mapPartitions keeps the codec call per-executor,
  *     zero driver involvement, arbitrary partition count;
  *   - batch shape: payloads are buffered into fixed-size batches inside
  *     each partition (codecs amortize setup per batch, memory stays
  *     bounded by batchSize × payload, not partition size).
  *
  * This is the Scala/Dataset analogue of a pandas mapInPandas decode
  * stage; swapping FakeCodec for a real one changes no plumbing.
  */
object Decode {

  final case class Asset(asset_id: Long, payload: Array[Byte], modality: String)
  final case class AssetFeatures(
      asset_id: Long,
      modality: String,
      n_bytes: Int,
      width: Int,
      height: Int,
      n_frames: Int,
      brightness: Double)

  /** STUB codec — deterministic fake features derived from content bytes.
    * Replace with the real image/audio/video libraries at deployment;
    * signature (batch in, batch out) is the contract. */
  object FakeCodec {
    def decodeBatch(batch: Seq[Asset]): Seq[AssetFeatures] =
      batch.map { a =>
        val h = java.util.Arrays.hashCode(a.payload)
        AssetFeatures(
          a.asset_id, a.modality, a.payload.length,
          width = math.abs(h % 1920) + 1,
          height = math.abs((h >> 8) % 1080) + 1,
          n_frames = if (a.modality == "video") math.abs(h % 300) + 1 else 1,
          brightness = math.abs((h % 1000) / 1000.0))
      }
  }

  /** Per-partition batched decode (batchSize bounds executor memory). */
  def decode(assets: Dataset[Asset], batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[AssetFeatures]
    assets.mapPartitions { it =>
      it.grouped(batchSize).flatMap(b => FakeCodec.decodeBatch(b.toSeq))
    }
  }

  /** DataFrame adapter: (asset_id long, payload binary, modality string). */
  def decodeFrame(df: DataFrame, batchSize: Int = 64): Dataset[AssetFeatures] = {
    implicit val enc = Encoders.product[Asset]
    decode(df.as[Asset], batchSize)
  }
}
