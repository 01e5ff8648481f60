package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw-asset ingestion for multimodal corpora — the on-ramp that turns a
  * bucket of image/audio/video files into an analyzable table. Spark's
  * `binaryFile` format yields one row per file: (path, modificationTime,
  * length, content BINARY), which is exactly the opaque-bytes-plus-
  * metadata column model the multimodal pipeline (multimodal/Decode)
  * consumes downstream.
  *
  * Scale notes: listing is driver-side metadata (same as any file scan);
  * rows are read lazily per file, and `pathGlobFilter` prunes non-matching
  * files BEFORE any byte is read — the partition-pruning analogue for
  * unstructured asset trees. Spark caps a binaryFile row at
  * `spark.sql.sources.binaryFile.maxLength` (default Int.MaxValue);
  * multi-GB assets should be range-chunked upstream.
  */
object Binary {

  /** One row per file under `path`; `glob` (e.g. "*.png") prunes by file
    * name before content is read. */
  def read(spark: SparkSession, path: String, glob: Option[String] = None): DataFrame = {
    val reader = spark.read.format("binaryFile")
    glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path)
  }
}
