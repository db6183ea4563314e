package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Line-delimited JSON interchange for the documents corpus — the format
  * raw crawls actually arrive in (WARC-derived dumps, Dolma shards, API
  * exports are all JSONL) and the one the reference's Supabase layer
  * speaks natively (PostgREST JSON rows, /root/reference/database.py).
  *
  * The read takes an EXPLICIT schema: at 100 TB, schema inference is a
  * full extra pass over the data before the first real one, and a
  * drifting inferred type (a doc_id that looks numeric in one shard and
  * string in another) poisons every downstream join. Malformed lines
  * surface rather than vanish: FAILFAST is deliberate — a corrupt shard
  * should stop the ingest, not silently shrink the corpus.
  */
object Interchange {

  /** The documents-table schema, declared once (matches the parquet
    * catalog's layout — Tables.documents). All fields nullable: the JSON
    * reader forces nullability regardless of declaration (a missing key
    * IS null in JSONL), so declaring otherwise would just make the
    * read-back schema differ from this one.
    */
  val DocumentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType, nullable = true),
    StructField("text", StringType, nullable = true),
    StructField("lang", StringType, nullable = true),
    StructField("source", StringType, nullable = true),
    StructField("n_chars", LongType, nullable = true)))

  /** Write a documents frame as gzip JSONL shards (text-format codecs
    * are the Hadoop set — no zstd there; gzip is the interchange
    * convention anyway, cf. Dolma/C4 shard naming).
    */
  def writeJsonlDocs(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)

  /** Read a JSONL documents dir with the declared schema, failing loudly
    * on malformed lines.
    */
  def readJsonlDocs(spark: SparkSession, path: String): DataFrame =
    spark.read.schema(DocumentsSchema)
      .option("mode", "FAILFAST")
      .json(path)
}
