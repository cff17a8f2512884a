package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** S3 JSON sink (SURVEY.md §2.1; wrangler.py:226-279 `generate_json`).
  *
  * The reference writes two indented-JSON artifacts into `./completed/`
  * with date-stamped filenames, using a custom encoder (wrangler.py:43-49):
  * TicketStatus → its name, datetime → ISO-8601, Comment → plain dict. We
  * encode that shape *explicitly in the plan* — `date_format` + `struct`
  * columns — so `df.write.json` needs no serializer and the sink stays a
  * distributed, partition-parallel write (the reference serializes the
  * whole list driver-side in one `json.dump`).
  *
  * Scale: output parallelism = partition count of the input; date-stamping
  * happens once on the driver (filename), never per row. Callers
  * `.repartition(n)` to pick output file counts.
  */
object Json {

  private val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss'Z'"

  /** Encode the nested ticket shape to the reference's serialized form. */
  def encodeTickets(nested: DataFrame): DataFrame =
    nested.select(
      col("ticket_id").as("id"),
      date_format(col("created_at"), IsoFmt).as("created_at"),
      date_format(col("last_updated"), IsoFmt).as("last_updated"),
      col("status"), // enum encoded by name (wrangler.py:43-44)
      col("subject"), col("tags"), col("outcome"), col("ticket_type"),
      transform(col("comments"), c => struct(
        c.getField("comment_id").as("id"),
        date_format(c.getField("created_at"), IsoFmt).as("created_at"),
        c.getField("body").as("body"))).as("comments"))

  /** `processed_tickets{date}.json` — one JSON-lines dataset. `dateStamp`
    * is injected (deterministic tests; the reference stamps with now()). */
  def writeTickets(nested: DataFrame, outDir: String, dateStamp: String): Unit =
    encodeTickets(nested).write.mode("overwrite")
      .json(s"$outDir/processed_tickets$dateStamp")

  /** `corpus_{date}.json` — (ticket_id, doc) corpus rows. */
  def writeCorpus(corpus: DataFrame, outDir: String, dateStamp: String): Unit =
    corpus.write.mode("overwrite").json(s"$outDir/corpus_$dateStamp")
}

/** Hive-partitioned parquet sink — the standard lake layout at 100 TB:
  * one directory per partition value (`lang=en/…`), so downstream scans
  * with a partition predicate read only matching directories (partition
  * pruning happens before any file I/O). Keep partition columns
  * low-cardinality; high-cardinality keys create a small-file explosion. */
object Parquet {
  def writePartitioned(df: DataFrame, outDir: String,
      partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(outDir)
}
