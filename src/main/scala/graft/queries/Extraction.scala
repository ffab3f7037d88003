package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The pdf2dataset extraction surface modeled over the driver fixtures
  * (SURVEY.md §2.A). The real engine — binary corpus scan, pluggable
  * feature extractors, error capture, resume, chunked sinks — lives in
  * `graft.extract` and is exercised by ExtractionSpec over synthetic
  * corpora; the queries here express the same *semantics* over the
  * sanctioned `documents`/`events` stand-ins so the DuckDB oracle can
  * hash-check them (no PDFs exist in this environment).
  */
object Extraction {

  /** Document → page fan-out (reference: one extraction task per page;
    * pages modeled as ceil(n_chars / 100)). Explode keeps the fan-out
    * distributed — no driver-side loop. The page count is clamped to >= 1:
    * Spark's sequence(1, 0) yields a DESCENDING [1, 0] while DuckDB's
    * generate_series(1, 0) is empty, so an unguarded fan-out silently
    * diverges on empty documents (every doc gets at least one page, which
    * also matches the reference's one-task-per-unreadable-doc behavior).
    */
  def pageFanout(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "documents")
      .select(col("doc_id"),
        explode(sequence(lit(1),
          greatest(ceil(coalesce(col("n_chars"), lit(0L)) / lit(100.0)).cast(IntegerType),
            lit(1)))).as("page"))
      .withColumn("page", col("page").cast(LongType))
      .orderBy(col("doc_id"), col("page"))

  val pageFanoutSql =
    """SELECT doc_id, CAST(unnest(generate_series(1, greatest(CAST(ceil(coalesce(n_chars, 0) / 100.0) AS INT), 1))) AS BIGINT) AS page
      |FROM documents
      |ORDER BY doc_id, page""".stripMargin

  /** Per-row error capture: a failing feature never kills the job — the
    * row survives with the error column set (reference: extract_task.py
    * catches per-feature exceptions into an `error` column). Modeled with
    * try_cast over events.props.
    */
  def errorCapture(spark: SparkSession, dir: String): DataFrame =
    Tables.t(spark, dir, "events")
      .select(col("event_id"),
        expr("try_cast(get_json_object(props, '$.k') AS INT)").as("k"),
        expr("try_cast(event_type AS INT)").as("feature_val"),
        when(expr("try_cast(event_type AS INT)").isNull,
          concat(lit("cast: invalid int: "), col("event_type")))
          .otherwise(lit(null).cast(StringType)).as("error"))
      .orderBy(col("event_id"))

  val errorCaptureSql =
    """SELECT event_id,
      |  TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) AS k,
      |  TRY_CAST(event_type AS INTEGER) AS feature_val,
      |  CASE WHEN TRY_CAST(event_type AS INTEGER) IS NULL
      |       THEN 'cast: invalid int: ' || event_type ELSE NULL END AS error
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** Resume / incremental skip: anti-join the task list against the
    * already-written output (reference: extract.py re-reads the output
    * parquet and skips done (path, page) pairs). The "done" set is modeled
    * as every page of doc_ids divisible by 3.
    */
  def resumeAnti(spark: SparkSession, dir: String): DataFrame = {
    val tasks = pageFanout(spark, dir)
    val done = tasks.filter(col("doc_id") % 3 === 0)
      .select(col("doc_id").as("done_doc"), col("page").as("done_page"))
    tasks.join(done,
        col("doc_id") === col("done_doc") && col("page") === col("done_page"),
        "left_anti")
      .orderBy(col("doc_id"), col("page"))
  }

  val resumeAntiSql =
    """WITH tasks AS (
      |  SELECT doc_id, CAST(unnest(generate_series(1, greatest(CAST(ceil(coalesce(n_chars, 0) / 100.0) AS INT), 1))) AS BIGINT) AS page
      |  FROM documents)
      |SELECT doc_id, page FROM tasks t
      |WHERE NOT EXISTS (SELECT 1 FROM tasks d
      |                  WHERE d.doc_id % 3 = 0 AND d.doc_id = t.doc_id AND d.page = t.page)
      |ORDER BY doc_id, page""".stripMargin

  val all: Seq[ContractQuery] = Seq(
    ContractQuery("q_page_fanout", pageFanout, Some(pageFanoutSql)),
    ContractQuery("q_error_capture", errorCapture, Some(errorCaptureSql)),
    ContractQuery("q_resume_anti", resumeAnti, Some(resumeAntiSql))
  )
}
