package graft.extract

/** Pluggable document-extraction leaves (SURVEY.md §7.5).
  *
  * The reference (icaropires/pdf2dataset) extracts per-page text via
  * poppler, renders page images, and optionally OCRs them. No PDF/OCR
  * library exists in this offline environment, so the leaves are traits: a
  * production deployment binds PDFBox/tess4j here; tests and the offline
  * default use [[StubExtractor]], whose deterministic format exercises
  * every pipeline semantic (multi-page fan-out, invalid-doc error rows,
  * per-feature failures) exactly like upstream's tests/samples corpus.
  */
trait DocExtractor extends Serializable {

  /** Number of pages, 1-based. MUST throw on an unreadable document —
    * the pipeline catches and emits the page = -1 error row (upstream:
    * pdf2dataset/extract.py error handling).
    */
  def pageCount(bytes: Array[Byte]): Int

  /** Embedded text layer of the given 1-based page. */
  def pageText(bytes: Array[Byte], page: Int): String

  /** Rendered page image (serialized; format/size are extractor config). */
  def pageImage(bytes: Array[Byte], page: Int): Array[Byte]

  /** OCR of the rendered page (upstream: pytesseract image_to_string). */
  def ocrText(bytes: Array[Byte], page: Int, lang: String): String
}

/** Deterministic offline stub. Document format: UTF-8 text prefixed with
  * the magic "%DOC", pages separated by '\f' (the same page separator
  * pdftotext emits). Any payload without the magic is "corrupt" and
  * throws — the analog of upstream's tests/samples invalid PDF.
  */
object StubExtractor extends DocExtractor {
  val Magic = "%DOC"

  private def pages(bytes: Array[Byte]): Array[String] = {
    val s = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    if (!s.startsWith(Magic))
      throw new IllegalArgumentException("corrupt document: missing %DOC magic")
    s.drop(Magic.length).split('\f')
  }

  override def pageCount(bytes: Array[Byte]): Int = pages(bytes).length

  override def pageText(bytes: Array[Byte], page: Int): String = {
    val p = pages(bytes)
    if (page < 1 || page > p.length)
      throw new IndexOutOfBoundsException(s"page $page of ${p.length}")
    p(page - 1)
  }

  /** "Rendered image": deterministic bytes derived from the page text —
    * a stand-in with the right type/shape for the binary column.
    */
  override def pageImage(bytes: Array[Byte], page: Int): Array[Byte] =
    s"IMG:$page:${pageText(bytes, page)}"
      .getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def ocrText(bytes: Array[Byte], page: Int, lang: String): String =
    s"[$lang] " + pageText(bytes, page)
}

/** An extractor whose every method throws — used by tests to assert that
  * feature failures are captured per-row instead of killing the job.
  */
object FailingExtractor extends DocExtractor {
  private def boom = throw new RuntimeException("extractor down")
  override def pageCount(bytes: Array[Byte]): Int = boom
  override def pageText(bytes: Array[Byte], page: Int): String = boom
  override def pageImage(bytes: Array[Byte], page: Int): Array[Byte] = boom
  override def ocrText(bytes: Array[Byte], page: Int, lang: String): String = boom
}
