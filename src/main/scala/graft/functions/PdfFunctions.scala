package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.udf

/** Ad-hoc SQL surface for the extraction kernel (SURVEY.md §2.8(b)): scalar
  * functions usable from `spark.sql(...)`. The typed `ExtractJob` pipeline
  * remains the primary (and faster) surface — these are for exploration:
  *
  *   SELECT media_ref, pdf2txt(bytes) FROM media
  *   SELECT posexplode(pdf2pages(bytes)) FROM media
  */
object PdfFunctions {

  private val pdf2txtF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.pdf.Pdf.pdf2txt(bytes)

  /** null on malformed input instead of failing the task. */
  private val pdf2txtSafeF = (bytes: Array[Byte]) =>
    if (bytes == null) null
    else try graft.pdf.Pdf.pdf2txt(bytes) catch { case _: Exception => null }

  private val pdf2pagesF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.pdf.Pdf.pdf2pages(bytes)

  private val html2txtF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.html2txt(bytes)

  private val htmlImageRefsF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.imageRefs(bytes)

  /** Column form of the HTML image-ref extractor (typed pipelines). */
  def htmlImageRefs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf(htmlImageRefsF).apply(c)

  private val htmlLinkRefsF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.linkRefs(bytes)

  /** Column form of the HTML outlink extractor (in-content hrefs). */
  def htmlLinkRefs(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf(htmlLinkRefsF).apply(c)

  private val htmlAnchorsF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.anchors(bytes)

  /** Column form of the (href, anchor text) pair extractor. */
  def htmlAnchors(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf(htmlAnchorsF).apply(c)

  private val htmlTablesF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.tableCells(bytes)

  /** Column form of the table-cell extractor: (table, row, col, text). */
  def htmlTables(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf(htmlTablesF).apply(c)

  private val htmlDocMetaF = (bytes: Array[Byte]) =>
    if (bytes == null) null else graft.html.Html.docMeta(bytes)

  /** Column form of the head-metadata extractor: (title, description). */
  def htmlDocMeta(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    udf(htmlDocMetaF).apply(c)

  def register(spark: SparkSession): Unit = {
    spark.udf.register("pdf2txt", udf(pdf2txtF))
    spark.udf.register("pdf2txt_safe", udf(pdf2txtSafeF))
    spark.udf.register("pdf2pages", udf(pdf2pagesF))
    spark.udf.register("html2txt", udf(html2txtF))
    spark.udf.register("html_image_refs", udf(htmlImageRefsF))
    spark.udf.register("html_link_refs", udf(htmlLinkRefsF))
    spark.udf.register("html_anchors", udf(htmlAnchorsF))
    spark.udf.register("html_tables", udf(htmlTablesF))
    spark.udf.register("html_doc_meta", udf(htmlDocMetaF))
  }
}
