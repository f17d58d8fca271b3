package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for the 100 TB training-data path:
  * tokenization, n-gram shingling, and a cross-engine-stable 32-bit
  * content hash. All pure Column expressions (codegen'd, no UDFs),
  * all element-wise (no shuffle).
  *
  * The hash is the first 8 hex chars of md5 as a BIGINT — identical in
  * Spark (`conv(substr(md5(x),1,8),16,10)`) and DuckDB
  * (`CAST('0x'||substr(md5(x),1,8) AS BIGINT)`), which is what makes
  * MinHash/SimHash signatures oracle-verifiable cross-engine.
  */
object TextOps {

  /** Whitespace tokens, empty strings dropped (Spark's split drops
    * trailing empties, DuckDB keeps them — filtering makes both agree). */
  def tokens(text: Column): Column =
    filter(split(text, " "), t => t =!= "")

  /** Word n-gram shingles ("w1 w2 w3") from a MATERIALIZED tokens
    * column. Pass a column reference (`withColumn("tk", tokens(...))`
    * first), NOT `tokens(text)` inline: expression arguments are
    * inlined into the lambda, so an inline tokenizer would re-split
    * the text once per array element — O(len²) per row, a 30×
    * slowdown observed on the dedup pipeline at sf0.1. */
  def shingles(toks: Column, n: Int): Column =
    filter(
      transform(toks, (_, i) =>
        when(i <= size(toks) - n,
          concat_ws(" ", slice(toks, i + 1, lit(n))))),
      s => s.isNotNull)

  /** Stable 32-bit content hash (see object doc). */
  def hash32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  /** SQL-side mirror of hash32 for DuckDB oracle strings. */
  def hash32Sql(e: String): String =
    s"CAST(('0x' || substr(md5($e), 1, 8)) AS BIGINT)"
}
