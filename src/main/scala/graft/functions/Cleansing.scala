package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scalar cleansing layer — the reference's row-wise Python lambdas
  * re-expressed as codegen'd Catalyst expressions (no UDFs, so every
  * transform stays inside whole-stage codegen and is pushdown-friendly).
  *
  * Reference semantics reproduced here:
  *  - R2  `to_pct`                 — `RSS PARSER/gcp_rss.py:54-63`
  *  - R6  `normalize_timestamp`    — `RSS PARSER/gcp_rss.py:31-37`
  *  - C5  timestamp coerce+format  — `CSV PARSER/gcp_csv.py:102-105`
  *  - R7  sentinel → NULL          — `RSS PARSER/gcp_rss.py:99-112`
  *  - C7  numeric coerce           — `CSV PARSER/gcp_csv.py:122-135`
  *  - C3  account id from path     — `CSV PARSER/gcp_csv.py:79-80`
  *  - C9  composite row hash       — `CSV PARSER/gcp_csv.py:149-155`
  */
object Cleansing {

  /** R2: `"-"`/blank/null → null; `"12%"` → 0.12; else plain float parse.
    * Malformed input yields null (pandas `errors="coerce"` parity) via
    * `try_cast`, which is ANSI-safe. `RSS PARSER/gcp_rss.py:54-63`. */
  def toPct(c: Column): Column = {
    val t = trim(c)
    when(c.isNull || t === "-" || t === "", lit(null).cast("double"))
      .when(t.contains("%"),
        regexp_replace(t, "%", "").try_cast("double") / 100.0)
      .otherwise(t.try_cast("double"))
  }

  /** Feed timestamp layout `"Thu 21 Mar 2019 09:00:11"` — the reference's
    * `%a %d %b %Y %H:%M:%S` (`RSS PARSER/gcp_rss.py:33`). */
  val FeedTsFmt = "EEE d MMM yyyy HH:mm:ss"

  /** ISO-8601 second resolution, the reference's canonical egress string
    * form (`CSV PARSER/gcp_csv.py:105`). */
  val IsoFmt = "yyyy-MM-dd'T'HH:mm:ss"

  /** R6: parse the feed layout, null on failure (never throws).
    *
    * Spark's post-3.0 parser rejects `EEE` in *parse* patterns (day-of-week
    * is derivable, so it is format-only). Python's `%a` accepts any valid
    * day abbreviation without cross-checking it against the date
    * (`RSS PARSER/gcp_rss.py:33`), so stripping a validated day prefix and
    * parsing the remainder is exactly equivalent: valid prefix → parsed,
    * anything else → null. */
  def parseFeedTs(c: Column): Column = {
    val stripped = regexp_replace(c, "^(Mon|Tue|Wed|Thu|Fri|Sat|Sun) ", "")
    when(stripped === c, lit(null).cast("timestamp"))
      .otherwise(try_to_timestamp(stripped, lit("d MMM yyyy HH:mm:ss")))
  }

  /** C5: format a timestamp to the ISO egress string. */
  def isoFormat(ts: Column): Column = date_format(ts, IsoFmt)

  /** R7: the feed emits the epoch as a magic "not closed yet" marker
    * (`RSS PARSER/gcp_rss.py:104-105`). */
  val EpochSentinel = "Thu 1 Jan 1970 00:00:00"

  def nullIfEpoch(c: Column): Column =
    when(c === EpochSentinel, lit(null).cast("string")).otherwise(c)

  /** R7: `"0"` means unset for tp/sl (`RSS PARSER/gcp_rss.py:110-111`). */
  def zeroToNull(c: Column): Column =
    when(trim(c) === "0", lit(null).cast("string")).otherwise(c)

  /** C7: `pd.to_numeric(errors="coerce")` parity — malformed → null. */
  def tryDouble(c: Column): Column = c.try_cast("double")

  /** C13: int coercion (`CSV PARSER/gcp_csv.py:166`). */
  def tryLong(c: Column): Column = c.try_cast("long")

  /** C3: `account_id` = path basename minus `.csv`
    * (`CSV PARSER/gcp_csv.py:79-80`). */
  def accountIdFromPath(path: Column): Column =
    regexp_extract(path, "([^/]+)\\.csv$", 1)

  /** C9: composite-key row hash (`CSV PARSER/gcp_csv.py:150-155` builds
    * md5 over concatenated key fields). `concat_ws` is null-tolerant like
    * the reference's `str()` coercion. */
  def rowHash(cols: Column*): Column = md5(concat_ws("|", cols: _*))
}
