package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Small scalar pieces of the reference's extractor surface
  * (SURVEY §2.1/§2.8), exposed as pure functions for testability.
  */
object MetaFuncs {

  private val fmt =
    DateTimeFormatter.ofPattern("yyyy-MM-dd").withZone(ZoneOffset.UTC)

  /** S2 — rolling extraction window (reference src/extract.py:34-47):
    * `since = date(now − lookbackHours)`, `until = date(now)`, both
    * rendered `yyyy-MM-dd`. The reference accepts a `total_days` parameter
    * but ignores it (hardcoded HOURS_TO_PULL = 3, src/extract.py:39-41) —
    * we expose the hours knob directly. Pure function of `now` so tests
    * don't depend on wall clock. */
  def windowFor(now: Instant, lookbackHours: Long = 3L): (String, String) =
    (fmt.format(now.minusSeconds(lookbackHours * 3600)), fmt.format(now))

  /** S3/X1 — account-id normalization (reference src/extract.py:50-52):
    * strip any `act_` prefix then re-add it, so both bare and prefixed
    * ids are accepted. */
  def normalizeAccountId(id: String): String =
    "act_" + id.stripPrefix("act_")

  /** Column form of S3 for frame-level normalization. */
  def normalizeAccountIdCol(c: Column): Column =
    concat(lit("act_"), regexp_replace(c, "^act_", ""))

  /** X4 — date part of a `yyyy-MM-dd HH:mm:ss`-ish string
    * (reference src/extract.py:220-221 `split(' ')[0]`). */
  def datePart(c: Column): Column = split(c, " ").getItem(0)
}
