package graft.util

import java.time.Duration

/** Human-readable duration strings, mirroring the reference's accepted
  * grammar (`/root/reference/src/timefence/_duration.py:8-44`): `"30d"`,
  * `"1d12h"`, `"6h"`, `"30m"`, `"15s"`, `"0"`. Rendered back in compound
  * form (`_duration.py:47-66`) and converted to ANSI interval SQL for
  * generated queries (`_duration.py:69-87`).
  */
object Durations {

  private val Pattern = """^(?:(\d+)d)?(?:(\d+)h)?(?:(\d+)m)?(?:(\d+)s)?$""".r

  /** Parse a duration string into a [[java.time.Duration]].
    * Throws IllegalArgumentException on anything the grammar rejects.
    */
  def parse(value: String): Duration = {
    val v = value.trim
    if (v == "0") return Duration.ZERO
    v match {
      case Pattern(d, h, m, s) if Seq(d, h, m, s).exists(_ != null) =>
        def n(x: String): Long = if (x == null) 0L else x.toLong
        Duration
          .ofDays(n(d))
          .plusHours(n(h))
          .plusMinutes(n(m))
          .plusSeconds(n(s))
      case _ =>
        throw new IllegalArgumentException(
          s"Invalid duration '$value'. Expected format like '30d', '6h', '1d12h', '365d'."
        )
    }
  }

  /** Accept either an already-parsed Duration or a string. */
  def parseOpt(value: Option[String]): Option[Duration] = value.map(parse)

  /** Render back to the compound human form; zero renders as "0d". */
  def format(d: Duration): String = {
    val total = d.getSeconds
    if (total == 0L) return "0d"
    val days = total / 86400
    val hours = (total % 86400) / 3600
    val minutes = (total % 3600) / 60
    val seconds = total % 60
    val sb = new StringBuilder
    if (days != 0) sb.append(s"${days}d")
    if (hours != 0) sb.append(s"${hours}h")
    if (minutes != 0) sb.append(s"${minutes}m")
    if (seconds != 0) sb.append(s"${seconds}s")
    sb.toString
  }

  /** ANSI SQL interval expression usable in both Spark SQL and DuckDB:
    * a compound sum of single-unit intervals.
    */
  def toSqlInterval(d: Duration): String = {
    val total = d.getSeconds
    if (total == 0L) return "INTERVAL '0' SECOND"
    val days = total / 86400
    val hours = (total % 86400) / 3600
    val minutes = (total % 3600) / 60
    val seconds = total % 60
    val parts = Seq(
      days -> "DAY",
      hours -> "HOUR",
      minutes -> "MINUTE",
      seconds -> "SECOND"
    ).collect { case (n, unit) if n != 0 => s"INTERVAL '$n' $unit" }
    parts.mkString(" + ")
  }

  /** Total seconds — the canonical scalar used in Column arithmetic. */
  def seconds(d: Duration): Long = d.getSeconds
}
