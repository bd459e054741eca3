package graft.errors

/** Error hierarchy mirroring the reference's user-facing exception
  * design (`/root/reference/src/timefence/errors.py`): every error is a
  * subclass of one root, and messages carry an actionable "fix" hint.
  */
class GraftException(message: String) extends RuntimeException(message)

/** Invalid user configuration (bad durations, modes, params). */
class ConfigError(message: String) extends GraftException(message)

/** A schema requirement was not met (missing key/timestamp/columns). */
class SchemaError(message: String) extends GraftException(message)

/** Duplicate (key, timestamp) rows with on_duplicate="error". */
class DuplicateRowsError(message: String) extends GraftException(message)

/** Labels and a feature disagree on timestamp timezone-awareness. */
class TimezoneMismatchError(message: String) extends GraftException(message)

/** Raised by AuditReport.assertClean() when leakage was detected
  * (reference: `TimefenceLeakageError`, engine.py:183-188). */
class LeakageError(message: String) extends GraftException(message)

object Errors {
  def schema(msg: String, fix: String): SchemaError =
    new SchemaError(s"$msg\n  Fix: $fix")
  def config(msg: String, fix: String): ConfigError =
    new ConfigError(s"$msg\n  Fix: $fix")
}
