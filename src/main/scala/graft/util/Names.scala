package graft.util

/** Identifier hygiene for anything we interpolate into generated SQL or
  * use as a temp-view name. Mirrors the safety contract of the
  * reference's `_sql_utils.py:8-31` (quote-escape identifiers/literals,
  * reduce names to `[A-Za-z0-9_]`), which its adversarial tests
  * (`tests/test_sql_safety.py`) pin down.
  */
object Names {

  /** Reduce an arbitrary feature/source name to a safe internal
    * identifier: every char outside [A-Za-z0-9_] becomes '_'.
    * Collisions across distinct inputs must be detected by the caller
    * (the engine refuses two features whose safe names collide).
    */
  def safeName(name: String): String =
    name.map(c => if (c.isLetterOrDigit && c < 128 || c == '_') c else '_')

  /** Quote an identifier for SQL (double quotes, doubled to escape). */
  def quoteIdent(name: String): String =
    "\"" + name.replace("\"", "\"\"") + "\""

  /** Quote a string literal for SQL (single quotes, doubled). */
  def quoteLit(value: String): String =
    "'" + value.replace("'", "''") + "'"

  /** Namespaced output column: `{feature}__{col}`. */
  def namespaced(feature: String, col: String): String = s"${feature}__$col"

  /** The bookkeeping per-feature timestamp column. */
  def featureTimeCol(feature: String): String = s"${feature}__feature_time"
}
