package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Mojibake (encoding-artifact) detection and repair.
  *
  * Web-crawl text is full of UTF-8 that was decoded as Windows-1252
  * somewhere upstream: "Ã©" for "é", "â€™" for "'", "â€"" for "—",
  * "Â " for a non-breaking space. The reference has no such operator;
  * this is extension surface for the crawl-curation family (the same
  * public approach as ftfy's sloppy-windows-1252 pass, recast as a
  * deterministic replacement table so the repair is scan-side,
  * whole-stage-codegen'd, and DuckDB-replayable).
  *
  * The artifact table is DERIVED, not hand-typed: for each curated
  * target character, artifact = its UTF-8 bytes decoded as
  * Windows-1252. Targets whose artifacts would contain unmappable
  * CP1252 bytes (0x81 0x8D 0x8F 0x90 0x9D decode to C1 controls) are
  * excluded by construction, so every pair round-trips cleanly and
  * renders as a plain SQL literal. Pairs apply longest-artifact-first
  * (3-byte targets like curly quotes before 2-byte accented letters)
  * so a prefix repair can never strand the tail of a longer artifact.
  *
  * Scale: the repair is a chain of codegen'd `StringReplace`s inside
  * one projection — no shuffle, no UDF, no regex engine in the hot
  * path. At 100 TB it is pure map work that rides whatever scan
  * produced the column.
  */
object Mojibake {

  private val Utf8 = java.nio.charset.StandardCharsets.UTF_8
  private val Cp1252 = java.nio.charset.Charset.forName("windows-1252")

  /** Repair targets, DERIVED not hand-typed: every Latin-1 high
    * character (U+00A0..U+00FF) plus every character Windows-1252
    * maps into bytes 0x80..0x9F (curly quotes, dashes, ellipsis,
    * euro, dagger, trademark, Š Ž œ Ÿ ...). Covering the full ranges
    * — not just a curated subset — is what lets pass 2 unwind
    * double-encoded text: the second decode scatters trail bytes
    * across the whole Â/Ã plane, so partial coverage strands
    * half-repaired pairs. Targets whose artifacts would contain an
    * unmappable CP1252 byte are filtered out and pinned below:
    * exactly Á Í Ï Ð Ý (trail bytes 81/8D/8F/90/9D) and the right
    * double quote '”' (E2 80 9D) — byte 0x9D decodes to U+FFFD, so
    * their artifacts cannot be expressed as clean pairs.
    */
  private val Candidates: Seq[Char] =
    (0xA0 until 0x100).map(_.toChar) ++
      new String((0x80 until 0xA0).map(_.toByte).toArray, Cp1252)
        .toSeq.filter(_ != '\uFFFD')

  private def roundTrips(c: Char): Boolean = {
    val a = artifactOf(c)
    a.length > 1 && !a.contains('\uFFFD') &&
      a.forall(ch => !ch.isControl && (ch < 0x7F || ch > 0x9F)) &&
      java.util.Arrays.equals(a.getBytes(Cp1252), c.toString.getBytes(Utf8))
  }

  private val (clean, rejected) = Candidates.partition(roundTrips)
  require(rejected.map(_.toInt).sorted == Seq(0xC1, 0xCD, 0xCF, 0xD0, 0xDD, 0x201D),
    s"unexpected CP1252 reject set: ${rejected.map(c => f"U+${c.toInt}%04X")}")

  private def artifactOf(c: Char): String = new String(c.toString.getBytes(Utf8), Cp1252)

  /** (artifact, target) pairs — 117 of them — longest artifact
    * first, then by artifact, for a deterministic order (3-byte
    * targets like curly quotes repair before 2-byte accents, so a
    * short repair can never strand the tail of a longer artifact).
    * Every artifact round-trips by construction, so the table is safe
    * to render into SQL literals and to fold into replace() chains.
    */
  val Pairs: Seq[(String, String)] =
    clean.map(c => (artifactOf(c), c.toString))
      .sortBy { case (a, _) => (-a.length, a) }

  /** One repair pass: fold the pair table through codegen'd
    * replace()s. Clean text is untouched (artifacts' lead chars
    * Ã/Â/â/etc. simply never match).
    */
  def fixOnce(text: Column): Column =
    Pairs.foldLeft(text) { case (acc, (artifact, target)) =>
      replace(acc, lit(artifact), lit(target))
    }

  /** Repair with `passes` applications — pass 2 unwinds
    * double-encoded text (UTF-8 mis-decoded, re-encoded, mis-decoded
    * again), the second-most-common corruption in crawls. Passes
    * beyond the corruption depth are identity, so over-passing is
    * safe, just wasted codegen width.
    */
  def fix(text: Column, passes: Int = 1): Column = {
    require(passes >= 1 && passes <= 3, s"passes must be in [1,3], got $passes")
    (1 to passes).foldLeft(text)((acc, _) => fixOnce(acc))
  }

  /** Characters removed by repair — every pair shrinks the string, so
    * `length(text) - length(fix(text))` is a cheap corruption
    * severity signal (0 = clean) without a second scan.
    */
  def removedChars(text: Column, passes: Int = 1): Column =
    (length(text) - length(fix(text, passes))).cast("int")
}
