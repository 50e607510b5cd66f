package graft.queries

/** Tie-free composite argmax/argmin keys, centralized.
  *
  * Several queries pick one row per group deterministically via
  * `max_by(x, key)` (Spark) / `arg_max(x, key)` (DuckDB) where `key` is a
  * zero-padded decimal concatenation — the only argmax ordering that is
  * bit-identical across both engines (struct orderings are not available to
  * DuckDB 1.0's arg_max, see CLAUDE.md). Zero-padding needs a digit width,
  * and a silently-too-narrow width mis-sorts instead of failing (round-5
  * VERDICT finding #4: ad-hoc `lpad(…, 10, '0')` keys assumed doc_id < 1e10).
  *
  * This object is the ONLY place such keys may be built (CatalogSpec asserts
  * no ad-hoc `lpad(cast…` key construction elsewhere):
  *   - the Spark dialect GUARDS the declared width at runtime — a value
  *     outside [0, 10^width) raises with the offending value instead of
  *     producing a wrong winner;
  *   - the descending component derives its inversion constant from the
  *     width (10^width - 1) instead of a per-call-site magic number.
  *
  * The oracle (DuckDB) dialect is unguarded: the oracle is ground truth, and
  * the guard must not change the Spark result against it — a monotonic key
  * transform never changes the argmax winner.
  */
object Keys {
  private def nines(width: Int): String = "9" * width

  private def guarded(e: String, width: Int, body: String): String = {
    val m = nines(width)
    s"if(($e) between 0 and $m, $body, " +
      s"cast(raise_error(concat('Keys: value out of $width-digit key " +
      s"range: ', cast(($e) as string))) as bigint))"
  }

  /** Spark dialect: zero-padded ascending component (larger value sorts
    * later). Raises at runtime if `e` does not fit `width` digits. */
  def asc(e: String, width: Int): String =
    s"lpad(cast(${guarded(e, width, e)} as string), $width, '0')"

  /** Spark dialect: zero-padded descending component (SMALLER value sorts
    * later — the tie-break shape "largest metric, then smallest id").
    * Inversion constant is derived from the width. */
  def desc(e: String, width: Int): String = {
    val m = nines(width)
    s"lpad(cast(${guarded(e, width, s"$m - ($e)")} as string), $width, '0')"
  }

  /** Spark dialect: concatenate components into one comparable key. */
  def key(parts: String*): String = parts.mkString("concat(", ", ", ")")

  /** DuckDB (oracle) dialect of [[asc]]. */
  def oAsc(e: String, width: Int): String =
    s"lpad(CAST($e AS VARCHAR), $width, '0')"

  /** DuckDB (oracle) dialect of [[desc]]. */
  def oDesc(e: String, width: Int): String =
    s"lpad(CAST(${nines(width)} - ($e) AS VARCHAR), $width, '0')"

  /** DuckDB (oracle) dialect of [[key]]. */
  def oKey(parts: String*): String = parts.mkString(" || ")

  // ---------------------------------------------------------------------
  // Scala-side score ordering (round-7 VERDICT #7): any operator that ranks
  // rows by a Double score and tie-breaks on a key MUST order scores through
  // these two helpers, not raw comparison operators:
  //   - primitive >/== make NaN neither beat nor lose, silently breaking the
  //     total order (round-5: a zero-norm embedding feeding cosine is enough
  //     to produce one);
  //   - java.lang.Double.compare fixes NaN (ranks it above +Infinity,
  //     deterministically) but ranks 0.0 above -0.0, while the SQL oracles'
  //     ORDER BY treats them equal and falls through to the key tie-break —
  //     a rounded -0.0 at a rank boundary then orders differently than
  //     DuckDB's row_number (round-6 ADVICE, first hit in GroupedTopK).
  // normalizeScore collapses the signed-zero pair; scoreCompare composes it
  // with Double.compare into the cross-engine-stable total order.

  /** Collapse -0.0 to 0.0 so signed zeros compare equal (and defer to the
    * caller's key tie-break), matching SQL ORDER BY semantics. */
  def normalizeScore(s: Double): Double = if (s == 0.0d) 0.0d else s

  /** Total order on scores: NaN above +Infinity (deterministic), signed
    * zeros equal. Use instead of raw `Double.compare` or `>` in any
    * score-ordered operator. */
  def scoreCompare(a: Double, b: Double): Int =
    java.lang.Double.compare(normalizeScore(a), normalizeScore(b))
}
