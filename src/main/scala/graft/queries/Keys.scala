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
}
