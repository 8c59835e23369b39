package graft.sources

/** The ONE mapping from typed column values to the manifest's LONG
  * stats bands, shared by every producer and consumer so they can never
  * disagree: the executor-side parquet writers fold these keys inline
  * ([[SnapshotParquetWriter]]), the Scala commit path derives them from
  * native min/max aggregates ([[SnapshotTable]]'s writeDataFiles), and
  * the read side turns pushed filter literals into [lo, hi] bands
  * ([[SnapshotBatch.bandOf]]).
  *
  * Band semantics per type (`exact` = the key function is INJECTIVE and
  * order-preserving, so a band is the predicate's exact truth set over
  * non-null values — required by metadata deletes and replaceWhere
  * ranges; lossy keys are monotonic only, sound for file PRUNING but
  * never for "fully-inside ⇒ every row matches" proofs):
  *
  *  - integral/boolean: the value itself — exact;
  *  - DATE: days since epoch — exact (the daily-reload pruning case:
  *    the reference's models are date-keyed, `fb_meta_ads_transformed
  *    .sql:6`, `mms_lb_staged.sql:1`);
  *  - TIMESTAMP: floor epoch SECONDS (Spark's own ts→long cast) —
  *    lossy below one second, monotonic (floor preserves ≤), so range
  *    pruning is sound and sub-second neighbors simply share a band;
  *  - STRING: the first 8 UTF-8 bytes as an order-preserving signed
  *    long (big-endian unsigned, sign bit flipped — the Iceberg
  *    truncate(8) idea in one word). Monotonic because unsigned
  *    bytewise comparison of the 8-byte prefix is the first stage of
  *    UTF8String's own comparison; lossy because longer strings share
  *    their prefix's key. The empty string keys to the unknown-MIN
  *    sentinel and an 8×0xFF prefix to unknown-MAX: such files simply
  *    read as stats-unknown — never pruned, conservatively correct.
  */
object BandKeys {

  /** Order-preserving key of a UTF-8 byte sequence's first 8 bytes. */
  def stringKey(bytes: Array[Byte]): Long = {
    var raw = 0L
    var i = 0
    while (i < 8) {
      raw = (raw << 8) | (if (i < bytes.length) bytes(i) & 0xFFL else 0L)
      i += 1
    }
    raw ^ Long.MinValue
  }

  def stringKey(s: String): Long = stringKey(s.getBytes("UTF-8"))

  /** Upper band bound for `starts with prefix`: the prefix's first 8
    * bytes padded with 0xFF — every string starting with the prefix
    * keys at or below it (and at or above [[stringKey]](prefix)). */
  def stringPrefixHi(prefix: String): Long = {
    val bytes = prefix.getBytes("UTF-8")
    var raw = 0L
    var i = 0
    while (i < 8) {
      raw = (raw << 8) | (if (i < bytes.length) bytes(i) & 0xFFL else 0xFFL)
      i += 1
    }
    raw ^ Long.MinValue
  }

  /** A filter literal / collected aggregate value as (band key, exact).
    * None = the type has no band mapping (derive nothing, prune
    * nothing — sound). Handles both the legacy java.sql and the
    * java8 datetime literal families Spark hands to V1 filters. */
  def valueKey(v: Any): Option[(Long, Boolean)] = v match {
    case i: Int => Some((i.toLong, true))
    case l: Long => Some((l, true))
    case s: Short => Some((s.toLong, true))
    case b: Byte => Some((b.toLong, true))
    case b: Boolean => Some((if (b) 1L else 0L, true))
    case d: java.sql.Date => Some((d.toLocalDate.toEpochDay, true))
    case d: java.time.LocalDate => Some((d.toEpochDay, true))
    case t: java.sql.Timestamp => Some((Math.floorDiv(t.getTime, 1000L), false))
    case t: java.time.Instant => Some((Math.floorDiv(t.toEpochMilli, 1000L), false))
    case s: String => Some((stringKey(s), false))
    case u: org.apache.spark.unsafe.types.UTF8String =>
      Some((stringKey(u.getBytes), false))
    case _ => None
  }
}
