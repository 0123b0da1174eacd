package graft.tableops

/** Deletion-vector payload codec for the tx manifest's `D` lines —
  * the merge-on-read counterpart of [[FileStats]]/[[FileBloom]]:
  * `D <payload> <rel>` attaches to live file `rel` the sorted set of
  * ROW ORDINALS (0-based physical positions, the parquet reader's
  * `_metadata.row_index` domain) whose rows are logically deleted.
  * Readers apply the vector at scan time; a rewrite (`R rel`) retires
  * it with the file; compaction folds it back into data bytes.
  *
  * Reference points (public designs): Delta Lake deletion vectors and
  * Iceberg v2 position deletes — both store per-file deleted-position
  * sets consulted at read so a k-row delete costs O(k), not a file
  * rewrite.
  *
  * Encoding: positions sorted ascending, delta-compressed
  * (`pos₀, pos₁−pos₀, …`), each delta as a protobuf-style varint,
  * base64 (space-free — the manifest token contract). A million
  * scattered deletions in a 100M-row file cost ~4 bytes each before
  * base64; dense runs cost ~1. The payload is REPLACED whole on each
  * new delete commit (`D` is last-one-wins per rel, like `S`/`B`), so
  * merging old+new positions happens at commit build time, inside the
  * optimistic-retry loop that re-reads fresh state.
  */
object FileDv {

  /** Sorted distinct positions → payload token. Empty input is the
    * caller's bug (never commit an empty vector — absence IS empty).
    */
  def encode(positions: Array[Long]): String = {
    require(positions.nonEmpty, "empty deletion vector")
    val out = new java.io.ByteArrayOutputStream(positions.length * 2)
    var prev = 0L
    var i = 0
    while (i < positions.length) {
      var v = positions(i) - prev
      require(v >= (if (i == 0) 0L else 1L),
        "positions must be sorted ascending and distinct")
      prev = positions(i)
      while ((v & ~0x7fL) != 0L) {
        out.write(((v & 0x7f) | 0x80).toInt); v >>>= 7
      }
      out.write(v.toInt)
      i += 1
    }
    java.util.Base64.getEncoder.encodeToString(out.toByteArray)
  }

  /** Payload token → sorted positions. Malformed payloads (foreign
    * writers, truncation) throw — a DV that cannot be decoded MUST
    * fail the read rather than silently resurrect deleted rows.
    */
  def decode(payload: String): Array[Long] = {
    val bytes = java.util.Base64.getDecoder.decode(payload)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    var acc = 0L
    var shift = 0
    var prev = 0L
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      acc |= (b & 0x7fL) << shift
      if ((b & 0x80) == 0) {
        prev += acc
        out += prev
        acc = 0L; shift = 0
      } else shift += 7
      i += 1
    }
    require(shift == 0, s"truncated deletion-vector payload")
    out.toArray
  }

  /** Deleted-row count without materializing positions as longs —
    * varint terminators are the non-continuation bytes.
    */
  def cardinality(payload: String): Long = {
    val bytes = java.util.Base64.getDecoder.decode(payload)
    var n = 0L
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0x80) == 0) n += 1
      i += 1
    }
    n
  }

  /** Union of an existing payload (if any) with new positions. */
  def merge(existing: Option[String], add: Array[Long]): String = {
    val all = existing match {
      case Some(p) => (decode(p) ++ add).distinct.sorted
      case None => add.distinct.sorted
    }
    encode(all)
  }
}
