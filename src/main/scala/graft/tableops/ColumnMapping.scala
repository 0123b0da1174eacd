package graft.tableops

import java.nio.charset.StandardCharsets.UTF_8

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.Expression

/** Column-mapping DDL state — the mechanism behind ZERO-REWRITE
  * `renameColumn` / `dropColumn` (the Delta/Iceberg column-mapping
  * idea, re-derived for this manifest): data files keep the PHYSICAL
  * column names they were written with forever; the manifest carries an
  * ordered op list mapping physical → logical, and
  *
  *  - READS reconcile physical → logical after the scan (one global
  *    rename/drop projection — every live file shares physical names,
  *    so there are no per-file epochs and the scan stays ONE parquet
  *    relation with pushdown intact);
  *  - WRITES translate logical → physical before the scan-side write,
  *    so new files land under the same physical names old files carry.
  *
  * At 100 TB this is the only acceptable rename: the rewrite
  * alternative is a full-table pass for a metadata concept.
  *
  * Ops serialize space-free into one table property
  * (`P graft.ddl <v,kind,b64,b64;…>`), each tagged with its commit
  * VERSION — replay at `upTo` naturally yields the mapping AS OF that
  * version, which is what makes time travel read old versions under
  * their then-current logical names.
  *
  * Dropped physical names are tombstoned: the name stays retired (a
  * later write re-introducing it is rejected), because old files still
  * carry the column and a same-named newcomer would un-hide it.
  */
private[tableops] object DdlOps {
  val Key = "graft.ddl"

  /** One op: `rename` sets the logical name of `physical` to `name`;
    * `drop` tombstones `physical` (`name` unused, stored empty).
    */
  final case class Op(v: Long, kind: String, physical: String, name: String)

  /** Folded view as of a version: logical→physical for RENAMED columns
    * only, plus the dropped physical tombstones.
    */
  final case class Mapping(toPhysical: Map[String, String],
      dropped: Set[String]) {
    def toLogical: Map[String, String] = toPhysical.map(_.swap)
    def isEmpty: Boolean = toPhysical.isEmpty && dropped.isEmpty
  }
  val EmptyMapping: Mapping = Mapping(Map.empty, Set.empty)

  private def b64e(s: String): String =
    java.util.Base64.getEncoder.encodeToString(s.getBytes(UTF_8))
  private def b64d(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), UTF_8)

  def encode(ops: Seq[Op]): String =
    ops.map(o => s"${o.v},${o.kind},${b64e(o.physical)},${b64e(o.name)}")
      .mkString(";")

  def decode(prop: Option[String]): Seq[Op] =
    prop.toSeq.filter(_.nonEmpty).flatMap(_.split(';').toSeq.map { tok =>
      val Array(v, kind, p, n) = tok.split(",", -1)
      Op(v.toLong, kind, b64d(p), b64d(n))
    })

  /** Fold ops committed at-or-before `upTo` into the effective mapping:
    * the LATEST rename of a physical wins; drop removes its rename and
    * tombstones the physical.
    */
  def mappingAt(ops: Seq[Op], upTo: Long): Mapping = {
    var byPhysical = Map.empty[String, String]
    var dropped = Set.empty[String]
    ops.filter(_.v <= upTo).sortBy(_.v).foreach {
      case Op(_, "rename", p, l) => byPhysical += (p -> l)
      case Op(_, "drop", p, _) =>
        byPhysical -= p
        dropped += p
      case Op(_, k, _, _) =>
        throw new IllegalStateException(s"unknown ddl op kind: $k")
    }
    // identity renames (renamed back to the physical name) drop out
    val renames = byPhysical.filter { case (p, l) => p != l }
    Mapping(renames.map(_.swap), dropped)
  }

  /** Physical → logical reconciliation of a scanned frame. */
  def reconcileRead(df: DataFrame, m: Mapping): DataFrame = {
    if (m.isEmpty) return df
    val renamed = m.toLogical.foldLeft(df) { case (d, (p, l)) =>
      d.withColumnRenamed(p, l)
    }
    m.dropped.foldLeft(renamed)((d, p) => d.drop(p))
  }

  /** Logical → physical translation of a frame being written; rejects
    * frames that would collide with a tombstone or an in-use physical
    * name under a different logical one.
    */
  def translateWrite(df: DataFrame, m: Mapping): DataFrame = {
    if (m.isEmpty) return df
    val cols = df.columns.toSet
    val deadHits = cols.intersect(m.dropped)
    require(deadHits.isEmpty,
      s"write re-introduces dropped column(s) ${deadHits.mkString(", ")} " +
        "— a dropped physical name stays retired (old files still carry " +
        "it); migrate with a full rewrite if the name must return")
    val physInUse = m.toPhysical.values.toSet -- m.toPhysical.keySet
    val collisions = cols.intersect(physInUse)
    require(collisions.isEmpty,
      s"write uses physical name(s) ${collisions.mkString(", ")} that " +
        "back a renamed logical column — write under the logical name")
    m.toPhysical.foldLeft(df) { case (d, (l, p)) =>
      d.withColumnRenamed(l, p)
    }
  }

  /** Rewrite a predicate's attribute references logical → physical so
    * manifest stats/blooms (recorded under physical names) keep
    * pruning under renames. Unmapped names pass through.
    */
  def toPhysicalPred(e: Expression, m: Mapping): Expression =
    if (m.toPhysical.isEmpty) e
    else e.transform {
      case a: UnresolvedAttribute if m.toPhysical.contains(a.name) =>
        UnresolvedAttribute.quoted(m.toPhysical(a.name))
    }
}
