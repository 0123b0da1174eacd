package graft.tableops

import java.util.concurrent.ConcurrentHashMap

import org.apache.hadoop.fs.{FileSystem, Path}

/** Conditional-put commit publishing for object stores — the missing
  * third leg of [[LogPublisher]] (link(2) on local, no-overwrite rename
  * on HDFS, and THIS on stores where rename is copy+delete and never
  * exclusive).
  *
  * Real object stores expose an atomic create-if-absent write: S3
  * `PutObject` with `If-None-Match: *`, GCS `insert` with
  * `ifGenerationMatch=0`, ABFS `Create` with a `*` ETag precondition.
  * One such call both DECIDES the race and LANDS the bytes — exactly
  * the `publish` contract (of N concurrent publishes of one dest,
  * exactly one true). A production binding implements [[CasKeySpace]]
  * over that store call (reference deployment reality:
  * etl-gardener runs against GCS archives, tracker/job.go:100-107).
  *
  * [[ConditionalPutPublisher]] splits the same semantics over two steps
  * so it can be driven through any Hadoop FileSystem in tests:
  * the CAS decision comes from the key space (linearizable, exactly one
  * winner per key), and only the winner copies the commit-log bytes to
  * `dest` — losers never touch the destination, so a half-written
  * object can only come from a winner that died mid-copy, which is the
  * same "commit never became visible" crash window a native
  * conditional PUT has on the client side.
  */
trait CasKeySpace {
  /** Atomically claim `key`: true for exactly one caller ever.
    *
    * PRODUCTION BINDING CONTRACT: implement `claim` AS the destination
    * object's native conditional PUT (claim succeeds ⇔ the commit bytes
    * land), never as a separate key/marker. Under a split binding a
    * winner that dies between claiming and writing the destination
    * wedges that version forever — the claim is burned, so every later
    * publish of the same dest returns false while replay still resolves
    * v−1: a livelock no retry escapes. The two-step
    * [[ConditionalPutPublisher]] below is a TEST vehicle only, safe
    * because its in-memory key space dies with the crashed process.
    */
  def claim(key: String): Boolean
}

/** In-JVM linearizable key space: the decision is a single
  * ConcurrentHashMap#putIfAbsent. Shared by every "driver" in a
  * process the way a bucket's conditional-PUT namespace is shared by
  * every writer of a real deployment.
  */
final class InMemoryCasKeySpace extends CasKeySpace {
  private val keys = new ConcurrentHashMap[String, java.lang.Boolean]()
  def claim(key: String): Boolean = keys.putIfAbsent(key, true) == null
  def size: Int = keys.size
}

/** [[LogPublisher]] over a [[CasKeySpace]]: the key space decides, the
  * winner writes through. Two invariants, both load-bearing:
  *
  *  1. SECOND FENCE: a destination that already exists on the
  *     underlying store (e.g. committed by an earlier process the
  *     in-memory key space never saw) turns a fresh claim into a loss
  *     instead of an overwrite — a lost update is the one unrecoverable
  *     outcome and both fences must fail for one to happen.
  *  2. ATOMIC VISIBILITY: `dest` is either absent or COMPLETE, never
  *     empty/partial. A native conditional PUT gives whole-object-or-
  *     nothing visibility; the old create(dest)-then-copyBytes shape
  *     here did not — on any store whose create is immediately listable
  *     the destination was visible EMPTY mid-copy, and a concurrent
  *     manifest replay parsed the truncated text into a state missing
  *     the commit's files (a committed partition silently vanished —
  *     the round-12 lost-partition regression, made permanent by the
  *     replay state cache). Now the winner stages the full bytes under
  *     a dot-name the commit-log listing never matches, then renames
  *     over `dest`: post-CAS the winner is exclusive on `dest`, so the
  *     rename can never clobber a racing commit, and rename on the
  *     local stores backing the test schemes is a single atomic
  *     metadata op — `dest` appears with all its bytes or not at all.
  */
final class ConditionalPutPublisher(space: CasKeySpace) extends LogPublisher {
  def publish(f: FileSystem, tmp: Path, dest: Path): Boolean = {
    if (!space.claim(dest.toUri.toString)) false
    else if (f.exists(dest)) false // second fence: earlier-process commit
    else {
      val stage =
        new Path(dest.getParent, s".put-${java.util.UUID.randomUUID()}")
      val out = f.create(stage, /* overwrite = */ false)
      val in = f.open(tmp)
      try org.apache.hadoop.io.IOUtils.copyBytes(in, out, 8192, true)
      finally { /* streams closed by copyBytes(close = true) */ }
      val won = f.rename(stage, dest)
      if (!won) f.delete(stage, false) // defensive: post-CAS this is ours
      won
    }
  }
}
