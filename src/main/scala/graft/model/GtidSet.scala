package graft.model

import java.util.UUID

/** An executed-GTID set — the content-addressed replication cursor
  * (reference: canal/core/gtid/GTIDSet.java + MysqlGTIDSet.java, wired
  * through canal/core/dump/MysqlConnection.java for auto-position
  * dumps). Per source UUID (SID) a sorted, disjoint list of `[start,
  * end)` GNO intervals; the whole value is immutable.
  *
  * Three public spellings, all interconvertible:
  *  - text: `"uuid:1-5:8,uuid2:3"` (MySQL's SHOW MASTER STATUS form;
  *    a bare `n` is the singleton interval `n-n`)
  *  - binary: `n_sids(8 LE)` then per SID `sid(16, big-endian halves)
  *    + n_intervals(8 LE) + (start(8 LE), end(8 LE))*` with `end`
  *    EXCLUSIVE — exactly the PREVIOUS_GTIDS event body
  *    ([[graft.sinks.BinlogWire.previousGtidsEvent]]) and the payload
  *    COM_BINLOG_DUMP_GTID carries
  *  - the value itself, for set algebra (`contains`/`add`/`union`)
  *
  * Why a set and not (file, pos): a GTID names a TRANSACTION, not a
  * byte address, so the cursor survives anything that renames or
  * renumbers the log — source failover, binlog purges, a relay
  * rewriting file names — which is exactly when a (file, pos) cursor
  * answers error 1236.
  *
  * Size note: with this engine's gno := tso convention, the interval
  * count equals the number of non-adjacent tso RUNS a consumer has
  * executed — contiguous history (the standing replica's steady
  * state) stays one interval per SID; a consumer skipping around a
  * sparse tso space grows O(gaps). The text/binary spellings (and
  * the PREVIOUS_GTIDS events carrying them) are O(intervals).
  *
  * INVARIANT (enforced at construction — the companion `apply`
  * normalizes): per SID the intervals are sorted, disjoint,
  * non-touching, non-empty, and a SID with no intervals is absent.
  * `contains`/`isSubsetOf` and structural equality all assume it, so
  * the constructor is private — `GtidSet(Map(sid -> Vector((5,3),
  * (1,2),(1,4))))` canonicalizes instead of silently mis-answering. */
final case class GtidSet private (sets: Map[UUID, Vector[(Long, Long)]]) {

  def isEmpty: Boolean = sets.isEmpty

  def contains(sid: UUID, gno: Long): Boolean = {
    // binary search over the sorted disjoint intervals — callers probe
    // per TRANSACTION (drain cursors, coverage checks, server skip
    // filters), and a sparse tso space legitimately holds 10^5+
    // intervals (a fan-out stream carries only its share of the global
    // sequence), so a linear probe here turns O(n) drains into O(n^2)
    val ivs = sets.getOrElse(sid, Vector.empty)
    var lo = 0
    var hi = ivs.length - 1
    var res = false
    while (lo <= hi) {
      val mid = (lo + hi) >>> 1
      val (s, e) = ivs(mid)
      if (gno < s) hi = mid - 1
      else if (gno >= e) lo = mid + 1
      else { res = true; lo = hi + 1 }
    }
    res
  }

  def contains(gtid: String): Boolean = {
    val i = gtid.lastIndexOf(':')
    require(i > 0, s"malformed GTID '$gtid'")
    contains(UUID.fromString(gtid.substring(0, i)),
      gtid.substring(i + 1).toLong)
  }

  /** This set plus one transaction (adjacent intervals coalesce). */
  def add(sid: UUID, gno: Long): GtidSet =
    if (contains(sid, gno)) this
    else GtidSet(sets.updated(sid,
      sets.getOrElse(sid, Vector.empty) :+ ((gno, gno + 1))))

  def union(other: GtidSet): GtidSet =
    GtidSet((sets.keySet ++ other.sets.keySet).map { sid =>
      sid -> (sets.getOrElse(sid, Vector.empty) ++
        other.sets.getOrElse(sid, Vector.empty))
    }.toMap)

  def isSubsetOf(other: GtidSet): Boolean =
    sets.forall { case (sid, ivs) =>
      // normalized intervals are disjoint and non-touching, so a
      // contained interval must sit inside ONE interval of the other —
      // interval algebra (binary-searched), never a per-GNO loop
      val oivs = other.sets.getOrElse(sid, Vector.empty)
      ivs.forall { case (s, e) =>
        var lo = 0
        var hi = oivs.length - 1
        var ok = false
        while (lo <= hi) {
          val mid = (lo + hi) >>> 1
          val (os, oe) = oivs(mid)
          if (s < os) hi = mid - 1
          else if (s >= oe) lo = mid + 1
          else { ok = e <= oe; lo = hi + 1 }
        }
        ok
      }
    }

  /** Number of transactions the set names — sum of interval widths.
    * O(intervals); the lag metric `|server tip| - |consumed|` between
    * two monotone sets of the same history. */
  def gnoCount: Long =
    sets.valuesIterator.flatten.map { case (s, e) => e - s }.sum

  /** MySQL text form: SIDs sorted, intervals as `start-last` (INCLUSIVE
    * last, singletons bare) — what SHOW MASTER STATUS prints. */
  def text: String =
    sets.toSeq.sortBy(_._1.toString).map { case (sid, ivs) =>
      sid.toString + ivs.map { case (s, e) =>
        if (e == s + 1) s":$s" else s":$s-${e - 1}"
      }.mkString
    }.mkString(",")

  /** The PREVIOUS_GTIDS / COM_BINLOG_DUMP_GTID binary layout. */
  def encode: Array[Byte] = {
    def le(v: Long, n: Int): Array[Byte] =
      (0 until n).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    def be(v: Long): Array[Byte] =
      (7 to 0 by -1).map(i => ((v >> (8 * i)) & 0xFF).toByte).toArray
    val out = Array.newBuilder[Byte]
    val ordered = sets.toSeq.sortBy(_._1.toString)
    out ++= le(ordered.size.toLong, 8)
    ordered.foreach { case (sid, ivs) =>
      out ++= be(sid.getMostSignificantBits) ++
        be(sid.getLeastSignificantBits) ++ le(ivs.size.toLong, 8)
      ivs.foreach { case (s, e) => out ++= le(s, 8) ++ le(e, 8) }
    }
    out.result()
  }
}

object GtidSet {

  /** THE constructor: canonicalizes arbitrary interval input — empty
    * intervals drop, overlapping/touching ones coalesce, SIDs left
    * with nothing disappear — so every live GtidSet holds the class
    * invariant and structurally-equal sets are `==`. Idempotent on
    * already-normal input (the internal algebra round-trips freely). */
  def apply(sets: Map[UUID, Vector[(Long, Long)]]): GtidSet =
    new GtidSet(sets.view.mapValues(normalize).filter(_._2.nonEmpty).toMap)

  private def normalize(ivs: Vector[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ivs.filter { case (s, e) => e > s }.sortBy(_._1)
    sorted.foldLeft(Vector.empty[(Long, Long)]) {
      case (acc :+ ((ps, pe)), (s, e)) if s <= pe =>
        acc :+ ((ps, math.max(pe, e)))
      case (acc, iv) => acc :+ iv
    }
  }

  val Empty: GtidSet = GtidSet(Map.empty)

  /** Mutable BULK accumulator: O(log intervals) per [[add]] via a
    * per-SID TreeMap, vs the immutable [[GtidSet.add]]'s full
    * re-normalization per call. The difference is structural at scale:
    * a fan-out stream's gno space is SPARSE (it carries only its share
    * of the global tso sequence), so a per-transaction immutable add
    * over a long drain is O(n²) in intervals — the scale-rehearsal
    * consume stage measured 14 min of one pinned core at 3·10^5 txns
    * before this existed. Every per-event accumulation loop (drain
    * cursors, wire-writer gno gathers, catalog executed-set folds)
    * must build here and [[Builder.result]] once. */
  final class Builder private[GtidSet] (seed: GtidSet) {
    private val sets = scala.collection.mutable.Map[UUID,
      java.util.TreeMap[java.lang.Long, java.lang.Long]]()
    seed.sets.foreach { case (sid, ivs) =>
      val m = new java.util.TreeMap[java.lang.Long, java.lang.Long]()
      ivs.foreach { case (s, e) => m.put(s, e) }
      sets(sid) = m
    }

    def add(sid: UUID, gno: Long): this.type = {
      val m = sets.getOrElseUpdate(sid,
        new java.util.TreeMap[java.lang.Long, java.lang.Long]())
      val fl = m.floorEntry(gno)
      if (fl != null && fl.getValue.longValue > gno) this // contained
      else if (fl != null && fl.getValue.longValue == gno) {
        // extends the floor interval; coalesce with a successor that
        // starts exactly at gno+1
        val nxt = m.get(gno + 1)
        if (nxt != null) { m.remove(gno + 1); m.put(fl.getKey, nxt) }
        else m.put(fl.getKey, java.lang.Long.valueOf(gno + 1))
        this
      } else {
        val nxt = m.get(gno + 1)
        if (nxt != null) { m.remove(gno + 1); m.put(gno, nxt) }
        else m.put(gno, java.lang.Long.valueOf(gno + 1))
        this
      }
    }

    /** Insert the interval [lo, hiExcl), coalescing overlapping and
      * touching neighbors — O(log n + removed). */
    def addRange(sid: UUID, lo: Long, hiExcl: Long): this.type = {
      require(hiExcl > lo, s"empty range [$lo, $hiExcl)")
      val m = sets.getOrElseUpdate(sid,
        new java.util.TreeMap[java.lang.Long, java.lang.Long]())
      var s = lo
      var e = hiExcl
      val fl = m.floorEntry(s)
      if (fl != null && fl.getValue.longValue >= s) {
        s = math.min(s, fl.getKey.longValue)
        e = math.max(e, fl.getValue.longValue)
        m.remove(fl.getKey)
      }
      var nx = m.ceilingEntry(s)
      while (nx != null && nx.getKey.longValue <= e) {
        e = math.max(e, nx.getValue.longValue)
        m.remove(nx.getKey)
        nx = m.ceilingEntry(s)
      }
      m.put(s, e)
      this
    }

    def contains(sid: UUID, gno: Long): Boolean =
      sets.get(sid).exists { m =>
        val fl = m.floorEntry(gno)
        fl != null && fl.getValue.longValue > gno
      }

    def result(): GtidSet = {
      import scala.jdk.CollectionConverters._
      GtidSet(sets.map { case (sid, m) =>
        sid -> m.entrySet().iterator().asScala
          .map(e => (e.getKey.longValue, e.getValue.longValue)).toVector
      }.toMap)
    }
  }

  def builder(seed: GtidSet = Empty): Builder = new Builder(seed)

  def of(gtids: String*): GtidSet =
    gtids.foldLeft(Empty) { (acc, g) =>
      val i = g.lastIndexOf(':')
      acc.add(UUID.fromString(g.substring(0, i)), g.substring(i + 1).toLong)
    }

  /** Parse the MySQL text form (inclusive `start-last` ranges).
    * Entries UNION — a SID repeated across comma-separated entries
    * keeps every interval (a Map build would silently last-win, and a
    * forgotten executed interval means a re-served transaction). */
  def parse(text: String): GtidSet =
    if (text.trim.isEmpty) Empty
    else text.split(",").map(_.trim).filter(_.nonEmpty)
      .foldLeft(Empty) { (acc, part) =>
        val toks = part.split(":")
        require(toks.length >= 2, s"malformed GTID set entry '$part'")
        val sid = UUID.fromString(toks.head)
        val ivs = toks.tail.toVector.map { r =>
          r.split("-") match {
            case Array(s) => (s.toLong, s.toLong + 1)
            case Array(s, l) => (s.toLong, l.toLong + 1)
            case _ => throw new IllegalArgumentException(
              s"malformed GTID interval '$r'")
          }
        }
        acc.union(GtidSet(Map(sid -> ivs)))
      }

  /** Decode the binary layout (see [[GtidSet.encode]]); duplicate SID
    * entries union, like [[parse]]. */
  def decode(bytes: Array[Byte]): GtidSet = {
    var i = 0
    def le(n: Int): Long = {
      val v = (0 until n).map(k => (bytes(i + k) & 0xFFL) << (8 * k)).sum
      i += n; v
    }
    def be(n: Int): Long = {
      val v = (0 until n).foldLeft(0L)((acc, k) =>
        (acc << 8) | (bytes(i + k) & 0xFFL))
      i += n; v
    }
    val nSids = le(8)
    (0L until nSids).foldLeft(Empty) { (acc, _) =>
      val sid = new UUID(be(8), be(8))
      val nIvs = le(8)
      acc.union(GtidSet(Map(
        sid -> (0L until nIvs).map(_ => (le(8), le(8))).toVector)))
    }
  }
}
