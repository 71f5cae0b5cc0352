package graft.model

import java.util.UUID

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** `GtidSet` algebra laws over random sets (pure Scala, no Spark):
  * the cursor's correctness rests on these — a union that lost a GNO
  * would re-serve a transaction, a contains that over-claimed would
  * drop one. */
object GtidSetProps extends Properties("gtid-set") {

  private val sidGen: Gen[UUID] =
    Gen.oneOf(
      UUID.fromString("00000000-0000-0000-0000-000000000001"),
      UUID.fromString("00000000-0000-0000-0000-000000000002"),
      UUID.fromString("00000000-0000-0000-0000-000000000003"))

  private val gnoGen: Gen[Long] = Gen.chooseNum(1L, 60L)

  private val setGen: Gen[GtidSet] =
    Gen.listOf(Gen.zip(sidGen, gnoGen)).map(_.foldLeft(GtidSet.Empty) {
      case (acc, (sid, gno)) => acc.add(sid, gno)
    })

  private def members(s: GtidSet): Set[(UUID, Long)] =
    s.sets.toSeq.flatMap { case (sid, ivs) =>
      ivs.flatMap { case (lo, hi) => (lo until hi).map(sid -> _) }
    }.toSet

  property("add == set insertion (contains agrees with the member set)") =
    forAll(setGen, sidGen, gnoGen) { (s, sid, gno) =>
      val m = members(s.add(sid, gno))
      m == members(s) + (sid -> gno) &&
        m.forall { case (u, g) => s.add(sid, gno).contains(u, g) }
    }

  property("union is the member-set union; commutative and idempotent") =
    forAll(setGen, setGen) { (a, b) =>
      val u = a.union(b)
      members(u) == members(a) ++ members(b) &&
        u == b.union(a) && u.union(u) == u && a.union(a) == a
    }

  property("isSubsetOf == member-set subset") =
    forAll(setGen, setGen) { (a, b) =>
      a.isSubsetOf(b) == members(a).subsetOf(members(b))
    }

  property("text and binary spellings round-trip") =
    forAll(setGen) { s =>
      GtidSet.parse(s.text) == s && GtidSet.decode(s.encode) == s
    }

  // arbitrary UNNORMALIZED constructor input: overlapping, touching,
  // out-of-order, empty and inverted intervals — the r10-advisory case
  // GtidSet(Map(sid -> Vector((5,3),(1,2),(1,4)))) generalized
  private val rawIvsGen: Gen[Vector[(Long, Long)]] =
    Gen.listOf(Gen.zip(gnoGen, gnoGen)).map(_.toVector)

  private val rawSetGen: Gen[GtidSet] =
    Gen.mapOf(Gen.zip(sidGen, rawIvsGen)).map(GtidSet(_))

  private def rawMembers(raw: Map[UUID, Vector[(Long, Long)]])
      : Set[(UUID, Long)] =
    raw.toSeq.flatMap { case (sid, ivs) =>
      ivs.flatMap { case (lo, hi) => (lo until hi).map(sid -> _) }
    }.toSet

  property("construction canonicalizes arbitrary interval input") =
    forAll(Gen.mapOf(Gen.zip(sidGen, rawIvsGen))) { raw =>
      val s = GtidSet(raw)
      members(s) == rawMembers(raw) &&
        s.sets.values.forall(_.nonEmpty) &&
        s.sets.values.forall { ivs =>
          ivs.forall { case (lo, hi) => hi > lo } &&
            ivs.sliding(2).forall {
              case Seq((_, pe), (ns, _)) => ns > pe
              case _ => true
            }
        }
    }

  property("algebra laws hold for unnormalized-input sets") =
    forAll(rawSetGen, rawSetGen) { (a, b) =>
      members(a.union(b)) == members(a) ++ members(b) &&
        a.isSubsetOf(b) == members(a).subsetOf(members(b)) &&
        GtidSet.parse(a.text) == a && GtidSet.decode(a.encode) == a
    }

  property("intervals stay normalized: sorted, disjoint, non-touching") =
    forAll(setGen) { s =>
      s.sets.values.forall { ivs =>
        ivs.forall { case (lo, hi) => hi > lo } &&
          ivs.sliding(2).forall {
            case Seq((_, pe), (ns, _)) => ns > pe // gap, never touching
            case _ => true
          }
      }
    }

  // the BULK builder (the O(log n)-per-add path every drain/gather
  // loop uses) must agree with the immutable fold exactly — same
  // members, same normal form, and contains() answers mid-build
  property("Builder == immutable add fold (seeded and unseeded)") =
    forAll(setGen, Gen.listOf(Gen.zip(sidGen, gnoGen))) { (seed, adds) =>
      val b = GtidSet.builder(seed)
      adds.foreach { case (sid, gno) => b.add(sid, gno) }
      val viaBuilder = b.result()
      val viaFold = adds.foldLeft(seed) {
        case (acc, (sid, gno)) => acc.add(sid, gno)
      }
      viaBuilder == viaFold &&
        adds.forall { case (sid, gno) => b.contains(sid, gno) } &&
        members(viaBuilder) == members(seed) ++
          adds.map { case (s, g) => (s, g) }.toSet
    }
}
