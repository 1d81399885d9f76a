package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops.ClientRotation
import graft.ops.ClientRotation.{Backoff, Client, Pool}

/** Fixture-backed reproduction of the reference's client-pool rotation
  * bookkeeping (macros/src/lib.rs:31-122, main/src/client.rs:24-55) on
  * scripted 429 sequences: lazy front-spawn at exhaustion, backoff-expiry
  * re-sorting, the 2^f·250ms-capped-at-10s sleep schedule, and the
  * 429-propagates-when-a-free-client-exists subtlety. No Spark session —
  * this is driver-side orchestration state. */
class ClientRotationSpec extends AnyFunSuite {

  private val abc = Seq("A", "B", "C")

  test("exhaustion spawns the next provider at the FRONT; rotation order matches the reference walk") {
    val p0 = ClientRotation.open(abc)
    assert(p0.order === Seq("A"), "pool opens on the first provider only")

    // call 1: A is limited (all live clients now in backoff) → spawn B at
    // the front, transparent retry serves from B
    val (p1, r1, ok1) = ClientRotation.call(p0, List(true, false))
    assert(ok1 && r1.isEmpty)
    assert(p1.order === Seq("B", "A"))
    assert(p1.clients(1).backoff.contains(Backoff(250L, 1)),
      "A holds a 250ms factor-1 backoff")
    assert(p1.slept === 0L, "a fresh spawn means no sleep")

    // call 2: B limited too → spawn C at the front
    val (p2, _, ok2) = ClientRotation.call(p1, List(true, false))
    assert(ok2 && p2.order === Seq("C", "B", "A"))

    // call 3: every provider live and limited in turn → no spawn left;
    // the pool sleeps out the soonest expiry between attempts and the
    // stable expiry re-sort rotates priority C→B→A
    val (p3, _, ok3) = ClientRotation.call(p2, List(true, true, true, false))
    assert(ok3)
    assert(p3.order === Seq("A", "B", "C"),
      "the surviving serve came from the soonest-expired client")
    assert(p3.slept === 250L,
      "only the first exhausted attempt had time left to sleep")
    assert(p3.clients(0).backoff.isEmpty, "success resets the server's backoff")
    // escalation factors survived on the others: C was limited twice
    assert(p3.clients.find(c => abc(c.id) == "C").get.backoff.map(_.factor)
      .contains(2))
  }

  test("a 429 with a backoff-free client behind it propagates; the rotation pays off on the NEXT call") {
    // clients: B serving, A free behind it (both previously reset)
    val pool = Pool(Seq("A", "B"), Vector(Client(1), Client(0)))
    val (p1, rest, ok) = ClientRotation.call(pool, List(true, false))
    assert(!ok, "the macro returns the limited result when a free client exists")
    assert(rest === List(false), "no transparent retry consumed the next outcome")
    assert(p1.order === Seq("A", "B"), "the free client rotated to the front")
    val (p2, _, ok2) = ClientRotation.call(p1, rest)
    assert(ok2 && p2.clients(0).id === 0, "the next call serves from A")
  }

  test("a failing spawn falls back to sleeping out the ladder (250, then 500)") {
    val p0 = ClientRotation.open(Seq("A", "B"), failingSpawns = Set(1))
    val (p1, _, ok) = ClientRotation.call(p0, List(true, true, false))
    assert(ok)
    assert(p1.order === Seq("A"), "no client ever spawned")
    assert(p1.slept === 250L + 500L,
      "two exhausted attempts slept the escalating schedule")
    assert(p1.clients(0).reqs === 3L, "every attempt hit the lone client")
  }

  test("the backoff schedule is 2^f·250ms capped at 10s — the same curve j3b prices per row") {
    assert((0 to 7).map(ClientRotation.backoffMillis)
      === Seq(250L, 500L, 1000L, 2000L, 4000L, 8000L, 10000L, 10000L))
    // a sustained 429 storm escalates the factor without bound: the cap
    // must hold where an unclamped shift would wrap negative (f ≥ 56/64)
    Seq(55, 56, 63, 64, 100, Int.MaxValue).foreach { f =>
      assert(ClientRotation.backoffMillis(f) === 10000L, s"factor $f")
    }
    // and a single-provider pool sleeps the capped ladder, never negative
    val (p, _) = ClientRotation.run(
      ClientRotation.open(Seq("only")), List.fill(70)(true) ++ List(false))
    assert(p.slept === (0 until 70).map(ClientRotation.backoffMillis).sum)
  }

  test("random 429 sequences preserve the pool invariants (seeded property)") {
    val rnd = new scala.util.Random(12)
    (0 until 200).foreach { trial =>
      val nProviders = 1 + rnd.nextInt(4)
      val providers = (0 until nProviders).map(i => s"p$i")
      val failing = (1 until nProviders).filter(_ => rnd.nextBoolean()).toSet
      var pool = ClientRotation.open(providers, failing)
      var consumed = 0
      (0 until 10).foreach { _ =>
        val outcomes = List.fill(1 + rnd.nextInt(6))(rnd.nextDouble() < 0.6) :+ false
        val (p2, rest, ok) = ClientRotation.call(pool, outcomes)
        consumed += outcomes.size - rest.size
        // ids: distinct, in-range, monotone spawn (0 always live)
        val ids = p2.clients.map(_.id)
        assert(ids.distinct.size === ids.size, s"trial $trial: dup clients $ids")
        assert(ids.forall(i => i >= 0 && i < nProviders), s"trial $trial: $ids")
        assert(ids.contains(0), s"trial $trial: first provider vanished")
        assert(p2.clients.size >= pool.clients.size, s"trial $trial: client lost")
        // the clock and sleep ledger only move forward
        assert(p2.now >= pool.now && p2.slept >= pool.slept, s"trial $trial")
        // every consumed outcome hit exactly one client attempt
        assert(p2.clients.map(_.reqs).sum === consumed, s"trial $trial")
        // a successful logical call leaves its server backoff-free at the head
        if (ok) assert(p2.clients(0).backoff.isEmpty, s"trial $trial")
        pool = p2
      }
    }
  }

  test("EngineConf wires the net-selected provider list into the pool (S8)") {
    val conf = graft.model.EngineConf()
    assert(conf.clientPool().order === Seq("rpc-0"))
    assert(conf.clientPool().providers === Seq("rpc-0", "rpc-1", "rpc-2"))
    intercept[IllegalArgumentException](conf.clientPool("nosuchnet"))
    intercept[IllegalArgumentException](
      graft.model.EngineConf(providers = Map("empty" -> Nil)).clientPool("empty"))
  }
}
