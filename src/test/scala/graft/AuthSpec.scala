package graft

import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import graft.sources._

/** Scripted token server: issues access tokens a1, a2, … for refresh
  * tokens r0 → r1 → r2, … (strict rotation — presenting anything but
  * the CURRENT refresh token is an AuthError, like a real IdP); tracks
  * which access tokens are still valid so sends can check. */
private[graft] class FakeIdp(ttlSec: Long) extends TokenTransport {
  var expectedRefresh = "r0"
  var exchanges = 0
  var valid: Set[String] = Set.empty
  override def refresh(refreshToken: String): TokenResponse =
    synchronized {
      if (refreshToken != expectedRefresh)
        throw new AuthError(s"stale refresh token $refreshToken")
      exchanges += 1
      val resp = TokenResponse(s"a$exchanges", s"r$exchanges", ttlSec)
      expectedRefresh = resp.refreshToken
      valid += resp.accessToken
      resp
    }
  def revoke(token: String): Unit = synchronized { valid -= token }
}

private[graft] class MemStore(var refreshToken: String = "r0")
    extends TokenStore {
  var saves = 0
  override def load(): String = synchronized(refreshToken)
  override def save(resp: TokenResponse): Unit = synchronized {
    refreshToken = resp.refreshToken; saves += 1
  }
}

/** [[MemStore]] plus the shared access-token channel — what a store
  * backed by real shared state (file, DB row, secret manager) exposes
  * so racing holders reuse the winner's token instead of exchanging. */
private[graft] class SharedMemStore extends MemStore {
  private var cached: Option[CachedToken] = None
  override def loadCached(): Option[CachedToken] = synchronized(cached)
  override def saveCached(tok: CachedToken): Unit =
    synchronized { cached = Some(tok) }
  override def evictCached(accessToken: String): Unit = synchronized {
    if (cached.exists(_.accessToken == accessToken)) cached = None
  }
}

/** JVM-singleton side of the Spark composition test — the
  * [[graft.sources.InJvmUpsertStore]] pattern: closures shipped into
  * tasks reference this object STATICALLY (nothing stateful is
  * captured), so under local[*] every task talks to the one shared
  * fake IdP/store, exactly as tasks on a cluster would share the one
  * remote service. */
private[graft] object AuthJvm {
  val idp = new FakeIdp(ttlSec = 600)
  val store = new MemStore()
  val now = new AtomicLong(0L)
  val applied = new ConcurrentHashMap[String, String]()
  val sends = new AtomicInteger(0)
}

private[graft] class JvmTransport extends TokenTransport {
  override def refresh(rt: String): TokenResponse = AuthJvm.idp.refresh(rt)
}

private[graft] class JvmStore extends TokenStore {
  override def load(): String = AuthJvm.store.load()
  override def save(r: TokenResponse): Unit = AuthJvm.store.save(r)
}

/** Pins for the OAuth2 refresh-token lifecycle (sources/Auth.scala) —
  * every failure mode of token handling exercised against an injected
  * clock/transport/store, no network: cache reuse, proactive expiry
  * refresh, refresh-token ROTATION persisted before use, reactive 401
  * recovery with exactly one replay, permanent-failure propagation,
  * and end-to-end composition with the BatchedSink retry ladder.
  */
class AuthSpec extends SparkTestBase {

  test("access token is cached across batches and refreshed at the skew") {
    val idp = new FakeIdp(ttlSec = 600)
    val store = new MemStore()
    val now = new AtomicLong(1000000L)
    val mgr = new TokenManager(idp, store, () => now.get(), skewMs = 30000)
    // many calls inside the ttl: ONE exchange
    val t1 = (1 to 10).map(_ => mgr.currentToken()).distinct
    assert(t1 == Seq("a1") && idp.exchanges == 1)
    // just under the skew boundary: still cached
    now.addAndGet(600000L - 30001L)
    assert(mgr.currentToken() == "a1" && idp.exchanges == 1)
    // crossing it: proactive refresh — a token is never presented
    // inside its expiry margin
    now.addAndGet(2L)
    assert(mgr.currentToken() == "a2" && idp.exchanges == 2)
  }

  test("rotation: the new refresh token is persisted and presented next") {
    val idp = new FakeIdp(ttlSec = 1)
    val store = new MemStore()
    val now = new AtomicLong(0L)
    val mgr = new TokenManager(idp, store, () => now.get(), skewMs = 0)
    mgr.currentToken()
    assert(store.refreshToken == "r1" && store.saves == 1)
    now.addAndGet(5000L) // past ttl → second exchange must present r1
    assert(mgr.currentToken() == "a2")
    assert(store.refreshToken == "r2" && store.saves == 2)
    // a manager recovering from the store alone (crash restart) works:
    // the rotated token was persisted before first use
    val mgr2 = new TokenManager(idp, store, () => now.get(), skewMs = 0)
    assert(mgr2.currentToken() == "a3" && store.refreshToken == "r3")
  }

  test("reactive 401: one refresh + one replay, applied exactly once") {
    val idp = new FakeIdp(ttlSec = 600)
    val store = new MemStore()
    val mgr = new TokenManager(idp, store, () => 0L)
    val applied = scala.collection.mutable.Map.empty[String, String]
    var sends = 0
    val ep = new AuthenticatingEndpoint(mgr, (token, batch) => {
      sends += 1
      if (!idp.valid(token)) throw new AuthError(s"401 for $token")
      batch.foreach { case (k, v) => applied(k) = v }
    })
    ep.upsertBatch(Seq("k1" -> "v1"))
    assert(applied("k1") == "v1" && idp.exchanges == 1)
    // server-side revocation BEFORE expiry: the clock says fine, the
    // server says 401 — endpoint refreshes once and replays
    idp.revoke("a1")
    ep.upsertBatch(Seq("k2" -> "v2"))
    assert(applied("k2") == "v2")
    assert(idp.exchanges == 2, s"exchanges=${idp.exchanges}")
    assert(sends == 3, s"sends=$sends") // 1 ok + 1 rejected + 1 replay
  }

  test("persistent auth failure propagates after exactly one retry") {
    val idp = new FakeIdp(ttlSec = 600)
    val store = new MemStore()
    val mgr = new TokenManager(idp, store, () => 0L)
    var sends = 0
    val ep = new AuthenticatingEndpoint(mgr, (_, _) => {
      sends += 1; throw new AuthError("always 401")
    })
    intercept[AuthError] { ep.upsertBatch(Seq("k" -> "v")) }
    assert(sends == 2, s"sends=$sends") // no 401 loop
    // a revoked REFRESH token (IdP rejects the exchange) also
    // propagates — permanent failure, nothing left to retry with
    store.refreshToken = "bogus"
    mgr.invalidate()
    intercept[AuthError] { ep.upsertBatch(Seq("k" -> "v")) }
  }

  test("N-way concurrent refresh of one rotating credential never bricks") {
    // The ADVICE r11 scenario: N per-executor managers share ONE
    // refresh token under strict rotation. Unserialized, the first
    // exchange rotates the token every other manager already read —
    // N−1 AuthErrors and (with IdP reuse detection) a revoked family.
    // The store's exclusive section + load-inside-the-lock makes every
    // exchange present the CURRENT token: all succeed, no AuthError.
    val idp = new FakeIdp(ttlSec = 600)
    val store = new MemStore() // no shared cache: reuse disabled
    val now = new AtomicLong(0L)
    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CountDownLatch(1)
    try {
      val futs = (1 to n).map { _ =>
        val mgr = new TokenManager(idp, store, () => now.get())
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = { gate.await(); mgr.currentToken() }
        })
      }
      gate.countDown()
      val tokens = futs.map(_.get()) // throws if any manager bricked
      // every serialized exchange presented the then-current token:
      // no failures, store holds the final rotation, and every token
      // handed out is one the IdP actually issued and still honors
      assert(idp.exchanges == n && store.refreshToken == s"r$n")
      assert(tokens.forall(idp.valid.contains))
    } finally pool.shutdown()
  }

  test("shared token cache: N racers, ONE exchange; revocation evicts") {
    val idp = new FakeIdp(ttlSec = 600)
    val store = new SharedMemStore
    val now = new AtomicLong(0L)
    val n = 16
    val pool = java.util.concurrent.Executors.newFixedThreadPool(n)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val mgrs = (1 to n).map(_ =>
      new TokenManager(idp, store, () => now.get()))
    try {
      val futs = mgrs.map { mgr =>
        pool.submit(new java.util.concurrent.Callable[String] {
          override def call(): String = { gate.await(); mgr.currentToken() }
        })
      }
      gate.countDown()
      val tokens = futs.map(_.get()).distinct
      // the race's loser re-reads the winner's still-fresh token from
      // the shared channel: one exchange serves the whole fleet
      assert(tokens == Seq("a1"), tokens.toString)
      assert(idp.exchanges == 1 && store.refreshToken == "r1")
      // reactive revocation must EVICT the shared entry, or the
      // refresh-once replay would re-adopt the revoked token forever
      idp.revoke("a1")
      mgrs.head.invalidate()
      assert(mgrs.head.currentToken() == "a2" && idp.exchanges == 2)
      // ...but a peer invalidating the OLD token later must not
      // clobber the NEW shared entry
      mgrs(1).invalidate() // holds a1 locally; cache holds a2
      assert(mgrs(1).currentToken() == "a2" && idp.exchanges == 2)
    } finally pool.shutdown()
  }

  test("composes with BatchedSink: 401 + transient blip both recover") {
    import spark.implicits._
    val mgr = new TokenManager(new JvmTransport, new JvmStore,
      () => AuthJvm.now.get())
    val ep = new AuthenticatingEndpoint(mgr, (token, batch) => {
      val n = AuthJvm.sends.incrementAndGet()
      if (!AuthJvm.idp.valid(token)) throw new AuthError(s"401 for $token")
      // one transient blip on the 3rd send: the BatchedSink retry
      // ladder must replay it through the SAME auth path
      if (n == 3) throw new TransientSinkError("blip")
      batch.foreach { case (k, v) => AuthJvm.applied.put(k, v) }
    })
    val df = (1 to 97).map(i => (s"k$i", s"v$i")).toDF("key", "payload")
    BatchedSink.write(df.coalesce(1), ep, batchSize = 10)
    assert(AuthJvm.applied.size() == 97)
    assert((1 to 97).forall(i => AuthJvm.applied.get(s"k$i") == s"v$i"))
    // token cached across the whole write: one exchange total
    assert(AuthJvm.idp.exchanges == 1,
      s"exchanges=${AuthJvm.idp.exchanges}")
  }
}
