package graft.sources

/** OAuth2 refresh-token flow for the REST sink family — the logic half
  * of the reference's token lifecycle
  * (/root/reference/src/refresh_token.py:45-56: POST a
  * `grant_type=refresh_token` exchange, persist the WHOLE rotated
  * response — the new access token and, per the OAuth2 public-client
  * convention the reference follows, a rotated refresh token), with
  * the container-blocked HTTP half behind the same injection seam as
  * [[UpsertEndpoint]]. Everything that can be wrong about token
  * handling — stale-token reuse past expiry, refresh storms, losing a
  * rotated refresh token (which bricks the client), infinite 401
  * loops — is in THIS layer and is fully testable without a network;
  * the transport impl is one `requests.post` equivalent.
  *
  * Lifecycle implemented (AuthSpec pins each):
  *   - access tokens are cached and reused until `expiresIn − skew`
  *     (one refresh serves many batches — no per-request exchange);
  *   - PROACTIVE refresh when the clock crosses the skew boundary, so
  *     a token is never presented inside its expiry margin;
  *   - ROTATION: the transport's response carries the next refresh
  *     token; it is persisted through [[TokenStore]] BEFORE the new
  *     access token is used (a crash after the exchange must find the
  *     rotated token on disk, or the old one is dead and the client
  *     bricked — the reference writes the response file first for the
  *     same reason);
  *   - REACTIVE recovery: a server-side revocation surfaces as
  *     [[AuthError]] from a send; the endpoint invalidates, refreshes
  *     ONCE, and replays the batch — a second AuthError propagates
  *     (no 401 loop), handing the batch to [[BatchedSink]]'s
  *     transient-retry / Spark-task-retry ladder, which the keyed
  *     upsert makes replay-safe.
  *
  * Scale posture: the manager is per-task-instance state (`@transient`
  * cache — serialized closures re-fetch on first use per executor),
  * but exchanges are SERIALIZED through the shared [[TokenStore]]'s
  * exclusive section with a re-read-and-reuse protocol — under
  * refresh-token ROTATION a single-use credential cannot survive
  * N independent concurrent exchanges (the first rotates it; every
  * other executor then presents a dead token, and an IdP with reuse
  * detection revokes the whole token family — a bricked client). Inside
  * the critical section a manager first re-reads the store's shared
  * access-token cache: if a peer already exchanged this window, it
  * adopts that token (ONE exchange per expiry window fleet-wide);
  * otherwise it loads the CURRENT refresh token — possibly rotated by
  * the peer it waited behind — and exchanges safely. A
  * 1000-executor sink therefore costs one token exchange per window
  * plus 999 store reads, not 1000 racing exchanges of one credential.
  */
case class TokenResponse(accessToken: String, refreshToken: String,
  expiresInSec: Long)

/** The container-blocked HTTP half: one POST to the token URL.
  * Throws [[AuthError]] when the presented refresh token is rejected
  * (revoked/expired) — a PERMANENT failure for this client. */
trait TokenTransport extends Serializable {
  def refresh(refreshToken: String): TokenResponse
}

/** A peer-published bearer token in the store's shared cache:
  * `expiresAtMs` is absolute wall-clock (all holders share a clock to
  * within the skew margin), so a racer can judge freshness without
  * knowing when the exchange happened. */
case class CachedToken(accessToken: String, expiresAtMs: Long)

/** Durable home of the rotating refresh token (the reference's
  * `access_token.json`); `save` must be atomic-enough that a reader
  * sees the old or the new token, never neither.
  *
  * The store is also the COORDINATION POINT for concurrent holders of
  * the single-use credential: [[withExclusive]] serializes the
  * load→exchange→save critical section (default: a JVM-local monitor
  * on this instance — correct for any single-process sharing, e.g.
  * local mode or one store per executor process; a store backed by
  * shared remote state must override it with a real lease — atomic
  * marker create, conditional put, DB row lock). [[loadCached]] /
  * [[saveCached]] are an optional shared access-token channel: a
  * holder that loses the exchange race adopts the winner's
  * still-fresh token instead of performing its own (valid but
  * redundant) serialized exchange. Defaults are no-ops so single-task
  * stores pay nothing. */
trait TokenStore extends Serializable {
  def load(): String
  def save(resp: TokenResponse): Unit
  def withExclusive[T](f: => T): T = this.synchronized(f)
  def loadCached(): Option[CachedToken] = None
  def saveCached(tok: CachedToken): Unit = ()
  /** Evict `accessToken` from the shared cache iff it is still the
    * cached entry — a server-side revocation must not be re-adopted by
    * the replay, but a PEER's newer token must not be clobbered. */
  def evictCached(accessToken: String): Unit = ()
}

/** Auth rejection — distinct from [[TransientSinkError]]: transient
  * errors replay unchanged, auth errors require a refresh first. */
class AuthError(msg: String) extends RuntimeException(msg)

/** Expiry-aware access-token cache over a rotating refresh token. */
class TokenManager(transport: TokenTransport, store: TokenStore,
    clock: () => Long, skewMs: Long = 30000L) extends Serializable {

  @transient private var access: String = _
  @transient private var expiresAtMs: Long = 0L

  /** Drop the cached access token (reactive path — the server said no
    * before the clock did), locally AND from the store's shared
    * channel, so the refresh-once replay cannot re-adopt the revoked
    * token a peer published. */
  def invalidate(): Unit = synchronized {
    if (access != null) store.evictCached(access)
    access = null
  }

  /** The current bearer token, exchanging the stored refresh token iff
    * absent/stale. Rotation is persisted BEFORE first use, and the
    * whole stale path runs inside the store's exclusive section:
    * re-read the shared cache first (a peer may have exchanged while
    * we waited for the lease — adopt its token), and only then load
    * the CURRENT refresh token and exchange. Loading outside the
    * section would race rotation: the first exchanger invalidates the
    * token every waiter already read. */
  def currentToken(): String = synchronized {
    val now = clock()
    if (access == null || now + skewMs >= expiresAtMs) {
      store.withExclusive {
        store.loadCached() match {
          case Some(c) if now + skewMs < c.expiresAtMs =>
            access = c.accessToken
            expiresAtMs = c.expiresAtMs
          case _ =>
            val resp = transport.refresh(store.load())
            store.save(resp)
            access = resp.accessToken
            expiresAtMs = now + resp.expiresInSec * 1000L
            store.saveCached(CachedToken(access, expiresAtMs))
        }
      }
    }
    access
  }
}

/** [[UpsertEndpoint]] decorator: injects the bearer token into every
  * send; on [[AuthError]] refreshes exactly once and replays the batch
  * (idempotent by the keyed-upsert contract), then propagates. */
class AuthenticatingEndpoint(mgr: TokenManager,
    send: (String, Seq[(String, String)]) => Unit) extends UpsertEndpoint {

  override def upsertBatch(batch: Seq[(String, String)]): Unit =
    try send(mgr.currentToken(), batch)
    catch {
      case _: AuthError =>
        mgr.invalidate()
        send(mgr.currentToken(), batch)
    }
}
