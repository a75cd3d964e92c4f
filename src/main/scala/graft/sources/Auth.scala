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
  * cache — serialized closures re-fetch on first use per executor), so
  * a 1000-executor sink performs ~1000 exchanges per expiry window —
  * the standard client-side caching shape; the alternative, a
  * driver-brokered token, would put the driver on every task's hot
  * path.
  */
case class TokenResponse(accessToken: String, refreshToken: String,
  expiresInSec: Long)

/** The container-blocked HTTP half: one POST to the token URL.
  * Throws [[AuthError]] when the presented refresh token is rejected
  * (revoked/expired) — a PERMANENT failure for this client. */
trait TokenTransport extends Serializable {
  def refresh(refreshToken: String): TokenResponse
}

/** Durable home of the rotating refresh token (the reference's
  * `access_token.json`); `save` must be atomic-enough that a reader
  * sees the old or the new token, never neither. */
trait TokenStore extends Serializable {
  def load(): String
  def save(resp: TokenResponse): Unit
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
    * before the clock did). */
  def invalidate(): Unit = synchronized { access = null }

  /** The current bearer token, exchanging the stored refresh token iff
    * absent/stale. Rotation is persisted BEFORE first use. */
  def currentToken(): String = synchronized {
    val now = clock()
    if (access == null || now + skewMs >= expiresAtMs) {
      val resp = transport.refresh(store.load())
      store.save(resp)
      access = resp.accessToken
      expiresAtMs = now + resp.expiresInSec * 1000L
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
