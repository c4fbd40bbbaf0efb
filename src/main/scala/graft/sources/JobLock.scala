package graft.sources

import java.nio.file.{Files, Path, StandardCopyOption}

/** Job locks with TTL leases — the reference's double-start prevention
  * (`src/lib/cron/job-lock.ts:43-197`: a table row per job with
  * (lock_token, locked_until); acquire = insert-or-take-over-expired
  * with optimistic token compare; release/extend require the token;
  * expired rows are swept). Re-expressed over a lock DIRECTORY: one
  * file per job holding `token|locked_until_ms`.
  *
  * Atomicity mapping: the insert path writes the full lease content to
  * a private temp file and `Files.createLink`s it into place — link()
  * is atomic fail-if-exists (the unique-constraint violation analog)
  * and the lock file is born WITH its content, so no acquire window
  * ever exposes a contentless lock for another process to steal; the
  * expired-takeover path re-reads and compares the old token before
  * replacing (tmp + ATOMIC_MOVE) — the same OPTIMISTIC discipline as
  * the reference's `UPDATE ... WHERE lock_token = old` (a racing writer
  * in the compare-to-move window wins arbitrarily there too; the TTL
  * bounds the damage either way). Clock is injected for deterministic
  * specs. */
final class JobLock(root: Path,
                    nowMs: () => Long = () => System.currentTimeMillis(),
                    newToken: () => String =
                      () => java.util.UUID.randomUUID().toString) {
  Files.createDirectories(root)

  private def lockFile(jobName: String): Path = {
    require(jobName.matches("[A-Za-z0-9_.-]+"), s"unsafe job name: $jobName")
    root.resolve(s"$jobName.lock")
  }

  /** A lock file's content, or None when the file is absent OR exists
    * but is empty/unparseable (a writer that crashed between
    * `Files.createFile` and the content write — the reference's DB row
    * cannot exist contentless, a file can). Callers treat the
    * corrupt-but-present case as an EXPIRED lease: acquire takes it
    * over and the sweep deletes it, so a torn write never wedges the
    * job forever. */
  private def parse(p: Path): Option[(String, Long)] =
    if (!Files.exists(p)) None
    else Files.readString(p).trim.split('|') match {
      // length bound keeps toLong from throwing on all-digit overflow
      // garbage — that corruption class must parse to None, not crash
      case Array(tok, until) if until.nonEmpty && until.length <= 18 &&
          until.forall(_.isDigit) =>
        Some((tok, until.toLong))
      case _ => None
    }

  private def write(p: Path, token: String, untilMs: Long): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    Files.writeString(tmp, s"$token|$untilMs")
    Files.move(tmp, p, StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
  }

  /** Try to take the lease: Right(token) on success, Left(reason) when
    * another live holder exists (the reference returns
    * `{success: false}` and the cron responds 409). */
  def acquire(jobName: String, ttlSeconds: Long = 600L): Either[String, String] =
    synchronized {
      val p = lockFile(jobName)
      val now = nowMs()
      val token = newToken()
      parse(p) match {
        case Some((_, until)) if until > now =>
          Left(s"lock already held until $until")
        case Some((oldTok, _)) =>
          // expired: optimistic takeover — re-check the token we read
          // still owns the file before replacing
          parse(p) match {
            case Some((cur, _)) if cur == oldTok =>
              write(p, token, now + ttlSeconds * 1000L); Right(token)
            case _ => Left("failed to acquire lock (race condition)")
          }
        case None if Files.exists(p) =>
          // present but empty/corrupt. Our own writers can never leave
          // this state (fresh acquires LINK a fully-written file into
          // place — no contentless window), so this is external
          // corruption: treat as an expired lease and take over (the
          // same optimistic window as the expired-token takeover).
          write(p, token, now + ttlSeconds * 1000L)
          Right(token)
        case None =>
          // fresh acquire: write the full content to a private temp,
          // then HARD-LINK it into place — link() is atomic
          // fail-if-exists WITH content (the unique-constraint analog),
          // so no other process can ever observe a contentless lock and
          // steal it mid-acquire (a createFile-then-write two-step had
          // exactly that window).
          val tmp = p.resolveSibling(s"${p.getFileName}.$token.tmp")
          Files.writeString(tmp, s"$token|${now + ttlSeconds * 1000L}")
          try {
            Files.createLink(p, tmp)
            Right(token)
          } catch {
            case _: java.nio.file.FileAlreadyExistsException =>
              Left("lock already held by another process")
          } finally Files.deleteIfExists(tmp)
      }
    }

  /** Release only with the matching token; a mismatch is a no-op (the
    * TTL will free it — the reference logs and returns). */
  def release(jobName: String, token: String): Boolean = synchronized {
    val p = lockFile(jobName)
    parse(p) match {
      case Some((tok, _)) if tok == token => Files.deleteIfExists(p); true
      case _ => false
    }
  }

  /** Heartbeat: push the lease forward, only for the current holder. */
  def extend(jobName: String, token: String,
             ttlSeconds: Long = 600L): Boolean = synchronized {
    val p = lockFile(jobName)
    parse(p) match {
      case Some((tok, _)) if tok == token =>
        write(p, token, nowMs() + ttlSeconds * 1000L); true
      case _ => false
    }
  }

  /** Sweep expired leases; returns how many were removed. */
  def cleanupExpired(): Int = synchronized {
    val now = nowMs()
    val it = Files.list(root).iterator()
    var n = 0
    while (it.hasNext) {
      val p = it.next()
      if (p.getFileName.toString.endsWith(".lock"))
        parse(p) match {
          case Some((_, until)) if until < now =>
            Files.deleteIfExists(p); n += 1
          case None => // torn/corrupt lease file: expired by definition
            Files.deleteIfExists(p); n += 1
          case _ =>
        }
    }
    n
  }

  /** Current holder token, if the lease is live. */
  def holder(jobName: String): Option[String] = synchronized {
    parse(lockFile(jobName)).collect {
      case (tok, until) if until > nowMs() => tok
    }
  }
}
