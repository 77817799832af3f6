package graft.queries

import graft.streaming.StatefulProfile

/** Round-66 addition (q614): the `transformWithState` arbitrary-state
  * surface (Spark 4's StatefulProcessor API — `TransformWithStateExec`
  * over the RocksDB state store), which none of the existing streaming
  * queries touch: q44/q45's stateful aggregations and the
  * mapGroupsWithState family compose monoids, while
  * [[graft.streaming.UserProfileProcessor]] keeps a [[ValueState]] of
  * scalar totals AND a [[MapState]] distribution per key and re-derives
  * an argmax (dominant event type) from live state on every update —
  * per-key state the old APIs would have to smuggle through one opaque
  * blob.
  *
  * The oracle is the batch profile in ANSI SQL: count / distinct-type
  * count / exact cents sum / first/last micros per user plus the
  * (n DESC, event_type) rank-1 dominant type. Streaming end state ≡
  * batch is the checked fact; Round66PropertySpec additionally splits
  * the stream into real multi-batch drains to prove the cross-batch
  * state handoff (and the max-n_events finalization rule) hold off the
  * single-batch happy path.
  */
object Round66 {

  val q614TwsProfile: QueryDef = QueryDef(
    "q614_tws_user_profile",
    (s, dir) => StatefulProfile.runUserProfiles(s, dir),
    Some("""WITH e AS (SELECT user_id, event_type,
                   CAST(round(value * 100) AS BIGINT) AS cents,
                   CAST(epoch_us(ts) AS BIGINT) AS us
            FROM events),
        tc AS (SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
               FROM e GROUP BY 1, 2),
        dom AS (SELECT user_id, event_type AS dom_type
                FROM (SELECT user_id, event_type,
                             row_number() OVER (PARTITION BY user_id
                               ORDER BY n DESC, event_type) AS rn
                      FROM tc)
                WHERE rn = 1),
        agg AS (SELECT user_id,
                       CAST(count(*) AS BIGINT) AS n_events,
                       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
                       CAST(sum(cents) AS BIGINT) AS cents_sum,
                       CAST(min(us) AS BIGINT) AS first_us,
                       CAST(max(us) AS BIGINT) AS last_us
                FROM e GROUP BY 1)
        SELECT a.user_id, a.n_events, a.n_types, a.cents_sum,
               a.first_us, a.last_us, d.dom_type
        FROM agg a JOIN dom d ON a.user_id = d.user_id
        ORDER BY a.user_id""")
  )

  /** q617: EVENT-TIME TIMERS — the other genuinely new capability of the
    * StatefulProcessor API ([[graft.streaming.SessionTimerProcessor]]):
    * per-user 30-minute-gap sessions closed either inline (same-batch
    * gap) or by a registered event-time timer once the watermark passes
    * last_event + gap (`handleExpiredTimer`) — how a live stream emits a
    * finished session without waiting for the user's next event. Oracle
    * is the batch gaps-and-islands sessionization; bounded-replay flush
    * via the far-future sentinel (the session-window idiom).
    */
  val q617TwsTimerSessions: QueryDef = QueryDef(
    "q617_tws_timer_sessions",
    (s, dir) => StatefulProfile.runTimerSessions(s, dir),
    Some("""WITH e AS (SELECT user_id, CAST(epoch_us(ts) AS BIGINT) AS us,
                   CAST(round(value * 100) AS BIGINT) AS cents
            FROM events),
        o AS (SELECT user_id, us, cents,
                     lag(us) OVER (PARTITION BY user_id ORDER BY us) AS prev
              FROM e),
        m AS (SELECT user_id, us, cents,
                     CASE WHEN prev IS NULL OR us - prev > 1800000000
                          THEN 1 ELSE 0 END AS brk
              FROM o),
        s AS (SELECT user_id, us, cents,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY us
                       ROWS UNBOUNDED PRECEDING) AS sess
              FROM m)
        SELECT user_id,
               CAST(min(us) AS BIGINT) AS session_start_us,
               CAST(count(*) AS BIGINT) AS n_events,
               CAST(sum(cents) AS BIGINT) AS cents_sum
        FROM s GROUP BY user_id, sess
        ORDER BY user_id, session_start_us""")
  )

  /** q621: BACKFILL-then-stream — `StatefulProcessorWithInitialState`
    * seeds the q614 profile state from a batch relation of per-(user,
    * type) aggregates over the first half of history; only the second
    * half flows through the stream; the serving merge (live wins, else
    * bootstrap) must equal the FULL-history batch profile — q614's own
    * oracle, bit-for-bit. The lake-migration pattern: go live without
    * replaying history through the stream.
    */
  val q621TwsBootstrap: QueryDef = QueryDef(
    "q621_tws_bootstrap",
    (s, dir) => StatefulProfile.runBootstrappedProfiles(s, dir),
    q614TwsProfile.oracle
  )

  val all: Seq[QueryDef] = Seq(q614TwsProfile, q617TwsTimerSessions, q621TwsBootstrap)
}
