package graft.queries

/** The ONE list of session-scoped memo caches (cross-query by design,
  * deliberately NOT drained at [[graft.CacheScope.releaseAll]] query
  * boundaries — see each registry's evictAll scaladoc).
  *
  * Every consumer that needs a truly cold session — the bench's cold
  * pass, the cache-lifecycle gate, a user session done with a family —
  * goes through here, so adding a new memo cache means extending exactly
  * one list. A cache forgotten HERE would silently flatter cold numbers
  * (the r5 q62 regression's failure class); a cache added here but never
  * populated is a no-op.
  *
  * INVALIDATION CONTRACT: every memo keys on (applicationId, fixture
  * dir) and assumes the parquet under that dir is IMMUTABLE for the
  * application's lifetime — the harnesses (Verify, Bench, the specs)
  * all satisfy this, and the testdata generator only runs between
  * driver rounds. Regenerating a fixture mid-session would serve stale
  * persisted relations to every memo consumer; a session that must
  * re-ingest a changed dir calls [[evictAll]] first (the knob already
  * exists — folding file mtimes into every key would buy re-ingestion
  * safety nothing here uses at the cost of a listing RPC per memo hit).
  */
object SessionMemos {
  def evictAll(): Unit = {
    TopicQueries.evictAll()
    SimilarityQueries.evictAll()
    NlpQueries.evictAll()
    CurationQueries.evictAll()
    DedupQueries.evictAll()
    AnalysisQueries.evictAll()
    MultimodalQueries.evictAll()
  }
}
