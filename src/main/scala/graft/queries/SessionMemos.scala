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
