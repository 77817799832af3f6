package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** URL decomposition for web-corpus curation: every crawl pipeline
  * groups, caps, and filters by URL structure (host, registered domain,
  * path depth, tracking params) before any content heuristic runs.
  *
  * Built on Spark's `parse_url` — a native codegen'd expression
  * (java.net.URI semantics) — plus exact string arithmetic for the
  * pieces `parse_url` doesn't expose (registered domain, path depth).
  * Row-local projection: at 100 TB this is scan-speed metadata
  * extraction with column pruning, no shuffle.
  */
object UrlOps {

  /** Decompose `urlCol` into curation-relevant parts:
    *
    *   - `host`: `parse_url(url, 'HOST')`;
    *   - `registered_domain`: last two dot-labels of the host — the
    *     per-site key a crawler caps by (the public-suffix list refines
    *     this in production; two-label is the engine-defined default);
    *   - `path`: `parse_url(url, 'PATH')`;
    *   - `path_depth`: number of non-empty path segments, by exact
    *     separator counting (`length(path) - length(replace(path,'/'))`
    *     minus a trailing-slash correction);
    *   - `query_<param>`: the requested query parameters via
    *     `parse_url(url, 'QUERY', param)`.
    */
  def parseUrls(df: DataFrame, urlCol: String, queryParams: Seq[String] = Nil): DataFrame = {
    val u = col(urlCol)
    val host = parse_url(u, lit("HOST"))
    val path = parse_url(u, lit("PATH"))
    val nSlash = (length(path) - length(regexp_replace(path, "/", ""))).cast("long")
    val endsSlash = path.endsWith("/")
    val base = df
      .withColumn("host", host)
      .withColumn(
        "registered_domain",
        regexp_extract(host, "([^.]+\\.[^.]+)$", 1))
      .withColumn("path", path)
      .withColumn(
        "path_depth",
        when(length(path) === 0, lit(0L))
          .otherwise(nSlash - when(endsSlash, 1L).otherwise(0L)))
    queryParams.foldLeft(base) { (acc, p) =>
      acc.withColumn(s"query_$p", parse_url(u, lit("QUERY"), lit(p)))
    }
  }

  /** Per-registered-domain crawl profile: doc count, distinct hosts,
    * distinct paths, mean path depth. The groupBy key is the capped-size
    * domain space, so the aggregate output is site-catalog-sized, never
    * corpus-sized.
    */
  def domainProfile(parsed: DataFrame): DataFrame =
    parsed
      .groupBy(col("registered_domain"))
      .agg(
        count(lit(1)).as("n_docs"),
        count_distinct(col("host")).as("n_hosts"),
        count_distinct(col("path")).as("n_paths"),
        round(avg(col("path_depth")), 6).as("avg_path_depth"))
}
