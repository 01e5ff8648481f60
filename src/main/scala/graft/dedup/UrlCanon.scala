package graft.dedup

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization as a pure Column expression (dq15's normalizer,
  * extracted so ingest paths can reuse it): lowercase scheme+host, strip
  * `www.`, drop default ports (443/https, 80/http) while KEEPING
  * non-default ones, strip the fragment, collapse the trailing slash,
  * drop `utm_*`/`fbclid`/`gclid` tracking params, and SORT the surviving
  * query params. All regexp/array built-ins — stays inside whole-stage
  * codegen, no UDF. The production dedup key is md5/sha2 of this string
  * (dq01's shuffle-digests-not-bodies rule). */
object UrlCanon {

  def canonical(url: Column): Column = {
    val scheme = lower(regexp_extract(url, "^([A-Za-z]+)://", 1))
    val rest = regexp_extract(url, "^[A-Za-z]+://([^#]*)", 1)
    val hostport = regexp_extract(rest, "^([^/?]+)", 1)
    val host = regexp_replace(
      lower(regexp_extract(hostport, "^([^:]+)", 1)), "^www\\.", "")
    val port = regexp_extract(hostport, ":([0-9]+)$", 1)
    val pathq = regexp_extract(rest, "^[^/?]+([/?].*)?$", 1)
    // "/+$" not "/$": a multi-slash tail ("/x//") must reach its fixed
    // point in ONE pass or canonical() is not idempotent
    val pathC = regexp_replace(regexp_extract(pathq, "^([^?]*)", 1), "/+$", "")
    val qstr = regexp_extract(pathq, "\\?(.*)$", 1)
    val qSorted = array_join(array_sort(filter(split(qstr, "&"),
      p => p =!= "" && !p.rlike("^(utm_[a-z]+|fbclid|gclid)="))), "&")
    concat(scheme, lit("://"), host,
      when(port =!= "" && !((scheme === "https" && port === "443") ||
        (scheme === "http" && port === "80")),
        concat(lit(":"), port)).otherwise(lit("")),
      pathC,
      when(qSorted =!= "", concat(lit("?"), qSorted)).otherwise(lit("")))
  }
}
