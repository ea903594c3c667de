"""The web-corpus ACQUISITION journey — everything that runs BEFORE the
curation pipeline (examples/corpus_curation.py) ever sees a document.

No reference analogue (the reference is a health-dashboard stack); this
is the edge of a 100 TB crawl, end-to-end on one synthetic archive:

  1. WARC ingest      — parse a crawl-archive blob into typed records
                        (the file is the parallel unit; bodies stay
                        opaque binary until a kernel needs them)
  2. robots politeness— per-host robots.txt bodies parsed ONCE into a
                        broadcast rule dictionary; every candidate URL
                        gets an RFC 9309 verdict + the host's
                        Crawl-delay for the fetch scheduler
  3. sitemap seeding  — Sitemap: directives from the robots bodies,
                        then bounded index→sitemap expansion through
                        the archive (never live HTTP inside the plan)
  4. frontier         — canonicalize discovered + crawled URLs (the
                        persisted key format, CANONICALIZER_VERSION)
                        and collapse to one fetch per canonical page
  5. text bridge      — html_extract over the allowed fetched pages:
                        the hand-off row (doc_id, text) curation takes
  6. fetch schedule   — per-host politeness offsets from the
                        crawl-delay column (the scheduler's feed)

Every stage is pure Columns or a dictionary-sized Arrow pass; the URL
stream itself never shuffles until the one canonical-key rollup.
Run: python examples/crawl_acquisition.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from w4h_integrated_toolkit_spark.operators.web import (
    CANONICALIZER_VERSION,
    canonicalize_url,
    expand_sitemap_index,
    html_extract,
    robots_filter,
    robots_sitemaps,
    schedule_frontier,
    sitemap_urls,
    url_dedup_groups,
    url_host,
)
from w4h_integrated_toolkit_spark.session import get_spark
from w4h_integrated_toolkit_spark.sources.warc import (
    encode_warc,
    encode_warc_record,
    warc_records,
)


def main() -> None:
    spark = get_spark("crawl-acquisition", cpus=4, shuffle_partitions=4)

    # ------------------------------------------------------------------
    # 1. WARC ingest: one stored crawl blob -> typed records. A real run
    # points warc_records at millions of archive files; here the blob is
    # synthesized with the same codec that parses it.
    # ------------------------------------------------------------------
    page = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n\r\n"
        b"<html><head><title>T</title></head><body>"
        b"<p>Hello &amp; welcome</p><a href=/next>next</a></body></html>"
    )
    uris = [
        "http://shop.example/welcome",
        "http://shop.example/café?utm_source=x&b=2&a=1",
        "http://shop.example/private/report",
        # same page as the first, different URL spelling
        "HTTP://Shop.example:80/caf%C3%A9?a=1&b=2",
    ]
    blob = encode_warc(
        [
            encode_warc_record(
                "response", page, target_uri=u,
                content_type="application/http;msgtype=response",
            )
            for u in uris
        ]
    )
    archive = spark.createDataFrame(
        [(1, bytearray(blob))], "blob_id long, content binary"
    )
    fetched = warc_records(archive, id_col="blob_id")
    fetched = fetched.where(F.col("warc_type") == "response")
    print(f"1. WARC records parsed: {fetched.count()} responses")

    # ------------------------------------------------------------------
    # 2. robots politeness: the stored per-host robots bodies become ONE
    # broadcast rule dictionary; verdicts + crawl-delay are map-side.
    # Note the percent-spelled rule blocking the raw-é URL (§2.2.2).
    # ------------------------------------------------------------------
    robots_body = (
        "User-agent: *\n"
        "Disallow: /private/\n"
        "Disallow: /caf%c3%a9\n"
        "Crawl-delay: 1.5\n"
        "Sitemap: http://shop.example/sitemap_index.xml\n"
    )
    robots = spark.createDataFrame(
        [("shop.example", robots_body)], "host string, robots_txt string"
    )
    candidates = fetched.select(
        F.col("target_uri").alias("url")
    )
    verdicts = robots_filter(
        candidates, robots, user_agent="w4hbot", delay_col="crawl_delay"
    )
    for r in verdicts.collect():
        print(
            f"2. {r['url']} -> allowed={r['allowed']} "
            f"delay={r['crawl_delay']}"
        )

    # ------------------------------------------------------------------
    # 3. sitemap seeding: discovery directives from the robots body,
    # then bounded expansion through the stored archive (a join — the
    # resolver never fetches live inside the plan).
    # ------------------------------------------------------------------
    seeds = robots_sitemaps(robots_body)
    print(f"3. sitemap seeds from robots.txt: {seeds}")
    sitemap_archive = spark.createDataFrame(
        [
            (
                "http://shop.example/sitemap_index.xml",
                "<sitemapindex><sitemap>"
                "<loc>http://shop.example/pages.xml</loc>"
                "</sitemap></sitemapindex>",
            ),
            (
                "http://shop.example/pages.xml",
                "<urlset><url><loc>http://shop.example/p1</loc></url>"
                "<url><loc>http://shop.example/café?a=1&amp;b=2</loc>"
                "</url></urlset>",
            ),
        ],
        "loc string, blob string",
    )
    roots = spark.createDataFrame(
        [(1, sitemap_archive.collect()[0]["blob"])],
        "doc_id long, sitemap_xml string",
    )

    def resolve(locs):
        return locs.join(sitemap_archive, on="loc", how="inner").select(
            "doc_id", "loc", F.col("blob").alias("sitemap_xml")
        )

    discovered = expand_sitemap_index(roots, resolve, max_depth=2)
    print("3. discovered locs:")
    for r in discovered.collect():
        print(f"   {r['loc']} (index={r['is_index']})")

    # ------------------------------------------------------------------
    # 4. frontier: canonicalize everything (discovered + already
    # crawled) and collapse to ONE fetch per canonical page. The
    # canonical string is a persisted key format — stamp the version.
    # ------------------------------------------------------------------
    frontier_in = (
        discovered.where(~F.col("is_index"))
        .select(F.col("loc").alias("url"))
        .unionByName(candidates)
        .withColumn("doc_id", F.monotonically_increasing_id())
    )
    groups = url_dedup_groups(frontier_in)
    print(
        f"4. frontier: {frontier_in.count()} raw URLs -> "
        f"{groups.count()} canonical pages "
        f"(canonicalizer v{CANONICALIZER_VERSION})"
    )
    for r in groups.orderBy("canonical_url").collect():
        print(f"   {r['canonical_url']} x{r['n_docs']}")

    # ------------------------------------------------------------------
    # 5. text bridge: allowed fetched pages -> (doc_id, text) for the
    # curation pipeline (examples/corpus_curation.py takes it from here)
    # ------------------------------------------------------------------
    allowed_pages = (
        verdicts.where(F.col("allowed"))
        .join(fetched, verdicts["url"] == fetched["target_uri"], "inner")
        .select(
            F.monotonically_increasing_id().alias("doc_id"),
            F.decode(F.col("payload"), "UTF-8").alias("html"),
        )
    )
    texts = html_extract(allowed_pages, html_col="html")
    row = texts.limit(1).collect()
    if row:
        print(
            f"5. text bridge sample: title={row[0]['title']!r} "
            f"text={row[0]['text']!r}"
        )

    # ------------------------------------------------------------------
    # 6. fetch schedule: the canonical frontier + each host's
    # crawl-delay -> per-host politeness offsets (one window exchange)
    # ------------------------------------------------------------------
    to_fetch = groups.select(
        F.col("canonical_url").alias("url"),
        url_host(F.col("canonical_url")).alias("host"),
    )
    paced = robots_filter(
        to_fetch, robots, user_agent="w4hbot", delay_col="crawl_delay"
    ).where(F.col("allowed"))
    schedule = schedule_frontier(paced, order_col="url")
    print("6. fetch schedule (offset s):")
    for r in schedule.orderBy("host", "fetch_offset_s").collect():
        print(f"   t+{r['fetch_offset_s']}s {r['url']}")

    # ------------------------------------------------------------------
    # 7. key-format migration: a frontier table persisted under the v2
    # canonical-key format (raw non-ASCII paths survived in v2 keys) is
    # rekeyed IN PLACE to the current version — the stamp-and-rebuild
    # discipline CANONICALIZER_VERSION prescribes, without refetching
    # raw URLs (valid for v2: the break only added a normalization pass)
    # ------------------------------------------------------------------
    from w4h_integrated_toolkit_spark.operators.web import (
        rekey_canonical_urls,
    )

    legacy = spark.createDataFrame(
        [("https://ex.org/café/menu",), ("https://ex.org/plain",)],
        "canonical_url string",
    )
    # carry the old key in a sibling column so old/new ride ONE row —
    # never zip two collects (row order across separate collects is not
    # a Spark guarantee on real multi-partition tables)
    migrated = rekey_canonical_urls(
        legacy.withColumn("v2_key", F.col("canonical_url")),
        stored_version=2,
    )
    print(f"7. v2 -> v{CANONICALIZER_VERSION} frontier rekey:")
    for r in migrated.collect():
        mark = "rewritten" if r["v2_key"] != r["canonical_url"] else "unchanged"
        print(f"   {r['v2_key']} -> {r['canonical_url']} ({mark})")

    # ------------------------------------------------------------------
    # 7b. the LOAD-path arm (r15): a persisted frontier is read back
    # through web.load_frontier, which reads the version stamp column,
    # rekeys a v2 table automatically (one INFO log line), and
    # re-stamps the current version — stored state can never silently
    # mix key formats with fresh keys downstream
    # ------------------------------------------------------------------
    import tempfile

    from w4h_integrated_toolkit_spark.operators.web import load_frontier

    with tempfile.TemporaryDirectory() as td:
        store = f"{td}/frontier"
        legacy.withColumn("canonicalizer_version", F.lit(2)).write.parquet(
            store
        )
        reloaded = load_frontier(spark, store).collect()
        print("7b. load_frontier over the stored v2 table:")
        for r in reloaded:
            print(
                f"   {r['canonical_url']} "
                f"(stamp v{r['canonicalizer_version']})"
            )
    spark.stop()


if __name__ == "__main__":
    main()
