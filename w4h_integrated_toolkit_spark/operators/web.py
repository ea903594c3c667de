"""Web-corpus curation: URL parsing and per-domain rate capping — the
first filters any web-scale training-data pipeline runs (beyond the
reference's surface, which has no web layer; the curation stack here
already covers quality/dedup/decontamination/PII/mixture, and these are
its missing upstream stage).

All parsing is pure Column expressions (JVM-side `try_parse_url` +
string ops — no Python in the hot path); the capper is the standard
two-stage top-k so one mega-domain (a 1e8-page wiki at 100 TB) never
funnels through a single window partition sort unscathed.
"""

from __future__ import annotations

import os
from typing import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "url_host",
    "registrable_domain",
    "registrable_domain_psl",
    "load_public_suffixes",
    "domain_of",
    "domain_cap_sample",
    "html_text",
    "html_title",
    "html_link_count",
    "html_extract",
    "canonicalize_url",
    "rekey_canonical_urls",
    "load_frontier",
    "url_dedup_groups",
    "idna_ascii_hosts",
    "parse_robots",
    "parse_crawl_delay",
    "robots_filter",
    "robots_sitemaps",
    "schedule_frontier",
    "sitemap_urls",
    "expand_sitemap_index",
    "TRACKING_PARAM_RE",
    "CANONICALIZER_VERSION",
]

# Vendored multi-part-suffix subset of the public Mozilla PSL — the
# externalized lookup data the broadcast arm consumes by default
# (reference analog: the config-driven catalog of conf/config.yaml —
# lookup data lives in a data file, not code literals).
DEFAULT_PSL_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "resources",
    "public_suffixes.txt",
)


def load_public_suffixes(path: str | None = None) -> list[str]:
    """Load a public-suffix list file: one suffix per line, ``//`` / ``#``
    comments and blank lines ignored, lowercased, deduplicated, sorted.
    Defaults to the vendored multi-part subset
    (:data:`DEFAULT_PSL_PATH`); point it at a full downloaded PSL in
    production. Wildcard (``*.``) and exception (``!``) rules are NOT
    implemented — the loader raises so they cannot be silently treated
    as literal hostname labels."""
    out = set()
    with open(path or DEFAULT_PSL_PATH, encoding="utf-8") as fh:
        for line in fh:
            s = line.strip()
            if not s or s.startswith("//") or s.startswith("#"):
                continue
            if s.startswith("*.") or s.startswith("!"):
                raise ValueError(
                    f"wildcard/exception PSL rule {s!r} is not supported; "
                    "strip such rules (or extend the matcher) before loading"
                )
            out.add(s.lower())
    return sorted(out)

# Representative multi-part public suffixes (second level of the public
# Mozilla PSL). A production deployment broadcasts the FULL list as a
# lookup table; this built-in subset keeps the expression literal and
# dependency-free, and `extra_suffixes` extends it per call.
MULTI_PART_SUFFIXES: tuple[str, ...] = (
    "co.uk", "org.uk", "ac.uk", "gov.uk", "me.uk", "net.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au",
    "co.jp", "or.jp", "ne.jp", "ac.jp", "go.jp",
    "co.in", "net.in", "org.in", "gen.in", "firm.in",
    "co.nz", "net.nz", "org.nz",
    "com.br", "net.br", "org.br",
    "com.cn", "net.cn", "org.cn", "gov.cn",
    "com.mx", "com.sg", "com.tr", "com.tw", "com.hk",
    "co.za", "co.kr", "or.kr",
)


def url_host(url: Column) -> Column:
    """Hostname of a URL — scheme, userinfo, port, path, query and
    fragment stripped — via the engine-native ``try_parse_url`` (JVM
    java.net.URI, whole-stage-codegen'd; NULL for malformed input
    instead of a task failure). Lowercased: hostnames are
    case-insensitive and a domain groupBy must not split on case."""
    return F.lower(F.try_parse_url(url, F.lit("HOST")))


def registrable_domain(
    host: Column, extra_suffixes: tuple[str, ...] = ()
) -> Column:
    """Registrable domain (eTLD+1) of a hostname: the last two labels,
    or the last three when the trailing two form a multi-part public
    suffix (``www3.example.co.uk`` → ``example.co.uk``,
    ``www2.example.com`` → ``example.com``). Exact eTLD+1 needs the
    full public-suffix list — broadcast it and join for that; this
    literal-set expression covers the common suffixes and is what a
    per-domain cap/count keys on. Hosts with ≤2 labels (or NULL) pass
    through unchanged. Trailing root dots (FQDN form ``example.com.``,
    and malformed repeats ``example.com..``) are stripped first —
    otherwise the split yields trailing empty labels and the result
    degrades to ``com.``."""
    suffixes = tuple(MULTI_PART_SUFFIXES) + tuple(extra_suffixes)
    host = F.regexp_replace(F.lower(host), r"\.+$", "")
    p = F.split(host, r"\.")
    n = F.size(p)
    last2 = F.concat_ws(".", F.element_at(p, -2), F.element_at(p, -1))
    last3 = F.concat_ws(
        ".", F.element_at(p, -3), F.element_at(p, -2), F.element_at(p, -1)
    )
    return (
        F.when(host.isNull(), F.lit(None).cast("string"))
        .when(n <= 2, host)
        .when(last2.isin(*suffixes), last3)
        .otherwise(last2)
    )


def registrable_domain_psl(
    df: DataFrame,
    suffixes: DataFrame | Sequence[str] | None = None,
    host_col: str = "host",
    out_col: str = "domain",
    max_depth: int = 5,
) -> DataFrame:
    """Registrable domain (eTLD+1) via a BROADCAST public-suffix lookup —
    the production arm of :func:`registrable_domain` (r9 verdict order
    #3): the full multi-part-suffix table joins against each host's
    candidate suffixes instead of living inside a Catalyst ``isin``
    literal, so a 10k-rule PSL costs one small broadcast rather than a
    10k-element expression tree re-analyzed per plan (the
    bloom_decontaminate lesson).

    Semantics are the literal arm's, generalized to arbitrary-size
    tables and suffix depths up to ``max_depth``:

    - NULL host → NULL; ≤2 labels → host unchanged (after lowercasing
      and FQDN trailing-dot strip);
    - otherwise the LONGEST listed multi-part suffix matching the
      host's tail wins and the result is that suffix plus one label;
      a host that IS a listed suffix passes through unchanged;
    - no match → last two labels (the PSL prevailing-rule fallback —
      single-label TLDs never need listing because this fallback
      already yields their eTLD+1, which is why the vendored file
      ships multi-part rules only).

    Equivalence law (test-pinned): with ``suffixes`` =
    :data:`MULTI_PART_SUFFIXES` this reproduces
    :func:`registrable_domain` exactly.

    Plan shape: one broadcast hash join per DISTINCT SUFFIX DEPTH
    present in the table (≤ ``max_depth``−1, each map-side, corpus
    never shuffles), then a pure Column when-chain — no Python in the
    hot path. ``suffixes`` may be a one-column DataFrame (e.g. read
    from a config table) or any string sequence; ``None`` loads the
    vendored file."""
    clash = [c for c in df.columns if c.startswith("__w4h_psl_")]
    if clash:
        raise ValueError(
            f"input carries reserved scratch column(s) {clash}; rename "
            "them — registrable_domain_psl uses the __w4h_psl_ prefix "
            "for its join scratch space"
        )
    spark = df.sparkSession
    if suffixes is None:
        suffixes = load_public_suffixes()
    if isinstance(suffixes, DataFrame):
        sfx = suffixes.select(F.lower(F.col(suffixes.columns[0])).alias("_sfx"))
    else:
        sfx = spark.createDataFrame([(s.lower(),) for s in suffixes], "_sfx string")
    sfx = (
        sfx.select("_sfx", F.size(F.split("_sfx", r"\.")).alias("_sd"))
        .filter((F.col("_sd") >= 2) & (F.col("_sd") <= max_depth))
        .distinct()
    )
    # distinct depths actually present: O(max_depth) driver rows
    depths = sorted(r["_sd"] for r in sfx.select("_sd").distinct().collect())

    h = F.regexp_replace(F.lower(F.col(host_col)), r"\.+$", "")
    out = df.withColumn("__w4h_psl_h", h).withColumn("__w4h_psl_p", F.split(F.col("__w4h_psl_h"), r"\."))
    n = F.size("__w4h_psl_p")

    def last_k(k):
        return F.concat_ws(".", F.slice("__w4h_psl_p", -k, k))

    for d in depths:
        cand = F.when(n >= d, last_k(d))
        out = out.withColumn(f"__w4h_psl_c{d}", cand).join(
            F.broadcast(
                sfx.filter(F.col("_sd") == d).select(
                    F.col("_sfx").alias(f"__w4h_psl_m{d}")
                )
            ),
            F.col(f"__w4h_psl_c{d}") == F.col(f"__w4h_psl_m{d}"),
            "left",
        )

    expr = F.when(F.col(host_col).isNull(), F.lit(None).cast("string")).when(
        n <= 2, F.col("__w4h_psl_h")
    )
    for d in sorted(depths, reverse=True):  # longest listed suffix wins
        matched = F.col(f"__w4h_psl_m{d}").isNotNull()
        expr = expr.when(matched & (n >= d + 1), last_k(d + 1)).when(
            matched, F.col("__w4h_psl_h")
        )
    expr = expr.otherwise(last_k(2))

    drop = ["__w4h_psl_h", "__w4h_psl_p"] + [c for d in depths for c in (f"__w4h_psl_c{d}", f"__w4h_psl_m{d}")]
    return out.withColumn(out_col, expr).drop(*drop)


def _host_to_ascii(host: str | None) -> str | None:
    """IDNA (punycode) ASCII form of one hostname: lowercase, trailing
    root dots stripped, each non-ASCII label encoded via the stdlib
    ``idna`` codec (RFC 3490 ToASCII — xn-- labels); already-ASCII
    labels pass through unchanged, and already-encoded ``xn--`` labels
    are left alone. Unencodable hosts (empty, over-long label, ASCII
    form over RFC 1035's 253-octet hostname limit, codec errors)
    → None, mirroring try_parse_url's NULL-for-malformed contract."""
    if host is None:
        return None
    h = host.rstrip(".").lower()
    if h == "":
        return None
    out = []
    for label in h.split("."):
        if label.isascii():
            if label == "" or len(label) > 63:
                return None
            out.append(label)
            continue
        try:
            enc = label.encode("idna").decode("ascii")
        except UnicodeError:
            return None
        if len(enc) > 63:
            return None
        out.append(enc)
    joined = ".".join(out)
    # per-label 63-octet checks don't bound the whole name: RFC 1035
    # caps the full hostname at 253 octets (255 wire bytes minus the
    # root dot's length byte and the terminal zero)
    if len(joined) > 253:
        return None
    return joined


def idna_ascii_hosts(
    df: DataFrame,
    host_col: str = "host",
    out_col: str = "ascii_host",
    strategy: str | None = None,
) -> DataFrame:
    """Punycode/IDNA normalization of a hostname column — the step an
    international crawl runs BEFORE any ASCII domain logic: the real
    public-suffix list ships punycode rules, so
    :func:`registrable_domain_psl` (and per-domain caps, frontier keys)
    must see ``xn--bcher-kva.example``, not ``bücher.example``.
    Arrow-batched ``mapInPandas`` (the repo's no-row-at-a-time-UDF
    rule; the stdlib ``idna`` codec isn't expressible as JVM Columns).
    Unencodable hosts → NULL.

    ``strategy`` picks where the Python kernel runs (results are
    identical — test-pinned law):

    - ``"dict"`` (batch default): encode the DISTINCT hosts only, then
      join the tiny (host → ascii_host) dictionary back. Crawl host
      columns are Zipfian — the distinct-host dictionary is orders of
      magnitude smaller than the row count, so the per-row Python cost
      drops by the duplication factor; the join is AQE-broadcastable
      (the mapped side is frontier-of-hosts-sized, never corpus-sized).
      Not streaming-legal (distinct + join on the stream side) —
      explicitly requesting it on a streaming frame raises here rather
      than failing at query start.
    - ``"rowwise"`` (streaming default): run the codec over every row,
      map-side, zero shuffles — always streaming-legal; on batch,
      faster only when hosts are nearly unique (no duplication to
      amortize) and the join exchange would dominate.
    - ``None`` (default): ``"dict"`` on a batch frame, ``"rowwise"`` on
      a streaming one.
    """
    from pyspark.sql import types as T

    if strategy is None:
        strategy = "rowwise" if df.isStreaming else "dict"
    if strategy not in ("dict", "rowwise"):
        raise ValueError(
            f"strategy must be 'dict' or 'rowwise', got {strategy!r}"
        )
    if strategy == "dict" and df.isStreaming:
        raise ValueError(
            "strategy='dict' needs a distinct+join over the host column, "
            "which is not streaming-legal — use strategy='rowwise' (the "
            "streaming default) for streaming frames"
        )
    if out_col in df.columns:
        raise ValueError(
            f"output column {out_col!r} already exists on the input; "
            "pass a different out_col or drop it first"
        )

    def kernel(batches):
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out_col] = [_host_to_ascii(h) for h in pdf[host_col]]
            yield pdf

    if strategy == "rowwise":
        # build the output schema structurally (a DDL string would
        # break on names needing quoting)
        schema = T.StructType(
            list(df.schema.fields) + [T.StructField(out_col, T.StringType())]
        )
        return df.mapInPandas(kernel, schema)

    host_field = df.schema[host_col]
    dict_schema = T.StructType(
        [host_field, T.StructField(out_col, T.StringType())]
    )
    mapping = (
        df.select(host_col)
        .where(F.col(host_col).isNotNull())
        .distinct()
        .mapInPandas(kernel, dict_schema)
    )
    # NULL hosts never match the left join and land on the NULL
    # ascii_host the contract requires anyway
    return df.join(mapping, on=host_col, how="left").select(
        *df.columns, out_col
    )


# query parameters that carry tracking/session state, never content
# identity — the standard strip set of crawl canonicalizers (utm_*,
# click ids, mail/campaign ids). Matched against the PARAM NAME.
# Bare 'ref' is deliberately NOT in the default set: on many real
# sites it is content-bearing (e.g. ?ref=branch on code hosting), so
# stripping it would merge genuinely distinct pages; callers whose
# corpus uses 'ref' only as a referrer tag can pass a stricter
# tracking_re (the social-referrer form ref_src stays stripped).
TRACKING_PARAM_RE = (
    r"(?i)^(utm_[a-z0-9_]+|gclid|fbclid|msclkid|dclid|mc_eid|mc_cid"
    r"|igshid|ref_src|_ga|yclid)$"
)

# Version of the canonical-key FORMAT :func:`canonicalize_url` emits.
# Canonical URLs are long-lived state — frontier dedup tables, stored
# dedup groups, crawl bookkeeping keyed by canonical URL all persist
# across code deployments — so any change to the emitted string is a
# KEY-FORMAT BREAK: keys persisted under an older version silently stop
# matching newly computed ones. Persist this number ALONGSIDE stored
# canonical keys and rebuild (re-canonicalize from the raw URL) on
# mismatch instead of comparing across versions. History:
#   1 — original form (bare ``ref`` stripped as tracking; no
#       percent-normalization of path/query).
#   2 — bare ``ref`` no longer in the default tracking set (it is
#       content-bearing on many sites) and :func:`_pct_normalize` runs
#       over path and query, so e.g. ``/a%2Fb`` → ``/a%2Fb`` (upper
#       hex) and ``/%61`` → ``/a``. A v1 key like
#       ``http://ex.com/x`` computed from ``/x?ref=nav`` is NOT the v2
#       key (``http://ex.com/x?ref=nav``), and ``/%61`` keys differ.
#   3 — non-ASCII characters in path and query percent-encode to
#       upper-hex UTF-8 triplets (:func:`_pct_encode_nonascii`), so the
#       canonical key is always a valid all-ASCII URI and the raw-é and
#       %-spelled fetches of the same page (``/café`` vs ``/caf%C3%A9``)
#       finally collapse — the same consistent-encoding pass the robots
#       matcher uses. v2 keys containing raw non-ASCII differ from
#       their v3 forms; all-ASCII v2 keys are unchanged. (Hosts are
#       NOT percent-encoded — international hosts are IDNA's job,
#       see :func:`idna_ascii_hosts`.)
CANONICALIZER_VERSION = 3


_UNRESERVED_CODES = (45, 46, 95, 126)  # '-' '.' '_' '~'


def _pct_normalize(s: Column) -> Column:
    """Bounded percent-encoding normalization (RFC 3986 §2.3 / §6.2.2)
    as pure JVM Columns — the subset a crawl canonicalizer needs
    without a full decoder: one left-to-right pass over ``%``-split
    segments where each well-formed ``%XX`` triplet either DECODES (XX
    is an unreserved octet: ALPHA / DIGIT / ``-`` ``.`` ``_`` ``~``,
    so ``%41`` → ``A``, ``%7e`` → ``~``) or keeps the ``%`` with the
    hex UPPERCASED (``%3a`` → ``%3A`` — reserved octets stay encoded,
    percent-variant keys still collapse). A ``%`` not followed by two
    hex digits passes through verbatim. Single-pass means
    double-encoding is left alone: ``%2541`` keeps its ``%25`` (the
    encoded ``%`` is reserved) and the trailing ``41`` is plain text.
    Decoding never emits ``%``/``/``/``&``/``=`` (none are unreserved),
    so it is safe to run before slash-collapse and param-split, and the
    result is a fixed point of the pass itself (idempotence is
    test-pinned)."""
    parts = F.split(s, "%", -1)

    def seg_fix(seg: Column) -> Column:
        hex2 = F.upper(F.substring(seg, 1, 2))
        is_triplet = seg.rlike("^[0-9A-Fa-f]{2}")
        code = F.conv(hex2, 16, 10).cast("int")
        unreserved = (
            ((code >= 48) & (code <= 57))
            | ((code >= 65) & (code <= 90))
            | ((code >= 97) & (code <= 122))
            | code.isin(*_UNRESERVED_CODES)
        )
        tail = F.substr(seg, F.lit(3))
        return (
            F.when(~is_triplet, F.concat(F.lit("%"), seg))
            .when(unreserved, F.concat(F.char(code), tail))
            .otherwise(F.concat(F.lit("%"), hex2, tail))
        )

    return F.concat(
        F.element_at(parts, 1),
        F.array_join(
            F.transform(F.slice(parts, 2, F.size(parts)), seg_fix), ""
        ),
    )


_HEX_DIGITS = set("0123456789abcdefABCDEF")


def _pct_normalize_py(s: str) -> str:
    """Python twin of :func:`_pct_normalize` — SAME pass, same
    semantics, for code that must normalize on the driver (robots rule
    patterns are compiled once per host in Python; the URLs they match
    are normalized by the Column twin, and the two MUST agree or rules
    silently under-block). Equivalence is test-pinned."""
    parts = s.split("%")
    out = [parts[0]]
    for seg in parts[1:]:
        h = seg[:2]
        if len(h) == 2 and h[0] in _HEX_DIGITS and h[1] in _HEX_DIGITS:
            code = int(h, 16)
            if (
                48 <= code <= 57
                or 65 <= code <= 90
                or 97 <= code <= 122
                or code in _UNRESERVED_CODES
            ):
                out.append(chr(code) + seg[2:])
            else:
                out.append("%" + h.upper() + seg[2:])
        else:
            out.append("%" + seg)
    return "".join(out)


def _pct_encode_nonascii(s: Column) -> Column:
    """Percent-encode every non-ASCII character as its upper-hex UTF-8
    octets (``é`` → ``%C3%A9``) — the other half of consistent
    percent-encoding (RFC 9309 §2.2.2 / RFC 3986 §6.2.2): a URL stored
    with a raw ``é`` and one stored ``%C3%A9`` must normalize to the
    SAME match target. ASCII (including existing ``%`` triplets) passes
    through untouched, so composing with :func:`_pct_normalize` never
    double-encodes. The per-character transform only runs when the
    string actually contains a non-ASCII character — the overwhelmingly
    common all-ASCII row keeps its cheap single-predicate path."""
    chars = F.split(s, "")
    enc = F.array_join(
        F.transform(
            chars,
            lambda c: F.when(
                c.rlike("^[\\x00-\\x7F]$") | (c == ""),
                c,
            ).otherwise(
                F.regexp_replace(F.hex(F.encode(c, "UTF-8")), "(..)", r"%$1")
            ),
        ),
        "",
    )
    return F.when(s.rlike("[^\\x00-\\x7F]"), enc).otherwise(s)


def _pct_encode_nonascii_py(s: str) -> str:
    """Python twin of :func:`_pct_encode_nonascii` (same contract)."""
    if s.isascii():
        return s
    return "".join(
        ch
        if ord(ch) < 128
        else "".join(f"%{b:02X}" for b in ch.encode("utf-8"))
        for ch in s
    )


def _robots_match_normalize_py(s: str) -> str:
    """The shared robots match normalization, driver side: non-ASCII →
    upper-hex UTF-8 percent triplets, then the bounded RFC 3986 pass
    (unreserved triplets decode, other hex uppercases). Applied to rule
    patterns at compile time; :func:`robots_filter` applies the Column
    composition (:func:`_pct_encode_nonascii` → :func:`_pct_normalize`)
    to each URL's match target, so ``Disallow: /café`` blocks
    ``/caf%C3%A9`` and ``Disallow: /caf%c3%a9`` blocks ``/café``."""
    return _pct_normalize_py(_pct_encode_nonascii_py(s))


def canonicalize_url(url: Column, tracking_re: str = TRACKING_PARAM_RE) -> Column:
    """Canonical form of a URL — the normalization every crawl pipeline
    runs BEFORE URL-level dedup, so the same page fetched as
    ``HTTP://u@Ex.COM:80//a/?utm_source=f&b=2&a=1#x`` and
    ``http://ex.com/a?a=1&b=2`` collapses to one key:

    - scheme and host lowercased; trailing root dots stripped from the
      host; userinfo (credentials) and the fragment DROPPED;
    - ports compared and emitted NUMERICALLY (``:080`` ≡ ``:80``):
      default ports removed (``:80`` for http, ``:443`` for https);
      any other VALID explicit port (1–65535) is identity-bearing and
      kept, leading-zeros-normalized; an authority carrying a port
      that fails 1 ≤ port ≤ 65535 (``:0``, ``:99999``, ``:123456``)
      makes the WHOLE URL NULL — one policy for every malformed port,
      so malformed-port variants can never collapse into (or mint)
      a canonical key;
    - path: percent-normalized (non-ASCII → upper-hex UTF-8 triplets
      via :func:`_pct_encode_nonascii`, then :func:`_pct_normalize` —
      unreserved octets decode, remaining hex uppercases,
      double-encoding left alone — so ``/café`` and ``/caf%c3%a9``
      yield the same all-ASCII key), then runs of ``/`` collapse to
      one, the trailing slash is stripped, and the empty path becomes
      ``/``;
    - query: percent-normalized the same way, then parameters matching
      ``tracking_re`` (by NAME) are dropped, the survivors are sorted
      bytewise and rejoined — parameter order is transport noise, not
      identity; an emptied query loses its ``?``. Note bare ``ref`` is
      content-bearing on many sites and NOT stripped by default (see
      :data:`TRACKING_PARAM_RE`).

    NULL/malformed input → NULL (``try_parse_url`` semantics). Pure
    Column expressions — zero Python, whole-stage-codegen, the shape a
    100 TB crawl's very first projection needs.

    The emitted string is a PERSISTED KEY FORMAT, currently
    :data:`CANONICALIZER_VERSION` — stamp that version next to any
    stored canonical keys and rebuild on mismatch (the v1 → v2 break
    is documented at the constant)."""
    proto = F.lower(F.try_parse_url(url, F.lit("PROTOCOL")))
    host = F.regexp_replace(
        F.lower(F.try_parse_url(url, F.lit("HOST"))), r"\.+$", ""
    )
    auth = F.try_parse_url(url, F.lit("AUTHORITY"))
    # numeric port: ':080' must equal ':80' both in the default-port
    # test and in the emitted canonical form, however many leading
    # zeros (':000080' included — 0* strips them BEFORE the 1-5-digit
    # significant extract, so zero-padding can never flip a valid port
    # into the malformed bucket). The extract keeps the cast ANSI-safe
    # (≤99999 < 2³¹); a 6+-significant-digit run fails it, leaving port
    # NULL while rawport is non-empty — which the validity check below
    # turns into a NULL URL. nullif guards the no-match '' under ANSI
    # cast semantics.
    rawport = F.regexp_extract(auth, r":(\d+)$", 1)
    port = F.nullif(
        F.regexp_extract(auth, r":0*(\d{1,5})$", 1), F.lit("")
    ).cast("int")
    bad_port = (rawport != "") & (
        port.isNull() | (port < 1) | (port > 65535)
    )
    keep_port = port.isNotNull() & ~(
        ((proto == "http") & (port == 80))
        | ((proto == "https") & (port == 443))
    )
    rawpath = F.try_parse_url(url, F.lit("PATH"))
    path = F.regexp_replace(
        F.regexp_replace(
            _pct_normalize(
                _pct_encode_nonascii(F.coalesce(rawpath, F.lit("")))
            ),
            r"/{2,}",
            "/",
        ),
        r"/$",
        "",
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.try_parse_url(url, F.lit("QUERY"))
    params = F.filter(
        F.split(
            _pct_normalize(_pct_encode_nonascii(F.coalesce(q, F.lit("")))),
            "&",
        ),
        lambda p: (p != "")
        & ~F.regexp_extract(p, r"^([^=]*)", 1).rlike(tracking_re),
    )
    query = F.array_join(F.array_sort(params), "&")
    return F.when(
        proto.isNull() | host.isNull() | (host == "") | bad_port,
        F.lit(None).cast("string"),
    ).otherwise(
        F.concat(
            proto,
            F.lit("://"),
            host,
            F.when(
                keep_port, F.concat(F.lit(":"), port.cast("string"))
            ).otherwise(F.lit("")),
            path,
            F.when(query != "", F.concat(F.lit("?"), query)).otherwise(F.lit("")),
        )
    )


def url_dedup_groups(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    tracking_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """URL-level dedup rollup: group by :func:`canonicalize_url` and
    emit (canonical_url, n_docs, keep_id) with ``keep_id`` the lowest
    id — the fetch-once decision a crawl frontier makes. Malformed URLs
    group under the NULL key (callers decide their policy, as in
    ``domain_cap_sample``). ONE exchange on the canonical key."""
    return (
        df.select(
            canonicalize_url(F.col(url_col), tracking_re).alias("canonical_url"),
            F.col(id_col),
        )
        .groupBy("canonical_url")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.min(id_col).alias("keep_id"),
        )
    )


def rekey_canonical_urls(
    df: DataFrame,
    stored_version: int,
    key_col: str = "canonical_url",
    tracking_re: str = TRACKING_PARAM_RE,
) -> DataFrame:
    """Migrate a table of persisted canonical keys (a frontier dedup
    table, stored dedup groups, crawl bookkeeping) from the
    ``stored_version`` key format to :data:`CANONICALIZER_VERSION` —
    the in-place arm of the "stamp the version, rebuild on mismatch"
    discipline the constant's docstring prescribes, for the migrations
    where the stored KEY still carries everything the new format needs:

    - ``stored_version == CANONICALIZER_VERSION``: returned unchanged.
    - ``stored_version == 2``: re-canonicalizes the stored key. The
      v2 → v3 break only ADDED the non-ASCII percent-encoding pass —
      every other pass is already a fixed point on a v2 key — so
      re-canonicalizing the v2 KEY equals fresh v3 canonicalization of
      the original raw URL (the rekey law, test-pinned). All-ASCII v2
      keys come back byte-identical.
    - ``stored_version == 1``: RAISES. v1 stripped content-bearing
      ``ref`` params, so the information is gone from the key — a v3
      key is NOT derivable; re-canonicalize from the raw URLs instead.
    - anything else: raises (unknown or future format).

    Pure Column rewrite (one projection, no shuffle); pair it with a
    version-stamp update in the same write."""
    if stored_version == CANONICALIZER_VERSION:
        return df
    if stored_version == 1:
        raise ValueError(
            "canonical keys stored under format v1 are lossy (bare "
            "'ref' params were stripped) — the current key cannot be "
            "derived from the stored key; re-run canonicalize_url over "
            "the raw URLs instead"
        )
    if stored_version != 2:
        raise ValueError(
            f"unknown canonical-key format version {stored_version} "
            f"(this build writes v{CANONICALIZER_VERSION}, rekeys v2)"
        )
    if key_col not in df.columns:
        raise ValueError(f"column {key_col!r} not in {df.columns}")
    return df.withColumn(
        key_col, canonicalize_url(F.col(key_col), tracking_re)
    )


def load_frontier(
    spark,
    path: str,
    key_col: str = "canonical_url",
    version_col: str = "canonicalizer_version",
    stored_version: int | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Load a PERSISTED crawl frontier and normalize its canonical-key
    format to :data:`CANONICALIZER_VERSION` — the load-path arm of the
    version-stamp discipline, so a frontier stored under the v2 key
    format is detected and rekeyed at the boundary instead of silently
    mixing two key spellings with fresh v3 keys downstream (r14 verdict
    order #6; :func:`rekey_canonical_urls` is the migration itself).

    The stored format is read from the ``version_col`` stamp column
    (written next to the keys, per the CANONICALIZER_VERSION
    docstring); a frontier stored before stamping existed passes
    ``stored_version`` explicitly instead. Mixed stamps in one table
    fail loud — that table has already been corrupted by an unversioned
    append and needs a raw-URL rebuild, not a blanket rekey. Rekeyed
    and already-current tables alike come back with ``version_col``
    (re)stamped to the CURRENT version, so the next writer persists a
    truthful stamp. One INFO log line records any migration — the
    observable the operator asked for.

    Scale shape: the version check is an O(distinct-stamps) aggregate
    on the stamp column (two-value collect, never rows); the rekey is
    a pure Column projection (zero exchanges)."""
    import logging

    df = spark.read.format(fmt).load(path)
    if key_col not in df.columns:
        raise ValueError(f"column {key_col!r} not in stored frontier {path}")
    stamps: list | None = None
    if version_col in df.columns:
        stamps = [
            r[0]
            for r in df.select(version_col).distinct().limit(3).collect()
        ]
    if stored_version is None:
        if stamps is None:
            raise ValueError(
                f"stored frontier {path} carries no {version_col!r} stamp "
                "column — pass stored_version explicitly (and stamp the "
                "next write; see CANONICALIZER_VERSION)"
            )
        if not stamps:
            # zero-row frontier: nothing to rekey, no stamp to read —
            # a legitimate first-run load, not corruption (review r15)
            stored_version = CANONICALIZER_VERSION
        elif len(stamps) != 1 or stamps[0] is None:
            raise ValueError(
                f"stored frontier {path} carries mixed/NULL {version_col!r} "
                f"stamps {sorted(stamps, key=str)} — an unversioned append "
                "already corrupted it; rebuild from raw URLs instead of "
                "rekeying"
            )
        else:
            stored_version = int(stamps[0])
    elif stamps and any(
        s is None or int(s) != stored_version for s in stamps
    ):
        # an explicit version must not silently override a present,
        # contradicting stamp — that re-enables exactly the silent
        # key-format mixing this loader exists to prevent. NULL stamps
        # count as disagreement too: they mark an unversioned append
        # (the corruption the implicit path rejects), and letting an
        # explicit version sail past them would restamp every row
        # uniform and launder the corruption permanently (review r15
        # pass 2)
        if any(s is None for s in stamps):
            remedy = (
                "NULL stamps mark an unversioned append — the implicit "
                "path rejects this table too; rebuild from raw URLs"
            )
        else:
            remedy = "trust the stamp (drop stored_version) or rebuild"
        raise ValueError(
            f"stored frontier {path} is stamped {version_col!r}="
            f"{sorted(set(stamps), key=str)} but stored_version="
            f"{stored_version} was passed — the stamp and the caller "
            f"disagree; {remedy}"
        )
    out = rekey_canonical_urls(df, stored_version, key_col=key_col)
    if stored_version != CANONICALIZER_VERSION:
        logging.getLogger(__name__).info(
            "load_frontier: rekeyed %s from canonical-key format v%d to "
            "v%d (%s migrated in place)",
            path,
            stored_version,
            CANONICALIZER_VERSION,
            key_col,
        )
    return out.withColumn(version_col, F.lit(CANONICALIZER_VERSION))


def domain_of(url: Column, extra_suffixes: tuple[str, ...] = ()) -> Column:
    """Registrable domain straight from a URL — the composition
    ``registrable_domain(url_host(url))``, the expression a 100 TB web
    pipeline's very first groupBy keys on."""
    return registrable_domain(url_host(url), extra_suffixes)


def domain_cap_sample(
    df: DataFrame,
    url_col: str = "url",
    quality_col: str = "quality",
    cap: int = 100,
    id_col: str = "doc_id",
    salt_buckets: int = 0,
    extra_suffixes: tuple[str, ...] = (),
    malformed: str = "cap",
) -> DataFrame:
    """Per-domain rate cap: keep at most ``cap`` documents per
    registrable domain, the highest-``quality_col`` first (ties break to
    the lowest id — fully deterministic). The anti-mega-domain filter
    every web corpus applies so one crawl-heavy host cannot dominate
    the training mixture.

    ``salt_buckets=0`` is ONE window over the domain exchange.
    ``salt_buckets=S > 0`` runs the exact two-stage top-k: stage 1 takes
    the per-(domain, id%S) top-``cap`` — any global top-cap row is
    top-cap inside its salt bucket, so nothing eligible is lost — and
    stage 2 ranks only the ≤ S·cap survivors per domain. At 100 TB a
    single mega-domain (1e8 pages) would otherwise sort entirely inside
    one window partition; with salting no task ever sorts more than its
    bucket. Result is identical either way (asserted by test law).

    ``malformed`` decides what happens to rows whose URL fails to parse
    (``domain`` NULL) — a deliberate caller decision, not an accident:

    - ``"cap"`` (default): the NULL domain is treated as one
      pseudo-domain and capped like any other, so at most ``cap``
      malformed-URL documents survive. Appropriate when malformed URLs
      are junk you want bounded, not preserved.
    - ``"keep"``: malformed rows pass through uncapped with
      ``domain_rank`` NULL (they never enter a window partition).
    - ``"drop"``: malformed rows are filtered out entirely.

    Returns the input columns plus ``domain`` and ``domain_rank``.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if malformed not in ("cap", "keep", "drop"):
        raise ValueError(
            f"malformed must be 'cap', 'keep' or 'drop', got {malformed!r}"
        )
    with_dom = df.withColumn(
        "domain", domain_of(F.col(url_col), extra_suffixes)
    )
    kept = None
    if malformed == "drop":
        with_dom = with_dom.filter(F.col("domain").isNotNull())
    elif malformed == "keep":
        kept = with_dom.filter(F.col("domain").isNull()).withColumn(
            "domain_rank", F.lit(None).cast("long")
        )
        with_dom = with_dom.filter(F.col("domain").isNotNull())
    order = [F.col(quality_col).desc(), F.col(id_col).asc()]
    if salt_buckets > 0:
        salt = F.pmod(F.col(id_col), F.lit(salt_buckets))
        w1 = Window.partitionBy(F.col("domain"), salt).orderBy(*order)
        with_dom = (
            with_dom.withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= cap)
            .drop("_r1")
        )
    w = Window.partitionBy("domain").orderBy(*order)
    capped = (
        with_dom.withColumn("domain_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("domain_rank") <= cap)
    )
    if kept is not None:
        capped = capped.unionByName(kept.select(*capped.columns))
    return capped


# --------------------------------------------------------------------------
# HTML text extraction: the step between raw crawl and the text-quality /
# dedup stack. Pure JVM regexp Column expressions — no Python, no parser
# library — following the pragmatic extractor every large crawl pipeline
# starts from (drop invisible blocks, strip tags, decode the common
# entities, normalize whitespace).
# --------------------------------------------------------------------------

# decode order matters and is single-pass by construction: the named
# entities first, '&amp;' LAST, so '&amp;lt;' round-trips to the literal
# text '&lt;' instead of being double-decoded to '<'.
_HTML_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),
]


def _drop_invisible_blocks(html: Column) -> Column:
    """Remove the markup blocks whose content is never visible text —
    the ``<head>`` block, ``<script>``/``<style>`` blocks, and comments.
    SHARED by :func:`html_text` and :func:`html_link_count` so the two
    can never disagree about what counts as visible markup (the
    anchor-count-vs-text consistency contract)."""
    t = F.regexp_replace(html, r"(?is)<head\b[^>]*>.*?</head\s*>", " ")
    t = F.regexp_replace(t, r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>", " ")
    return F.regexp_replace(t, r"(?s)<!--.*?-->", " ")


def html_text(html: Column) -> Column:
    """Visible text of an HTML document: drops the ``<head>`` block and
    ``<script>``/``<style>`` blocks wholesale (their content is never
    body text), strips comments and all remaining tags to a space,
    decodes the six ubiquitous entities (single-pass, ``&amp;`` last),
    and collapses whitespace. NULL html → NULL. A regex extractor is
    deliberately NOT a browser: it trades CDATA/conditional-comment
    corners for a pure-JVM whole-stage-codegen pipeline with zero
    Python in the hot path."""
    t = _drop_invisible_blocks(html)
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, rep in _HTML_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, r"\s+", " "))


def html_title(html: Column) -> Column:
    """Content of the first ``<title>`` element, whitespace-collapsed;
    NULL when absent or empty."""
    raw = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    return F.nullif(F.trim(F.regexp_replace(raw, r"\s+", " ")), F.lit(""))


def html_link_count(html: Column) -> Column:
    """Number of anchor (``<a ...>``, ``<a>``, ``<a/>``) opening tags in
    the VISIBLE markup — the same head/script/style/comment blocks that
    :func:`html_text` drops are dropped first, so an ``<a`` inside a
    script string or a commented-out nav block is never counted and the
    count agrees with the visible-text semantics of the extraction
    frame (shared :func:`_drop_invisible_blocks`, so the two can never
    desynchronize)."""
    return F.coalesce(
        F.array_size(
            F.regexp_extract_all(
                _drop_invisible_blocks(html), F.lit(r"(?i)<a[\s/>]"), 0
            )
        ),
        F.lit(0),
    ).cast("int")


def html_extract(
    df: DataFrame, html_col: str = "html", id_col: str = "doc_id"
) -> DataFrame:
    """One-pass extraction frame over an HTML column: id, title, link
    count, visible text and its length. Map-side only — every column is
    a JVM regexp expression over the same input, so Catalyst keeps the
    whole thing in one codegen stage with zero exchanges."""
    h = F.col(html_col)
    text = html_text(h)
    return df.select(
        F.col(id_col),
        html_title(h).alias("title"),
        html_link_count(h).alias("n_links"),
        text.alias("text"),
        F.length(text).cast("long").alias("n_chars"),
    )


# ---------------------------------------------------------------------------
# robots.txt politeness (RFC 9309) — the filter between frontier dedup and
# fetch: a crawl that ignores robots rules gets blocked, and a 100 TB
# pipeline re-checks the stored rules when it re-processes stored URLs.
# ---------------------------------------------------------------------------


def _robots_walk(
    text: str | None,
) -> tuple[
    list[tuple[list[str], list[tuple[bool, str]]]],
    list[tuple[list[str], str]],
]:
    """One pass over a robots.txt body shared by :func:`parse_robots`
    and :func:`parse_crawl_delay`: returns ``(groups, delays)`` where
    ``groups`` is ``[(agents, [(allow, raw_pattern), ...]), ...]`` with
    RFC 9309 grouping (a ``User-agent`` run opens a group, allow /
    disallow lines populate it) and ``delays`` is
    ``[(group_agents, raw_value), ...]`` for every ``Crawl-delay``
    line. Crawl-delay is NOT part of RFC 9309's grammar, so — like
    Sitemap and unknown directives — it MUST NOT perturb rule grouping
    (§2.2.4's other-records-must-not-interfere; a delay line between
    two User-agent lines must not split their run, or an agent the
    site meant to Disallow gets an empty matched group and walks free).
    Delay attribution binds each delay to its STANZA — the contiguous
    ``User-agent`` sub-run immediately above the delay line — NOT to
    everything declared so far and not to the group's final merged
    list: the dominant real-world shape is rules-less per-bot stanzas
    ('slowbot: delay 60 // fastbot: delay 1 // *: rules'), which merge
    into ONE rule group under neutrality, and either wider attribution
    throttles part of the fleet to another bot's delay in at least one
    stanza ORDER (both were review-caught — final-list always, the
    declared-so-far snapshot when the slow stanza comes second). A
    Crawl-delay outside any user-agent stanza is dropped (mirrors the
    rules-outside-groups MUST)."""
    if not text:
        return [], []
    text = text.lstrip("\ufeff")  # BOM-prefixed robots.txt is common
    groups: list[tuple[list[str], list[tuple[bool, str]]]] = []
    delays: list[tuple[list[str], str]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    stanza_agents: list[str] = []  # the contiguous UA sub-run last seen
    open_group = False  # between a UA line and its first rule
    last_was_ua = False  # is the previous PARSED directive a UA line?

    def _close_group() -> None:
        nonlocal cur_agents, cur_rules
        if cur_agents or cur_rules:
            groups.append((cur_agents, cur_rules))
        cur_agents, cur_rules = [], []

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line:
            continue
        name, sep, value = line.partition(":")
        if not sep:
            continue  # unknown junk line: ignored per spec
        name = name.strip().lower()
        value = value.strip()
        if name == "user-agent":
            if not open_group:
                _close_group()
            open_group = True
            if not last_was_ua:
                stanza_agents = []  # a fresh UA sub-run starts a stanza
            last_was_ua = True
            if value:
                # an EMPTY UA value would be a zero-length token that
                # 'matches' everything — ignored; its rules fall into
                # an agentless group, which selection below skips
                cur_agents.append(value.lower())
                stanza_agents.append(value.lower())
        elif name in ("allow", "disallow"):
            open_group = False
            last_was_ua = False
            if value == "":
                continue  # empty Disallow/Allow: no restriction
            cur_rules.append((name == "allow", value))
        elif name == "crawl-delay":
            # grouping-NEUTRAL (open_group untouched); bound to the
            # UA STANZA immediately above (see the docstring), dropped
            # outside any stanza
            last_was_ua = False
            if value and stanza_agents:
                delays.append((list(stanza_agents), value))
        # Sitemap / unknown: ignored (and invisible to stanza tracking,
        # like blank/comment lines — they must not split a UA run)
    _close_group()
    return groups, delays


def _select_rules(groups, ua: str) -> list[tuple[bool, str]]:
    # exact product-token match; ALL matching groups merge; a matched
    # group masks '*' entirely even when rule-less (RFC 2.2.1)
    matched = False
    chosen: list[tuple[bool, str]] = []
    star: list[tuple[bool, str]] = []
    for agents, rules in groups:
        if ua in agents:
            matched = True
            chosen.extend(rules)
        if "*" in agents:
            star.extend(rules)
    return chosen if matched else star


def _select_delay(groups, delays, ua: str) -> float | None:
    import math

    # mirror the rule selection exactly: ANY group naming the exact
    # token masks the '*' groups for delays too — a site that addressed
    # this crawler explicitly and gave it no delay did NOT ask for the
    # '*' group's throttle
    matched = any(ua in agents for agents, _ in groups)
    if matched:
        chosen = [v for agents, v in delays if ua in agents]
    else:
        chosen = [v for agents, v in delays if "*" in agents]
    best: float | None = None
    for v in chosen:
        try:
            d = float(v)
        except ValueError:
            continue
        # reject non-finite values ('inf', '1e999'): an Infinity delay
        # would silently blackhole the host in the fetch scheduler
        if math.isfinite(d) and d > 0 and (best is None or d > best):
            best = d
    return best


def parse_robots(
    text: str | None, user_agent: str = "*"
) -> list[tuple[bool, str, int]]:
    """Parse ONE robots.txt body for ``user_agent`` per RFC 9309:
    returns ``(allow, pattern_regex, pattern_len)`` rules. Group
    selection is the spec's: ``user_agent`` is the crawler's bare
    product token compared case-insensitively for EXACT equality
    against each group's ``User-agent`` values (pass ``examplebot``,
    not ``examplebot/2.1`` — the RFC matches product tokens, not
    version strings); ALL groups matching the token merge (the RFC's
    MUST), falling back to the merged ``*`` groups, else no rules
    (crawl-allowed by default, the RFC's stance for an absent file).
    Patterns support the spec's ``*`` (any octets) and trailing ``$``
    (end anchor), compiled to anchored regexes and matched against
    path + ``?`` + query (see :func:`robots_filter`); ``pattern_len``
    is the rule's octet length, the spec's longest-match precedence key
    (allow wins ties — encode allow in the sort, see
    :func:`robots_filter`). Comments (``#``), unknown directives, a
    leading BOM and EMPTY ``User-agent:`` values are ignored; an empty
    ``Disallow:`` value means "no restriction" and emits no rule; rules
    OUTSIDE any user-agent group are ignored per the RFC's MUST.
    Rule patterns are percent-normalized at compile time (the shared
    :func:`_robots_match_normalize_py` pass; :func:`robots_filter`
    runs the Column twin over each URL's match target), so equivalent
    percent-spellings of rule and URL always meet — RFC 9309
    §2.2.2's consistent-encoding requirement — and ``pattern_len``
    counts the NORMALIZED octets so equivalent spellings carry equal
    precedence. NULL/empty text → no rules."""
    groups, _ = _robots_walk(text)
    return _compile_rules(_select_rules(groups, user_agent.lower()))


def _compile_rules(
    rules: list[tuple[bool, str]],
) -> list[tuple[bool, str, int]]:
    import re as _re

    out = []
    for allow, pat in rules:
        anchored = pat.endswith("$")
        body = pat[:-1] if anchored else pat
        # percent-normalize each literal piece (RFC 9309 §2.2.2 wants
        # consistent percent-encoding on both sides of the match; the
        # URL target gets the Column twin of the same pass in
        # robots_filter). Normalizing never creates or destroys a '*'
        # (42 is reserved, so %2A stays %2A), so splitting first is
        # safe, and an encoded asterisk never becomes a wildcard.
        pieces = [_robots_match_normalize_py(p) for p in body.split("*")]
        rx = ".*".join(_re.escape(piece) for piece in pieces)
        rx = "^" + rx + ("$" if anchored else "")
        # octets, not characters, of the NORMALIZED pattern: the RFC's
        # longest-match precedence counts bytes, and normalization
        # makes the equivalent spellings '/café' and '/caf%C3%A9'
        # carry EQUAL precedence (both 12 octets normalized) instead
        # of the raw-spelling accident
        norm_pat = "*".join(pieces) + ("$" if anchored else "")
        out.append((allow, rx, len(norm_pat.encode("utf-8"))))
    return out


def parse_crawl_delay(
    text: str | None, user_agent: str = "*"
) -> float | None:
    """``Crawl-delay`` (seconds) for ``user_agent`` from ONE robots.txt
    body, or None if the selected groups carry none. Not RFC 9309
    grammar — it is the widespread de-facto politeness directive a
    crawl SCHEDULER consumes (per-host fetch spacing), so this is the
    companion of :func:`parse_robots`, which deliberately ignores the
    lines. Group selection mirrors the RFC rule selection EXACTLY: any
    group naming the crawler's exact product token masks the ``*``
    groups entirely — even when the exact groups carry no delay (a site
    that addressed this crawler explicitly and gave it no delay did not
    ask for the ``*`` throttle). When several selected delays parse,
    the MAX (most polite) wins; unparseable, non-positive and
    non-finite values are ignored; NULL/empty text → None. The
    directive never perturbs RULE grouping (see :func:`_robots_walk`);
    each delay binds to the contiguous ``User-agent`` sub-run
    immediately above its line (its STANZA), so per-bot stanzas stay
    per-bot in every declaration order."""
    groups, delays = _robots_walk(text)
    return _select_delay(groups, delays, user_agent.lower())


def robots_filter(
    urls: DataFrame,
    robots: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "robots_txt",
    user_agent: str = "*",
    default_allow: bool = True,
    out_col: str = "allowed",
    delay_col: str | None = None,
    broadcast: bool = True,
) -> DataFrame:
    """Append ``out_col`` (boolean) to ``urls``: may this crawler fetch
    each URL under the per-host robots rules? ``robots`` is one row per
    host (host, robots_txt — what a polite crawler has already fetched
    and stored; hosts compare case-insensitively). RFC 9309 semantics:

    - rules match against PATH + ``?`` + QUERY (so ``/*?sessionid=``
      can match, and ``/p$`` does NOT match ``/p?x=1``);
    - the longest matching pattern wins (octet length), allow beats
      disallow ties;
    - a host whose robots.txt yields rules but NONE match → ALLOW (the
      RFC's implicit allow — regardless of ``default_allow``); an EMPTY
      robots body is the same allow-everything statement;
    - a host with NO robots row at all, or a row whose body is NULL
      (the crawler recorded a failed fetch — rules UNKNOWN, which is
      not the same as "no restrictions"), or a malformed URL with no
      host → ``default_allow``, the caller's policy.

    Both sides of the match are percent-normalized consistently
    (RFC 9309 §2.2.2): rule patterns at compile time in
    :func:`parse_robots`, the URL's path+query target here via the
    Column twin (:func:`_pct_encode_nonascii` → :func:`_pct_normalize`)
    — so ``Disallow: /café`` blocks ``/caf%C3%A9`` and vice versa.

    ``delay_col`` (optional): also emit the host's de-facto
    ``Crawl-delay`` (seconds, double, NULL when absent — see
    :func:`parse_crawl_delay`) so the fetch scheduler gets its per-host
    spacing from the same single parse of the robots body.

    ``broadcast`` (default True) plants the broadcast hint on the
    folded per-host rules table. At web scale that table is tens of
    millions of hosts × a rule array — beyond safe broadcast size —
    so pass ``broadcast=False`` to fall back to a shuffle join (AQE
    still picks a broadcast strategy when the fold turns out small).

    Scale shape (the IDNA dict pass applied to politeness): robots
    bodies are parsed ONCE PER HOST by an Arrow kernel over the
    rules-dictionary side — never per URL — folded to ONE rule-array
    row per lowercased host (duplicate host spellings merge; a NULL
    array survives the fold only if the host had no parseable body at
    all) and broadcast onto the URL stream. Matching and precedence are
    pure Column ops on the array (``filter`` by ``regexp_like`` +
    ``array_max`` over ``struct(len, allow)`` — rule ORDER never
    affects the verdict, so the merge is deterministic), the URL side
    never shuffles or windows, duplicate URL rows pass through
    untouched, and the only exchange anywhere is the dictionary-sized
    per-host fold on the broadcast side."""
    from pyspark.sql import types as T

    tmp_cols = [
        "__w4h_rb_host",
        "__w4h_rb_target",
        "__w4h_rb_rules",
        "__w4h_rb_delay",
        out_col,
    ]
    if delay_col is not None:
        tmp_cols.append(delay_col)
    for c in tmp_cols:
        if c in urls.columns:
            raise ValueError(f"column {c!r} already exists on the input")

    fields = [
        T.StructField(host_col, T.StringType()),
        T.StructField(
            "__w4h_rb_rules",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("_plen", T.IntegerType()),
                        T.StructField("_allow", T.BooleanType()),
                        T.StructField("_rx", T.StringType()),
                    ]
                )
            ),
        ),
    ]
    if delay_col is not None:
        fields.append(T.StructField("__w4h_rb_delay", T.DoubleType()))
    rule_schema = T.StructType(fields)

    def kernel(batches):
        import pandas as pd

        cols = [f.name for f in rule_schema.fields]
        ua = user_agent.lower()
        want_delay = delay_col is not None
        for pdf in batches:
            rows = []
            for host, body in zip(pdf[host_col], pdf[text_col]):
                # NULL body = failed fetch = rules UNKNOWN -> NULL array
                # (falls to default_allow); empty/parsed body -> a real
                # (possibly empty) rule list = the RFC's implicit allow
                if body is None:
                    rules_cell, delay = None, None
                else:
                    # ONE walk per body: rules and delay share it; the
                    # delay selection only runs when the caller asked
                    groups, dl = _robots_walk(body)
                    rules_cell = [
                        {"_plen": plen, "_allow": allow, "_rx": rx}
                        for allow, rx, plen in _compile_rules(
                            _select_rules(groups, ua)
                        )
                    ]
                    delay = (
                        _select_delay(groups, dl, ua) if want_delay else None
                    )
                row = (host, rules_cell)
                if want_delay:
                    row += (delay,)
                rows.append(row)
            yield pd.DataFrame(rows, columns=cols)

    rules = (
        robots.select(
            # JVM lower(), the SAME fold url_host applies to the URL
            # side — a Python str.lower here could disagree on non-ASCII
            # codepoints and silently miss the equi-join
            F.lower(F.col(host_col).cast("string")).alias(host_col),
            text_col,
        )
        .mapInPandas(kernel, rule_schema)
        # duplicate host spellings (incl. case variants) fold to ONE
        # broadcast row — without this the left join would fan every
        # URL row out per duplicate. collect_list drops NULL arrays, so
        # has-any-body is tracked separately to keep the NULL-body
        # (unknown rules) signal distinct from empty (allow-all).
        .groupBy(host_col)
        .agg(
            F.when(
                F.max(F.col("__w4h_rb_rules").isNotNull().cast("int")) == 1,
                F.flatten(F.collect_list("__w4h_rb_rules")),
            ).alias("__w4h_rb_rules"),
            *(
                []
                if delay_col is None
                # max = the most polite reading across duplicate
                # spellings of the same host, mirroring parse_crawl_delay
                else [F.max("__w4h_rb_delay").alias("__w4h_rb_delay")]
            ),
        )
    )

    # RFC match target: path + '?' + query (never the fragment),
    # percent-normalized by the Column twin of the pattern-compile pass
    # so both sides of the match use the same encoding (§2.2.2)
    path = F.coalesce(
        F.try_parse_url(F.col(url_col), F.lit("PATH")), F.lit("/")
    )
    path = F.when(path == "", F.lit("/")).otherwise(path)
    q = F.try_parse_url(F.col(url_col), F.lit("QUERY"))
    target = F.concat(
        path, F.when(q.isNotNull(), F.concat(F.lit("?"), q)).otherwise(F.lit(""))
    )
    target = _pct_normalize(_pct_encode_nonascii(target))
    keyed = urls.withColumn(
        "__w4h_rb_host", url_host(F.col(url_col))
    ).withColumn("__w4h_rb_target", target)
    joined = keyed.join(
        F.broadcast(rules) if broadcast else rules,
        keyed["__w4h_rb_host"] == rules[host_col],
        "left",
    ).drop(rules[host_col])
    hits = F.filter(
        F.col("__w4h_rb_rules"),
        lambda r: F.regexp_like(F.col("__w4h_rb_target"), r["_rx"]),
    )
    # RFC 9309 precedence as one fold: max over (pattern octets, allow)
    # — longest match wins, allow beats disallow on ties
    best = F.array_max(
        F.transform(
            hits,
            lambda r: F.struct(
                r["_plen"].alias("_plen"),
                r["_allow"].cast("int").alias("_a"),
            ),
        )
    )
    verdict = (
        # no robots row for this host (or NULL host): caller's policy
        F.when(F.col("__w4h_rb_rules").isNull(), F.lit(bool(default_allow)))
        # rules exist but none match: the RFC's implicit allow
        .when(best.isNull(), F.lit(True))
        .otherwise(best["_a"] == 1)
    )
    out = joined.withColumn(out_col, verdict)
    if delay_col is not None:
        out = out.withColumnRenamed("__w4h_rb_delay", delay_col)
    return out.drop("__w4h_rb_host", "__w4h_rb_target", "__w4h_rb_rules")


def schedule_frontier(
    df: DataFrame,
    host_col: str = "host",
    delay_col: str = "crawl_delay",
    order_col: str | None = None,
    ascending: bool = True,
    default_delay: float = 1.0,
    out_col: str = "fetch_offset_s",
) -> DataFrame:
    """Politeness-aware fetch offsets — the consumer of the
    ``crawl_delay`` column :func:`robots_filter` emits, closing the
    acquisition loop (verdict → delay → SCHEDULE → fetch): within each
    host, rows are ordered (by ``order_col`` if given, ties and default
    broken by the first column — pass the URL frame's key — for
    determinism) and the k-th fetch gets ``out_col = (k-1) ×
    coalesce(max(delay) over the host, default_delay)`` seconds — the
    earliest moment a polite crawler may issue it relative to schedule
    start. Hosts compare CASE-INSENSITIVELY (the same fold every other
    host consumer in this module applies), so case-variant spellings
    share one ladder instead of racing two t+0 fetches at one server;
    and the delay is the host's MAX across its rows, so a frame whose
    delay column mixes NULLs or disagreeing snapshots still honors the
    strictest published spacing. A NULL ``host_col`` row gets a NULL
    offset (a URL that didn't parse to a host cannot be paced against
    anything — and should not be fetched).

    Scale shape: ONE exchange (the per-host window) and nothing else —
    per-host sequencing is inherently host-clustered, so this is the
    minimal shuffle, and the window never sorts more than one host's
    rows per partition. Per-host row counts must be bounded UPSTREAM
    (that is :func:`domain_cap_sample`'s job — the salted two-stage
    cap); a 1e8-page mega-host fed into any per-host sequencer is a
    skew bug in the feeding query, not the scheduler. ``default_delay``
    is the polite floor for hosts that published no Crawl-delay."""
    if out_col in df.columns:
        raise ValueError(f"column {out_col!r} already exists on the input")
    first = df.columns[0]
    key = F.col(order_col) if order_col is not None else F.col(first)
    key = key.asc() if ascending else key.desc()
    hkey = F.lower(F.col(host_col))
    w = Window.partitionBy(hkey).orderBy(key, F.col(first).asc())
    # same partitioning, no ordering: shares the ONE exchange with the
    # row_number window — plan-pinned
    host_delay = F.max(F.col(delay_col).cast("double")).over(
        Window.partitionBy(hkey)
    )
    offset = (F.row_number().over(w) - F.lit(1)).cast("double") * F.coalesce(
        host_delay, F.lit(float(default_delay))
    )
    # NULL hosts are excluded BEFORE the window, not masked after it:
    # every malformed URL would otherwise hash to the SAME window
    # partition and a 100 TB crawl's junk tail would funnel through one
    # task's sort — the split costs a second map-side scan, the skew
    # bug costs a spill
    good = df.where(F.col(host_col).isNotNull()).withColumn(out_col, offset)
    bad = df.where(F.col(host_col).isNull()).withColumn(
        out_col, F.lit(None).cast("double")
    )
    return good.unionByName(bad)


def robots_sitemaps(text: str | None) -> list[str]:
    """``Sitemap:`` directives from a robots.txt body — RFC 9309 §2.3
    scopes them to the whole file (NOT to user-agent groups), so this
    collects them wherever they appear: absolute sitemap URLs in file
    order, deduplicated. The crawl-discovery companion of
    :func:`parse_robots` (which deliberately ignores these lines)."""
    if not text:
        return []
    out: list[str] = []
    seen: set[str] = set()
    for raw in text.lstrip("\ufeff").splitlines():
        line = raw.split("#", 1)[0].strip()
        name, sep, value = line.partition(":")
        if not sep or name.strip().lower() != "sitemap":
            continue
        value = value.strip()
        if value and value not in seen:
            seen.add(value)
            out.append(value)
    return out


def sitemap_urls(
    df: DataFrame, xml_col: str = "sitemap_xml", id_col: str = "doc_id"
) -> DataFrame:
    """Explode a sitemaps.org XML column (``<urlset>`` page lists OR
    ``<sitemapindex>`` index files) into one row per ``<loc>``:
    ``(id, loc, lastmod, is_index)`` — the crawl-discovery feed that
    seeds the URL frontier (chain: robots_sitemaps → fetch → this →
    canonicalize_url → robots_filter). ``is_index`` tells the caller
    whether each loc is a PAGE to fetch or ANOTHER SITEMAP to recurse
    into (the two element vocabularies are disjoint by spec, so one
    column per blob suffices).

    The html_extract discipline: pure JVM regexp + explode, zero
    Python, whole-stage codegen — deliberately not an XML parser (a
    sitemap's grammar is flat; CDATA corners are traded for a plan
    with no UDF). ``<loc>`` values are whitespace-trimmed and
    XML-entity-decoded (``&amp;`` is MANDATORY escaping inside sitemap
    URLs, so skipping the decode would corrupt every query-carrying
    URL). Entries without a ``<loc>`` and NULL/locless blobs yield no
    rows."""
    entries = F.regexp_extract_all(
        F.col(xml_col),
        F.lit(r"(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"),
        F.lit(1),
    )
    is_index = F.col(xml_col).rlike(r"(?is)<\s*sitemapindex")
    e = F.explode(entries).alias("_entry")
    exploded = df.select(F.col(id_col), is_index.alias("is_index"), e)
    loc = F.nullif(
        F.trim(
            F.regexp_extract(F.col("_entry"), r"(?is)<loc>(.*?)</loc>", 1)
        ),
        F.lit(""),
    )
    for ent, rep in _HTML_ENTITIES:
        loc = F.replace(loc, F.lit(ent), F.lit(rep))
    lastmod = F.nullif(
        F.trim(
            F.regexp_extract(
                F.col("_entry"), r"(?is)<lastmod>(.*?)</lastmod>", 1
            )
        ),
        F.lit(""),
    )
    return (
        exploded.select(
            id_col,
            loc.alias("loc"),
            lastmod.alias("lastmod"),
            "is_index",
        )
        .where(F.col("loc").isNotNull())
    )


def expand_sitemap_index(
    df: DataFrame,
    fetch,
    xml_col: str = "sitemap_xml",
    id_col: str = "doc_id",
    max_depth: int = 2,
) -> DataFrame:
    """Close the sitemap-discovery chain without caller loops: explode
    ``df``'s sitemap blobs with :func:`sitemap_urls`; PAGE locs
    accumulate; INDEX locs are handed to ``fetch`` and the returned
    blobs re-explode, up to ``max_depth`` fetch rounds.

    ``fetch(locs: DataFrame[id_col, loc]) -> DataFrame[id_col, loc,
    xml_col]`` is the caller's resolver — in a crawl pipeline a join
    against the stored blob archive (WARC extract keyed by target URI),
    NEVER a live HTTP call inside the plan. Rows it drops (or returns
    with a NULL blob) are UNFETCHED: they come back in the result still
    flagged ``is_index = true``, as do indices nested deeper than
    ``max_depth`` — the output tells the caller exactly which indices
    remain unopened alongside every discovered page row
    ``(id, loc, lastmod, is_index=false)``.

    Bounded by design: real sitemap trees are ≤ 2 levels deep (the
    50 000-loc cap is why indexes exist at all) and an UNBOUNDED
    recursion over attacker-controlled XML is a crawler trap, so depth
    is a hard parameter, each level is one ``fetch`` round for ALL
    pending indices at once (breadth-first — the fan-out stays in the
    cluster, never a per-loc driver loop), each level is
    localCheckpoint'ed so the probe / fetch / anti-join never
    re-execute prior levels' lineage, and one cheap ``isEmpty()``
    probe stops early when nothing is pending.
    Duplicate locs are preserved (dedup is the frontier's job
    downstream, where :func:`canonicalize_url` keys it)."""
    if max_depth < 0:
        raise ValueError(f"max_depth must be >= 0, got {max_depth}")
    cur = sitemap_urls(df, xml_col=xml_col, id_col=id_col)
    if max_depth == 0:
        # explode-only: stay LAZY (no action, no optimizer barrier —
        # a caller's filter can still push into the blob scan)
        return cur
    # each level is localCheckpoint'ed: the isEmpty probe, the fetch,
    # the unfetched anti-join and the final materialization would
    # otherwise each RE-EXECUTE the whole prior-level lineage
    # (including the caller's archive joins) — 3-4 redundant runs per
    # level. Depth ≥ 1 is action-bearing anyway (isEmpty), so the
    # eager materialization adds no new execution semantics there.
    cur = cur.localCheckpoint(eager=True)
    done = cur.where(~F.col("is_index"))  # pages accumulate here
    pending = cur.where(F.col("is_index"))
    for _ in range(max_depth):
        if pending.isEmpty():
            break
        fetched = fetch(pending.select(id_col, "loc"))
        fetched = fetched.where(F.col(xml_col).isNotNull()).localCheckpoint(
            eager=True
        )
        # indices the resolver could not open stay flagged in the output
        unfetched = pending.join(
            fetched.select(id_col, "loc"), on=[id_col, "loc"], how="left_anti"
        )
        done = done.unionByName(unfetched)
        child = sitemap_urls(
            fetched, xml_col=xml_col, id_col=id_col
        ).localCheckpoint(eager=True)
        done = done.unionByName(child.where(~F.col("is_index")))
        pending = child.where(F.col("is_index"))
    # depth exhausted: whatever is still pending is reported, not lost
    return done.unionByName(pending)

