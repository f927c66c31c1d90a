"""Crawl→corpus pipeline keys (r5 wave 8): charset sniffing, Unicode
normalization, robots.txt filtering, registrable-domain rollup, and the
corpus-frequency rarity filter.

Together with functions/warc.py (record walk) and functions/html_text.py
(visible text + URL canonicalization) these complete the crawl front-end:
bytes → charset → text → normalize → politeness filter → domain stats →
token-level quality. Fixtures follow the wave-6 convention — deterministic
closed forms of doc_id, so every oracle rebuilds the EXACT expected value
in SQL and one wrong byte hash-mismatches.

Scale notes live per key; the common shape: per-document work is
Arrow-batched mapInPandas (zero shuffle), the two relational keys
(robots, domains) put the small dimension (parsed rules / suffix list)
on the broadcast side so the 100 TB URL/document side never shuffles
for the match itself.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from flink_job_spark.functions.text import words, words_duck
from flink_job_spark.queries import register
from flink_job_spark.sources.tables import fan_out, load_table


# --- q_charset_sniff: BOM / UTF-8 / CP-1252 detection, value-exact --------------
#
# The first thing that happens to a WARC payload: find out what encoding
# the bytes are in. Five modes exercise every detection path — plain
# ASCII, unmarked UTF-8, UTF-8 with BOM, UTF-16-LE with BOM, and a
# CP-1252 fallback with a smart quote (0x92) that is INVALID UTF-8.

@register(
    "q_charset_sniff",
    """SELECT doc_id,
              CASE doc_id % 5 WHEN 0 THEN 'ascii'  WHEN 1 THEN 'utf-8'
                              WHEN 2 THEN 'utf-8'  WHEN 3 THEN 'utf-16-le'
                              ELSE 'cp1252' END AS charset,
              doc_id % 5 IN (2, 3) AS had_bom,
              CASE doc_id % 5
                   WHEN 0 THEN 'plain doc ' || doc_id
                   WHEN 1 THEN 'café № ' || doc_id || ' ✓'
                   WHEN 2 THEN 'café № ' || doc_id || ' ✓'
                   WHEN 3 THEN 'wide ' || doc_id || ' café'
                   ELSE 'smart ' || chr(8217) || 'quote' || chr(8217)
                        || ' café ' || doc_id
              END AS text,
              CAST(length(CASE doc_id % 5
                   WHEN 0 THEN 'plain doc ' || doc_id
                   WHEN 1 THEN 'café № ' || doc_id || ' ✓'
                   WHEN 2 THEN 'café № ' || doc_id || ' ✓'
                   WHEN 3 THEN 'wide ' || doc_id || ' café'
                   ELSE 'smart ' || chr(8217) || 'quote' || chr(8217)
                        || ' café ' || doc_id
              END) AS INT) AS n_chars
       FROM documents""",
    doc="charset sniffing: per-doc payload bytes in one of five real "
        "encodings (plain ASCII, unmarked UTF-8, UTF-8+BOM, UTF-16-LE+BOM, "
        "CP-1252 with a 0x92 smart quote that is invalid UTF-8) detected "
        "and decoded — charset, BOM flag and the exact decoded string "
        "verified closed-form; the bytes→text layer every WARC payload "
        "crosses first",
    tags=("text", "crawl", "formats"),
)
def q_charset_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle. At 100 TB
    the payload column rides the same scan partitioning as the WARC walk
    (functions/warc.py); detection is O(bytes) with no library calls."""
    import pandas as pd

    from flink_job_spark.functions.crawl_text import sniff_decode

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("charset", T.StringType()),
        T.StructField("had_bom", T.BooleanType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
    ])

    def run(it):
        for pdf in it:
            charsets, boms, texts, lens = [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                mode = i % 5
                if mode == 0:
                    payload = f"plain doc {i}".encode("ascii")
                elif mode == 1:
                    payload = f"café № {i} ✓".encode("utf-8")
                elif mode == 2:
                    payload = b"\xef\xbb\xbf" + f"café № {i} ✓".encode("utf-8")
                elif mode == 3:
                    payload = b"\xff\xfe" + f"wide {i} café".encode("utf-16-le")
                else:
                    payload = f"smart ’quote’ café {i}".encode("cp1252")
                r = sniff_decode(payload)
                charsets.append(r["charset"])
                boms.append(r["had_bom"])
                texts.append(r["text"])
                lens.append(len(r["text"]))
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "charset": charsets,
                "had_bom": boms, "text": texts,
                "n_chars": pd.array(lens, dtype="Int32")})

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(run, schema=schema)


# --- q_text_normalize: NFC + mojibake repair + control strip, value-exact -------
#
# The canonical-text policy every downstream hash/dedup/quality key
# assumes: four modes cover the no-op path, a CP-1252-in-UTF-8 mojibake
# string rebuilt byte-exactly ("Ã©"→"é", "â€”"→"—"), NFD composition +
# zero-width/NBSP cleanup, and control chars + whitespace runs.

@register(
    "q_text_normalize",
    """SELECT doc_id,
              CASE doc_id % 4
                   WHEN 0 THEN 'clean doc ' || doc_id || ' ok'
                   WHEN 1 THEN 'café ' || doc_id || ' ' || chr(8212) || ' x'
                   WHEN 2 THEN 'zéro ' || doc_id || ' end'
                   ELSE 'ctl ' || doc_id || ' mixed'
              END AS norm_text,
              CAST(length(CASE doc_id % 4
                   WHEN 0 THEN 'clean doc ' || doc_id || ' ok'
                   WHEN 1 THEN 'café ' || doc_id || ' ' || chr(8212) || ' x'
                   WHEN 2 THEN 'zéro ' || doc_id || ' end'
                   ELSE 'ctl ' || doc_id || ' mixed'
              END) AS INT) AS n_chars,
              doc_id % 4 = 1 AS fixed_mojibake,
              doc_id % 4 <> 0 AS changed
       FROM documents""",
    doc="Unicode text normalization: per-doc raw strings exercising "
        "CP-1252-in-UTF-8 mojibake repair (Ã©→é, â€”→em-dash, whole-string "
        "round-trip gated), NFD→NFC composition, zero-width/NBSP cleanup, "
        "control stripping and whitespace collapsing — the exact normalized "
        "string rebuilt closed-form in SQL; the canonical-text policy the "
        "dedup and quality families assume",
    tags=("text", "crawl", "quality"),
)
def q_text_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage, zero shuffle; pure stdlib
    (unicodedata) per row."""
    import pandas as pd

    from flink_job_spark.functions.crawl_text import normalize_text

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("norm_text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("fixed_mojibake", T.BooleanType()),
        T.StructField("changed", T.BooleanType()),
    ])

    def run(it):
        for pdf in it:
            texts, lens, fixed, changed = [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                mode = i % 4
                if mode == 0:
                    raw = f"clean doc {i} ok"
                elif mode == 1:
                    # byte-exact mojibake: UTF-8 of the clean string
                    # mis-decoded as CP-1252 (é → Ã©, — → â€”)
                    raw = (f"café {i} — x".encode("utf-8")
                           .decode("cp1252"))
                elif mode == 2:
                    raw = f"ze\u0301ro\u200b {i}\u00a0end"
                else:
                    raw = f"ctl\x07 {i}\t\n  mixed\x1f"
                r = normalize_text(raw)
                texts.append(r["text"])
                lens.append(len(r["text"]))
                fixed.append(r["fixed_mojibake"])
                changed.append(r["changed"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "norm_text": texts,
                "n_chars": pd.array(lens, dtype="Int32"),
                "fixed_mojibake": fixed, "changed": changed})

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)


# --- q_robots_filter: RFC 9309 longest-match politeness filter ------------------
#
# Crawl politeness as a RELATIONAL join, not a per-URL Python loop: the
# per-host robots.txt is parsed once into an Allow/Disallow rule table
# (pattern → SQL LIKE translation + RFC specificity length), broadcast,
# LIKE-joined against the URL table, and the longest matching rule wins
# (Allow on ties, no match → allowed). The fixture's robots.txt has a
# decoy googlebot group (Disallow: /) that group selection must skip, a
# wildcard+anchor rule (/*.zip$), an Allow override nested under a
# Disallow, an empty Allow: line that must be ignored, comments, and a
# Crawl-delay.

_ROBOTS_HOSTS = 5


def _robots_txt(k: int) -> str:
    return (
        f"# crawl policy for site{k}.com\n"
        "User-agent: googlebot\n"
        "Disallow: /\n"
        "\n"
        "User-agent: *\n"
        "Crawl-delay: 2\n"
        "Disallow: /private\n"
        "Allow: /private/ok\n"
        "Disallow: /*.zip$\n"
        "Allow:\n"
    )


@register(
    "q_robots_filter",
    f"""SELECT doc_id,
               'site' || (doc_id % {_ROBOTS_HOSTS}) || '.com' AS host,
               CASE doc_id % 4
                    WHEN 0 THEN '/public/page' || doc_id
                    WHEN 1 THEN '/private/x' || doc_id
                    WHEN 2 THEN '/private/ok/y' || doc_id
                    ELSE '/files/a' || doc_id || '.zip'
               END AS path,
               doc_id % 4 IN (0, 2) AS allowed,
               CASE doc_id % 4
                    WHEN 0 THEN NULL
                    WHEN 1 THEN '/private'
                    WHEN 2 THEN '/private/ok'
                    ELSE '/*.zip$'
               END AS matched_rule,
               CAST(2 AS INT) AS crawl_delay
        FROM documents""",
    doc="robots.txt politeness filter (RFC 9309): per-host policies with a "
        "decoy googlebot group, an Allow override under a Disallow prefix, "
        "a /*.zip$ wildcard+anchor rule, an ignored empty rule and a "
        "Crawl-delay are parsed into a rule table and longest-match joined "
        "against the URL stream — allowed flag, winning rule and delay "
        "verified closed-form",
    tags=("text", "crawl", "relational"),
)
def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The politeness filter as a broadcast LIKE-join: rules per host are
    a tiny dimension (a few rules × hosts — even at 100 TB of URLs the
    robots corpus is MB-scale after parsing), so the URL side never
    shuffles for the match. The join is LEFT so unmatched URLs stay
    in-flight as one null-rule row each, and the longest-match winner is
    ONE window over the join output — (specificity DESC NULLS LAST,
    allow DESC), row_number 1 — with no join-back of winners to the URL
    table (the first cut's SortMergeJoin, removed after a plan audit).
    One shuffle total: the per-URL window; at scale that window's key is
    the URL id, so AQE handles skew and a two-level max_by(struct) agg
    is the drop-in alternative if rank semantics are ever unneeded."""
    import pandas as pd

    from flink_job_spark.functions.crawl_text import parse_robots

    d = load_table(spark, sf_dir, "documents")
    urls = d.select(
        "doc_id",
        F.concat(F.lit("site"), (F.col("doc_id") % _ROBOTS_HOSTS).cast("string"),
                 F.lit(".com")).alias("host"),
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("/public/page"), F.col("doc_id").cast("string")))
         .when(F.col("doc_id") % 4 == 1,
               F.concat(F.lit("/private/x"), F.col("doc_id").cast("string")))
         .when(F.col("doc_id") % 4 == 2,
               F.concat(F.lit("/private/ok/y"), F.col("doc_id").cast("string")))
         .otherwise(
               F.concat(F.lit("/files/a"), F.col("doc_id").cast("string"),
                        F.lit(".zip"))).alias("path"),
    )

    hosts = urls.select("host").distinct()

    rules_schema = T.StructType([
        T.StructField("host", T.StringType(), False),
        T.StructField("allow", T.BooleanType(), False),
        T.StructField("pattern", T.StringType(), False),
        T.StructField("like_pat", T.StringType(), False),
        T.StructField("specificity", T.IntegerType(), False),
        T.StructField("crawl_delay", T.IntegerType()),
    ])

    def parse(it):
        for pdf in it:
            rows = {k: [] for k in ("host", "allow", "pattern", "like_pat",
                                    "specificity", "crawl_delay")}
            for h in pdf["host"]:
                k = int(str(h).removeprefix("site").removesuffix(".com"))
                parsed = parse_robots(_robots_txt(k), agent="sparkbot")
                delay = (None if parsed["crawl_delay"] is None
                         else int(parsed["crawl_delay"]))
                for r in parsed["rules"]:
                    rows["host"].append(h)
                    rows["allow"].append(r.allow)
                    rows["pattern"].append(r.pattern)
                    rows["like_pat"].append(r.like_pattern)
                    rows["specificity"].append(r.specificity)
                    rows["crawl_delay"].append(delay)
            out = pd.DataFrame(rows)
            out["specificity"] = out["specificity"].astype("Int32")
            out["crawl_delay"] = pd.array(rows["crawl_delay"], dtype="Int32")
            yield out

    rules = hosts.mapInPandas(parse, schema=rules_schema)

    # LEFT broadcast join keeps unmatched URLs in-flight (they surface as
    # one null-rule row), so the winner pick is ONE window over the join
    # output — no join-back of winners to the URL table (that was a
    # SortMergeJoin with two extra exchanges in the first cut of this plan).
    r = rules.select(
        "host", F.col("allow").alias("r_allow"),
        F.col("pattern").alias("r_pattern"), "like_pat", "specificity")
    joined = urls.join(
        F.broadcast(r),
        (urls["host"] == r["host"])
        & F.expr(r"path LIKE like_pat ESCAPE '\\'"),
        "left",
    ).select(urls["doc_id"], urls["host"], urls["path"],
             "r_allow", "r_pattern", "specificity")
    w = Window.partitionBy("doc_id").orderBy(
        F.col("specificity").desc_nulls_last(), F.col("r_allow").desc())
    best = (
        joined.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
    )
    delays = rules.groupBy("host").agg(F.min("crawl_delay").alias("crawl_delay"))
    return (
        best.join(F.broadcast(delays), "host", "left")
        .select(
            "doc_id", "host", "path",
            F.coalesce(F.col("r_allow"), F.lit(True)).alias("allowed"),
            F.col("r_pattern").alias("matched_rule"), "crawl_delay")
    )


# --- q_domain_stats: registrable-domain rollup (public-suffix matching) ---------
#
# URL-level stats need a grouping key coarser than host but finer than
# TLD: the PSL registrable domain. The match itself is relational —
# candidate suffixes (last 1/2/3 labels) exploded and equi-joined
# against the broadcast suffix list, longest hit wins, unknown TLD
# falls back to the last label.

_DOMAIN_SUFFIX_CASE = """CASE doc_id % 6
     WHEN 0 THEN 'co.uk'   WHEN 1 THEN 'com'
     WHEN 2 THEN 'github.io' WHEN 3 THEN 'org'
     WHEN 4 THEN 'com.au'  ELSE 'internal' END"""

_DOMAIN_CASE = """CASE doc_id % 6
     WHEN 0 THEN 'blog' || (doc_id % 7) || '.co.uk'
     WHEN 1 THEN 'site' || (doc_id % 7) || '.com'
     WHEN 2 THEN 'app' || (doc_id % 7) || '.github.io'
     WHEN 3 THEN 'plain' || (doc_id % 7) || '.org'
     WHEN 4 THEN 'shop' || (doc_id % 7) || '.com.au'
     ELSE 'naked' || (doc_id % 7) || '.internal' END"""

_HOST_CASE = """CASE doc_id % 6
     WHEN 0 THEN 'www.blog' || (doc_id % 7) || '.co.uk'
     WHEN 1 THEN (CASE WHEN (doc_id // 6) % 2 = 0 THEN 'a.' ELSE 'b.' END)
                 || 'site' || (doc_id % 7) || '.com'
     WHEN 2 THEN 'cdn.app' || (doc_id % 7) || '.github.io'
     WHEN 3 THEN 'plain' || (doc_id % 7) || '.org'
     WHEN 4 THEN 'deep.x.shop' || (doc_id % 7) || '.com.au'
     ELSE 'naked' || (doc_id % 7) || '.internal' END"""


@register(
    "q_domain_stats",
    f"""WITH h AS (
          SELECT doc_id,
                 {_HOST_CASE} AS host,
                 {_DOMAIN_CASE} AS domain,
                 {_DOMAIN_SUFFIX_CASE} AS suffix
          FROM documents)
        SELECT domain, suffix,
               COUNT(*) AS n_docs,
               COUNT(DISTINCT host) AS n_hosts
        FROM h GROUP BY domain, suffix""",
    doc="registrable-domain rollup: hosts with 1/2/3-label public "
        "suffixes (co.uk, com.au, github.io, bare TLDs, an unknown TLD "
        "falling back to its last label) are PSL-matched relationally — "
        "candidate suffixes exploded and equi-joined against the broadcast "
        "suffix list, longest hit wins — then rolled up to docs + distinct "
        "hosts per domain; the crawl-level grouping key",
    tags=("text", "crawl", "agg"),
)
def q_domain_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSL matching as data, not code — but with zero shuffle for the
    match: the host side left-joins the (broadcast) suffix table THREE
    times, once per candidate depth (last 1/2/3 labels), and the deepest
    hit wins via a CASE. No explode (no 3× row blowup), no per-doc
    re-aggregation; the only exchange in the whole plan is the final
    (domain, suffix) rollup a 100 TB crawl needs anyway. The suffix
    table stays data (swap in the full publicsuffix.org list without a
    plan change) yet every join is a map-side broadcast hash join."""
    from flink_job_spark.functions.crawl_text import PUBLIC_SUFFIXES

    d = load_table(spark, sf_dir, "documents")
    hosts = d.select("doc_id", F.expr(_HOST_CASE.replace("//", " DIV ")).alias("host"))
    labels = F.split(F.col("host"), r"\.")
    n = F.size(labels)
    hosts = hosts.select(
        "doc_id", "host", n.alias("n_labels"),
        F.element_at(labels, -1).alias("last1"),
        F.when(n >= 2, F.concat_ws(
            ".", F.element_at(labels, -2), F.element_at(labels, -1)))
         .alias("last2"),
        F.when(n >= 3, F.concat_ws(
            ".", F.element_at(labels, -3), F.element_at(labels, -2),
            F.element_at(labels, -1))).alias("last3"),
    )
    by_depth = {}
    for depth in (1, 2, 3):
        subset = [(s,) for s in PUBLIC_SUFFIXES if s.count(".") + 1 == depth]
        by_depth[depth] = spark.createDataFrame(subset, f"sfx{depth} string")
    j = (
        hosts
        .join(F.broadcast(by_depth[3]),
              hosts["last3"] == F.col("sfx3"), "left")
        .join(F.broadcast(by_depth[2]),
              hosts["last2"] == F.col("sfx2"), "left")
        .join(F.broadcast(by_depth[1]),
              hosts["last1"] == F.col("sfx1"), "left")
    )
    depth = (F.when(F.col("sfx3").isNotNull(), 3)
             .when(F.col("sfx2").isNotNull(), 2)
             .otherwise(1))  # unknown TLD → last label (PSL implicit rule)
    labels2 = F.split(F.col("host"), r"\.")
    suffix = F.concat_ws(
        ".", F.slice(labels2, F.col("n_labels") - depth + 1, depth))
    domain = F.when(
        F.col("n_labels") > depth,
        F.concat_ws(".", F.slice(labels2, F.col("n_labels") - depth, depth + 1)),
    ).otherwise(F.col("host"))
    return (
        j.select("host", domain.alias("domain"), suffix.alias("suffix"))
        .groupBy("domain", "suffix")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.countDistinct("host").alias("n_hosts"))
    )


# --- q_token_corpus_freq: unigram corpus-frequency rarity filter -----------------
#
# The KenLM-shaped quality signal without libm: per document, how common
# are its tokens in THIS corpus? Everything integer-exact — total
# tokens, sum/min of corpus frequencies, rare-token count (corpus
# freq ≤ 2) — plus one single-division ratio (engine-identical IEEE
# rounding, same convention as the media means).

_RARE_T = 2


@register(
    "q_token_corpus_freq",
    f"""WITH tok AS (
          SELECT doc_id, unnest({words_duck('text')}) AS w
          FROM documents),
        tok2 AS (SELECT doc_id, w FROM tok WHERE w <> ''),
        freq AS (SELECT w, COUNT(*) AS cnt FROM tok2 GROUP BY w)
        SELECT t.doc_id,
               COUNT(*) AS n_tokens,
               CAST(SUM(f.cnt) AS BIGINT) AS sum_freq,
               MIN(f.cnt) AS min_freq,
               CAST(SUM(CASE WHEN f.cnt <= {_RARE_T} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_rare,
               round(SUM(CASE WHEN f.cnt <= {_RARE_T} THEN 1 ELSE 0 END)
                     / CAST(COUNT(*) AS DOUBLE), 6) AS rare_ratio
        FROM tok2 t JOIN freq f ON t.w = f.w
        GROUP BY t.doc_id""",
    doc="corpus-frequency rarity filter (the KenLM-quality-filter shape, "
        "integer-exact): token counts over the whole corpus joined back "
        "per document — total tokens, sum/min corpus frequency, rare-token "
        "count and ratio; the signal that separates fluent text from "
        "gibberish without a language model",
    tags=("text", "quality", "prep"),
)
def q_token_corpus_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two shuffles, both combine-enabled: (1) word → count partial-aggs
    map-side before the exchange (Zipf head collapses early), (2) the
    per-doc rollup. The freq table is vocabulary-sized; at 100 TB it is
    still ≪ corpus and AQE will broadcast it for the join-back, making
    the doc side shuffle only once (the final doc_id rollup)."""
    d = fan_out(load_table(spark, sf_dir, "documents"))
    tok = (
        d.select("doc_id", F.explode(words("text")).alias("w"))
        .where(F.col("w") != "")
    )
    freq = tok.groupBy("w").agg(F.count(F.lit(1)).alias("cnt"))
    return (
        tok.join(freq, "w")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("cnt").alias("sum_freq"),
            F.min("cnt").alias("min_freq"),
            F.sum(F.when(F.col("cnt") <= _RARE_T, 1).otherwise(0))
             .alias("n_rare"),
            F.round(
                F.sum(F.when(F.col("cnt") <= _RARE_T, 1).otherwise(0))
                / F.count(F.lit(1)).cast("double"), 6).alias("rare_ratio"),
        )
    )


# --- q_pdf_extract: REAL PDF text extraction, value-exact oracle -----------------
#
# The #2 document format in any crawl after HTML. The parser follows the
# real object graph (startxref → xref table → /Root → page tree →
# /Contents, FlateDecode) and a content-stream tokenizer (BT/ET, Tj /
# TJ-with-kerning / ' line-show, Td/TD/T* line breaks, paren/octal/
# backslash string escapes). Fixtures alternate compression and
# TJ-vs-Tj encodings and embed the escape-needing characters ( ) \ %
# so one mishandled escape or a kerning number leaking into the text
# hash-mismatches.

@register(
    "q_pdf_extract",
    r"""SELECT doc_id,
              CAST(1 + doc_id % 3 AS INT) AS n_pages,
              (SELECT string_agg(
                    'Doc ' || doc_id || ' pg ' || t.p || ' alpha (beta)'
                    || chr(10) ||
                    'tail ' || doc_id || '-' || t.p || ' 50% \ done',
                    chr(10) ORDER BY t.p)
               FROM (SELECT unnest(range(1 + doc_id % 3)) AS p) t) AS text,
              CAST(length(
                (SELECT string_agg(
                    'Doc ' || doc_id || ' pg ' || t.p || ' alpha (beta)'
                    || chr(10) ||
                    'tail ' || doc_id || '-' || t.p || ' 50% \ done',
                    chr(10) ORDER BY t.p)
                 FROM (SELECT unnest(range(1 + doc_id % 3)) AS p) t))
               AS INT) AS n_chars,
              CASE doc_id % 11 WHEN 4 THEN 'rc4-40' WHEN 7 THEN 'rc4-128'
                   WHEN 9 THEN 'aesv2' ELSE 'none' END AS enc_mode
       FROM documents""",
    doc="PDF text extraction: per-doc 1-3 page PDFs cycling all THREE "
        "xref layouts (classic table / PDF-1.5 xref stream with PNG-Up "
        "predictor / xref stream + ObjStm-packed dictionaries) AND the "
        "content filters (Flate on odd ids, legacy LZWDecode on ids%5==2, "
        "an ASCII85 transport chain on ids%5==3), a Type0 subset font "
        "with 2-byte glyph codes recovered through its embedded "
        "/ToUnicode CMap on ids%7==1, kerned TJ arrays on "
        "ids%4>=2, parens/backslash/percent in the text, AND (r8) the "
        "standard security handler on ids%11 in {4,7,9} — RC4-40, "
        "RC4-128 and AES-128 /AESV2 owner-password-only encryption "
        "opened with the empty user password — parsed via the REAL "
        "object graph and content-stream tokenizer; page count and the "
        "exact extracted string rebuilt closed-form in SQL",
    tags=("text", "crawl", "formats"),
)
def q_pdf_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched encode→parse map stage over doc_id, zero
    shuffle — the 100 TB document-corpus shape (PDF bytes ride the
    binaryFile scan partitioning; parse cost is per-row, no library)."""
    import pandas as pd

    from flink_job_spark.functions.pdf import build_pdf, extract_pdf_text

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_pages", T.IntegerType()),
        T.StructField("text", T.StringType()),
        T.StructField("n_chars", T.IntegerType()),
        T.StructField("enc_mode", T.StringType()),
    ])

    _ENC = {4: "rc4-40", 7: "rc4-128", 9: "aesv2"}

    def run(it):
        for pdf_batch in it:
            n_pages_out, texts, lens, encs = [], [], [], []
            for i in pdf_batch["doc_id"]:
                i = int(i)
                pages = [
                    [f"Doc {i} pg {p} alpha (beta)",
                     f"tail {i}-{p} 50% \\ done"]
                    for p in range(1 + i % 3)
                ]
                enc = _ENC.get(i % 11)
                blob = build_pdf(pages, compress=bool(i % 2),
                                 use_tj_array=(i % 4 >= 2),
                                 xref_stream=(i % 3 == 1),
                                 use_objstm=(i % 3 == 2),
                                 lzw=(i % 5 == 2),
                                 ascii85=(i % 5 == 3),
                                 cid_font=(i % 7 == 1),
                                 encrypt=enc)
                r = extract_pdf_text(blob)
                n_pages_out.append(r["n_pages"])
                texts.append(r["text"])
                lens.append(len(r["text"]))
                encs.append(enc or "none")
            yield pd.DataFrame({
                "doc_id": pdf_batch["doc_id"],
                "n_pages": pd.array(n_pages_out, dtype="Int32"),
                "text": texts,
                "n_chars": pd.array(lens, dtype="Int32"),
                "enc_mode": encs})

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)


# --- q_sitemap_parse: crawl seeding (urlset + sitemapindex + gzip) ---------------
#
# The stage before robots filtering: the URL frontier is seeded from
# sitemaps. Three modes cover the protocol surface — a namespaced plain
# urlset, a gzip-transport urlset WITHOUT the namespace (both forms are
# common in the wild), and a gzipped sitemapindex.

@register(
    "q_sitemap_parse",
    """SELECT doc_id,
              CASE WHEN doc_id % 3 = 2 THEN 'sitemapindex'
                   ELSE 'urlset' END AS kind,
              CAST(1 + doc_id % 4 AS INT) AS n_entries,
              CASE WHEN doc_id % 3 = 2
                   THEN 'http://site' || (doc_id % 5) || '.com/sm0.xml'
                   ELSE 'http://site' || (doc_id % 5) || '.com/p0'
              END AS first_loc,
              CAST(1 + doc_id % 4 AS INT) AS n_lastmod,
              CAST((1 + doc_id % 4 + 1) // 2 AS INT) AS n_changefreq,
              CASE WHEN doc_id % 3 = 2 THEN NULL
                   ELSE CAST('0.' || (1 + doc_id % 4) AS DOUBLE)
              END AS max_priority
       FROM documents""",
    doc="sitemap parsing (sitemaps.org protocol): per-doc urlset / "
        "sitemapindex payloads — namespaced and namespace-less XML, plain "
        "and gzip transport — walked with DTD/entity bombs rejected and "
        "the 50k protocol cap enforced; kind, entry count, first loc, "
        "lastmod/changefreq coverage and max priority verified closed-form",
    tags=("text", "crawl", "formats"),
)
def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage, zero shuffle; sitemap payloads ride
    the binaryFile scan partitioning at 100 TB like every other blob."""
    import pandas as pd

    from flink_job_spark.functions.sitemap import build_sitemap, parse_sitemap

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("n_entries", T.IntegerType()),
        T.StructField("first_loc", T.StringType()),
        T.StructField("n_lastmod", T.IntegerType()),
        T.StructField("n_changefreq", T.IntegerType()),
        T.StructField("max_priority", T.DoubleType()),
    ])

    def run(it):
        for pdf in it:
            kinds, counts, firsts, lastmods, freqs, prios = \
                [], [], [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                n, k = 1 + i % 4, i % 5
                if i % 3 == 2:
                    entries = [{"loc": f"http://site{k}.com/sm{j}.xml",
                                "lastmod": f"2026-01-{10 + j}",
                                "changefreq": "daily" if j % 2 == 0 else None}
                               for j in range(n)]
                    blob = build_sitemap(entries, index=True, gzipped=True)
                else:
                    entries = [{"loc": f"http://site{k}.com/p{j}",
                                "lastmod": f"2026-01-{10 + j}",
                                "changefreq": "daily" if j % 2 == 0 else None,
                                "priority": f"0.{j + 1}"}
                               for j in range(n)]
                    blob = build_sitemap(entries, gzipped=bool(i % 3),
                                         namespaced=(i % 3 == 0))
                r = parse_sitemap(blob)
                es = r["entries"]
                kinds.append(r["kind"])
                counts.append(len(es))
                firsts.append(es[0]["loc"])
                lastmods.append(sum(1 for e in es if e["lastmod"]))
                freqs.append(sum(1 for e in es if e["changefreq"]))
                pr = [float(e["priority"]) for e in es if e["priority"]]
                prios.append(max(pr) if pr else None)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "kind": kinds,
                "n_entries": pd.array(counts, dtype="Int32"),
                "first_loc": firsts,
                "n_lastmod": pd.array(lastmods, dtype="Int32"),
                "n_changefreq": pd.array(freqs, dtype="Int32"),
                "max_priority": prios})

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)


# --- q_csv_sniff: dialect detection on unlabeled exports -------------------------
#
# Before spark.read.csv can touch a 100 TB drop of third-party exports,
# something must decide delimiter/header per file. Four delimiters, a
# quoted field EMBEDDING the delimiter in every row, header present on
# even ids only — the deterministic policy in crawl_text.sniff_csv.

_CSV_DELIMS_SQL = "CASE doc_id % 4 WHEN 0 THEN ',' WHEN 1 THEN ';' " \
                  "WHEN 2 THEN chr(9) ELSE '|' END"


@register(
    "q_csv_sniff",
    f"""SELECT doc_id,
               {_CSV_DELIMS_SQL} AS delimiter,
               doc_id % 2 = 0 AS has_header,
               CAST(3 AS INT) AS n_cols,
               CAST(2 + doc_id % 3 AS INT) AS n_rows,
               TRUE AS quoted
        FROM documents""",
    doc="CSV dialect sniffing: per-doc exports in four delimiters "
        "(comma/semicolon/tab/pipe) with a quoted field embedding the "
        "delimiter in every row and headers on even ids — the "
        "deterministic consistency-scored detection policy verified "
        "closed-form; the step before spark.read.csv on unlabeled drops",
    tags=("text", "crawl", "formats"),
)
def q_csv_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage, zero shuffle."""
    import pandas as pd

    from flink_job_spark.functions.crawl_text import CSV_DELIMS, sniff_csv

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("delimiter", T.StringType()),
        T.StructField("has_header", T.BooleanType()),
        T.StructField("n_cols", T.IntegerType()),
        T.StructField("n_rows", T.IntegerType()),
        T.StructField("quoted", T.BooleanType()),
    ])

    def run(it):
        for pdf in it:
            delims, headers, cols, rows_out, quoted = [], [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                d = CSV_DELIMS[i % 4]
                lines = []
                if i % 2 == 0:
                    lines.append(d.join(("name", "qty", "note")))
                for j in range(2 + i % 3):
                    lines.append(d.join((
                        f'"it{j}{d}x"', str(j + i % 7), f"p{j}")))
                r = sniff_csv("\n".join(lines))
                delims.append(r["delimiter"])
                headers.append(r["has_header"])
                cols.append(r["n_cols"])
                rows_out.append(r["n_rows"])
                quoted.append(r["quoted"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "delimiter": delims,
                "has_header": headers,
                "n_cols": pd.array(cols, dtype="Int32"),
                "n_rows": pd.array(rows_out, dtype="Int32"),
                "quoted": quoted})

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(run, schema=schema)


# --- q_dataset_card: per-source corpus statistics rollup --------------------------
#
# The one-page summary a dataset release ships: docs, languages, tokens,
# exact-dup rate, mean length and corpus share per source. Pure
# composition of the engine's own primitives — everything integer-exact
# except two single IEEE divisions.

from flink_job_spark.functions.text import (norm_text, norm_text_duck,
                                             ws_token_count,
                                             ws_token_count_duck)


@register(
    "q_dataset_card",
    f"""WITH s AS (
          SELECT source,
                 COUNT(*) AS n_docs,
                 COUNT(DISTINCT lang) AS n_langs,
                 CAST(SUM({ws_token_count_duck('text')}) AS BIGINT)
                   AS n_tokens,
                 CAST(COUNT(*) - COUNT(DISTINCT {norm_text_duck('text')})
                      AS BIGINT) AS dup_docs,
                 CAST(SUM(n_chars) AS BIGINT) AS sum_chars
          FROM documents GROUP BY source)
        SELECT source, n_docs, n_langs, n_tokens, dup_docs,
               round(CAST(sum_chars AS DOUBLE) / CAST(n_docs AS DOUBLE), 6)
                 AS mean_chars,
               round(CAST(n_docs AS DOUBLE)
                     / CAST(SUM(n_docs) OVER () AS DOUBLE), 6) AS share
        FROM s""",
    doc="dataset card: the per-source release summary — docs, distinct "
        "languages, whitespace tokens, exact-duplicate count (docs minus "
        "distinct normalized texts), mean length and corpus share — "
        "composed purely from the engine's own primitives, integer-exact "
        "except two single IEEE divisions",
    tags=("text", "quality", "agg", "prep"),
)
def q_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One groupBy(source) with combine-enabled partial aggs plus a
    scalar window for the share — at 100 TB the per-source cardinality
    is tiny, so the window input is a handful of rows; the heavy side
    shuffles once on source (and sources are few: pre-aggregate salting
    via two-level agg is the documented escape if one source dominates,
    operators/skew.py)."""
    from pyspark.sql import Window as W

    d = fan_out(load_table(spark, sf_dir, "documents"))
    per_source = (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("lang").alias("n_langs"),
            F.sum(ws_token_count("text")).alias("n_tokens"),
            (F.count(F.lit(1)) - F.countDistinct(norm_text("text")))
            .alias("dup_docs"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )
    return per_source.select(
        "source", "n_docs", "n_langs", "n_tokens", "dup_docs",
        F.round(F.col("sum_chars").cast("double")
                / F.col("n_docs").cast("double"), 6).alias("mean_chars"),
        F.round(F.col("n_docs").cast("double")
                / F.sum("n_docs").over(W.partitionBy()).cast("double"), 6)
        .alias("share"),
    )


# --- q_html_main: boilerplate removal by link density, value-exact ---------------
#
# The step after q_html_extract a training corpus actually uses: drop
# navs/footers/link farms, keep prose. Fixture pages carry a nav (pure
# links), a long headline, two long paragraphs (one with an inline
# link), a too-short paragraph, and a footer of links — the closed-form
# oracle rebuilds the exact surviving text AND the block accounting, so
# a block misclassified either way hash-mismatches.

_HM_H1 = "Headline ' || doc_id || ' with enough characters to pass"
_HM_P1 = ("First paragraph ' || doc_id || ' of the body with plenty of "
          "running text.")
_HM_P2 = ("Second paragraph ' || doc_id || ' with a link ' || doc_id || "
          "' inside but mostly prose.")


@register(
    "q_html_main",
    f"""SELECT doc_id,
               '{_HM_H1} {_HM_P1} {_HM_P2}' AS text,
               CAST(6 AS INT) AS n_blocks,
               CAST(3 AS INT) AS n_content_blocks,
               CAST(length('{_HM_H1}') + length('{_HM_P1}')
                    + length('{_HM_P2}') AS INT) AS content_chars,
               CAST(29 AS INT) AS boiler_chars
        FROM documents""",
    doc="main-content extraction: readability-style boilerplate removal "
        "(block segmentation + link-density and min-length rules) over "
        "per-doc pages carrying a nav, a headline, long paragraphs with "
        "an inline link, a too-short paragraph and a footer — the exact "
        "surviving text and the four block-accounting numbers rebuilt "
        "closed-form in SQL",
    tags=("text", "html", "crawl", "quality"),
)
def q_html_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage over doc_id, zero shuffle — the same
    100 TB shape as q_html_extract; the density rule is O(chars)."""
    import pandas as pd

    from flink_job_spark.functions.html_text import extract_main_content

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("text", T.StringType()),
        T.StructField("n_blocks", T.IntegerType()),
        T.StructField("n_content_blocks", T.IntegerType()),
        T.StructField("content_chars", T.IntegerType()),
        T.StructField("boiler_chars", T.IntegerType()),
    ])

    def run(it):
        for pdf in it:
            texts, nb, nc, cc, bc = [], [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                html = (
                    "<html><body>"
                    '<nav><a href="/a">L0</a> <a href="/b">L1</a> '
                    '<a href="/c">L2</a></nav>'
                    f"<article><h1>Headline {i} with enough characters "
                    "to pass</h1>"
                    f"<p>First paragraph {i} of the body with plenty of "
                    "running text.</p>"
                    "<p>Short.</p>"
                    f"<p>Second paragraph {i} with a "
                    f'<a href="/x">link {i}</a> inside but mostly '
                    "prose.</p></article>"
                    '<footer><a href="/p">Privacy</a> | '
                    '<a href="/t">Terms</a></footer>'
                    "</body></html>")
                r = extract_main_content(html)
                texts.append(r["text"])
                nb.append(r["n_blocks"])
                nc.append(r["n_content_blocks"])
                cc.append(r["content_chars"])
                bc.append(r["boiler_chars"])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"], "text": texts,
                "n_blocks": pd.array(nb, dtype="Int32"),
                "n_content_blocks": pd.array(nc, dtype="Int32"),
                "content_chars": pd.array(cc, dtype="Int32"),
                "boiler_chars": pd.array(bc, dtype="Int32")})

    d = load_table(spark, sf_dir, "documents")
    return fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)


# --- q_json_schema_infer: semi-structured schema profiling ------------------------
#
# The step BEFORE q_json_extract's declared schema exists: walk a corpus
# of JSON payloads and report, per field path, how often it appears,
# with which types (drift included), and how often it is null — the
# profile a 100 TB semi-structured ingest runs to decide the read
# schema. Fixtures drift deliberately: score flips float→int, fields go
# missing, nulls appear, an extra field shows up late.

_JSI_N = "(SELECT COUNT(*) FROM documents)"
_JSI_M = lambda *modes: ("(SELECT COUNT(*) FROM documents WHERE doc_id % 4 IN ("  # noqa: E731
                         + ",".join(str(m) for m in modes) + "))")


@register(
    "q_json_schema_infer",
    f"""SELECT * FROM (VALUES
          ('id',        'int',       {_JSI_N},             0),
          ('user',      'object',    {_JSI_N},             0),
          ('user.name', 'str',       {_JSI_M(0, 1, 2)},    {_JSI_M(3)}),
          ('user.age',  'int',       {_JSI_M(0, 2, 3)},    0),
          ('tags',      'array',     {_JSI_N},             0),
          ('tags[]',    'str',       {_JSI_M(0, 1, 2)},    0),
          ('score',     'float,int', {_JSI_M(0, 1, 3)},    {_JSI_M(2)}),
          ('beta',      'bool',      {_JSI_M(2)},          0)
        ) AS t(path, types, n_present, n_null)""",
    doc="JSON schema inference: per-doc semi-structured payloads with "
        "deliberate drift (score float->int, user.age missing in one "
        "mode, user.name null in another, a late-appearing beta field, "
        "empty arrays) profiled into per-path presence / null counts and "
        "the sorted set of observed types — the profile that produces "
        "q_json_extract's declared schema",
    tags=("text", "json", "formats", "agg"),
)
def q_json_schema_infer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched parse+flatten map stage emitting (doc, path,
    type) rows, then a single path-keyed rollup — the profile table is
    bounded by schema size, not corpus size, so the output side is tiny
    and the one shuffle arrives pre-combined (partial aggs on counts,
    collect_set dedup map-side)."""
    import json as _json

    import pandas as pd

    from pyspark.sql import functions as _F

    def flatten(v, path, out):
        if isinstance(v, dict):
            if path:
                out.add((path, "object", False))
            for k, sub in v.items():
                flatten(sub, f"{path}.{k}" if path else k, out)
        elif isinstance(v, list):
            out.add((path, "array", False))
            for el in v:
                flatten(el, path + "[]", out)
        elif v is None:
            out.add((path, "null", True))
        elif isinstance(v, bool):
            out.add((path, "bool", False))
        elif isinstance(v, int):
            out.add((path, "int", False))
        elif isinstance(v, float):
            out.add((path, "float", False))
        else:
            out.add((path, "str", False))

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("path", T.StringType(), False),
        T.StructField("typ", T.StringType(), False),
        T.StructField("is_null", T.BooleanType(), False),
    ])

    def run(it):
        import itertools
        for pdf in it:
            ids, paths, typs, nulls = [], [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                mode = i % 4
                doc = {"id": i,
                       "user": {"name": f"u{i}", "age": i % 80},
                       "tags": ["a", "b"],
                       "score": 1.5}
                if mode == 1:
                    del doc["user"]["age"]
                    doc["score"] = 7          # type drift: float -> int
                elif mode == 2:
                    doc["score"] = None
                    doc["beta"] = True
                elif mode == 3:
                    doc["tags"] = []
                    doc["user"]["name"] = None
                payload = _json.dumps(doc)
                out: set = set()
                flatten(_json.loads(payload), "", out)
                for path, typ, is_null in out:
                    ids.append(i)
                    paths.append(path)
                    typs.append(typ)
                    nulls.append(is_null)
            yield pd.DataFrame({"doc_id": ids, "path": paths,
                                "typ": typs, "is_null": nulls})

    d = load_table(spark, sf_dir, "documents")
    rows = fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)
    return (
        rows.groupBy("path")
        .agg(
            _F.array_join(
                _F.array_sort(_F.collect_set(
                    _F.when(~_F.col("is_null"), _F.col("typ")))), ",")
            .alias("types"),
            _F.countDistinct(
                _F.when(~_F.col("is_null"), _F.col("doc_id")))
            .alias("n_present"),
            _F.countDistinct(
                _F.when(_F.col("is_null"), _F.col("doc_id")))
            .alias("n_null"),
        )
    )


# --- q_sentence_split: rule-based segmentation, value-exact -----------------------
#
# The chunking granularity training-pair construction wants. Even docs
# carry every guard the splitter owns (abbreviations, decimal points,
# ordinal "No. 4", single-letter initials, ! and ? terminators); odd
# docs have no terminator at all (the tail sentence path).

@register(
    "q_sentence_split",
    """SELECT doc_id,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 5 ELSE 1 END AS INT)
                AS n_sentences,
              CASE WHEN doc_id % 2 = 0
                   THEN 'Dr. Smith met Mr. Jones at the 3.14 mile marker '
                        || doc_id || '.'
                   ELSE 'Single statement ' || doc_id || ' with trailing words'
              END AS first_sentence,
              CASE WHEN doc_id % 2 = 0
                   THEN 'J. K. Rowling wrote it.'
                   ELSE 'Single statement ' || doc_id || ' with trailing words'
              END AS last_sentence
       FROM documents""",
    doc="sentence segmentation: rule-based splitting with abbreviation "
        "(Dr./Mr./e.g./No./Fig.), decimal-point and single-letter-initial "
        "guards plus a next-token shape check — sentence count and the "
        "exact first/last sentences verified closed-form; the granularity "
        "training-pair chunking runs at",
    tags=("text", "crawl", "quality"),
)
def q_sentence_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One Arrow-batched map stage, zero shuffle."""
    import pandas as pd

    from flink_job_spark.functions.crawl_text import split_sentences

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("n_sentences", T.IntegerType()),
        T.StructField("first_sentence", T.StringType()),
        T.StructField("last_sentence", T.StringType()),
    ])

    def run(it):
        for pdf in it:
            ns, firsts, lasts = [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                if i % 2 == 0:
                    raw = (f"Dr. Smith met Mr. Jones at the 3.14 mile "
                           f"marker {i}.  They arrived e.g. at noon! "
                           f"Was it No. {i % 9} on Fig. 2? Yes. "
                           "J. K. Rowling wrote it.")
                else:
                    raw = f"Single statement {i} with trailing words"
                sents = split_sentences(raw)
                ns.append(len(sents))
                firsts.append(sents[0] if sents else None)
                lasts.append(sents[-1] if sents else None)
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "n_sentences": pd.array(ns, dtype="Int32"),
                "first_sentence": firsts, "last_sentence": lasts})

    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id").mapInPandas(run, schema=schema)


# --- q_html_links: outlink extraction + anchor-text rollup -----------------------
#
# The stage that builds the WEB GRAPH from a crawl: per-page <a href>
# extraction, RFC 3986 canonicalization of every target (uppercase hosts,
# default ports, dot segments and tracking params all collapse to one
# canonical URL), then the per-target rollup search/link-analysis pipelines
# consume (in-link count, distinct referrers, anchor text). The fixture
# plants an href-less anchor and a <noscript>-wrapped spam link per page —
# if either leaks into the graph the oracle hash-mismatches — and each
# 4-link page references one target TWICE so n_refs > n_src_docs is
# exercised (j and j+3 collapse via j % 3).

@register(
    "q_html_links",
    """WITH l AS (
         SELECT doc_id, unnest(range(1 + doc_id % 4)) AS j FROM documents
       ),
       t AS (
         SELECT doc_id, (doc_id * 3 + (j % 3)) % 11 AS t FROM l
       )
       SELECT 'http://site' || (t % 4) || '.com/p' || t || '?id=' || t
                AS target,
              CAST(COUNT(1) AS BIGINT) AS n_refs,
              CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_src_docs,
              MIN('L' || t || ' d' || doc_id) AS top_anchor
       FROM t GROUP BY t""",
    doc="web-graph construction from HTML: per-page outlink extraction "
        "(skip-subtree and href-less anchors excluded), RFC 3986 "
        "canonicalization collapsing four surface forms per target, then "
        "the per-target in-link rollup (refs, distinct referrers, minimum "
        "anchor text) link analysis and crawl frontiers consume",
    tags=("crawl", "html", "graph"),
)
def q_html_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extraction + canonicalization is one Arrow-batched map stage that
    emits (doc_id, target, anchor) rows — at 100 TB the only shuffle is
    the final combine-enabled per-target rollup, whose partial aggregation
    absorbs the in-link fan-in map-side (hot targets like a homepage are
    exactly the skew partial aggs exist for). The canonical string is the
    join key of every downstream link-graph op, so normalizing BEFORE the
    shuffle is what keeps one logical page from splitting into four
    shuffle keys."""
    import pandas as pd

    from flink_job_spark.functions.html_text import canonical_url, extract_links

    schema = T.StructType([
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("target", T.StringType()),
        T.StructField("anchor", T.StringType()),
    ])

    def run(it):
        for pdf in it:
            out_doc, out_tgt, out_anchor = [], [], []
            for i in pdf["doc_id"]:
                i = int(i)
                anchors = []
                for j in range(1 + i % 4):
                    t = (i * 3 + (j % 3)) % 11
                    if j % 2 == 0:
                        href = (f"HTTP://SITE{t % 4}.COM:80/p{t}"
                                f"?id={t}&utm_source=x")
                    else:
                        href = (f"http://site{t % 4}.com/a/../p{t}"
                                f"?id={t}&fbclid=y")
                    anchors.append(f'<a href="{href}">L{t} d{i}</a>')
                html = (
                    f"<html><body><h1>Page {i}</h1>" + " ".join(anchors)
                    + '<a name="no-href"></a>'
                    + '<noscript><a href="http://spam.example/x">spam</a>'
                    + "</noscript></body></html>")
                for link in extract_links(html):
                    out_doc.append(i)
                    out_tgt.append(canonical_url(link["href"])["canonical"])
                    out_anchor.append(link["anchor"])
            yield pd.DataFrame({"doc_id": pd.array(out_doc, dtype="int64"),
                                "target": out_tgt, "anchor": out_anchor})

    d = load_table(spark, sf_dir, "documents")
    links = fan_out(d.select("doc_id")).mapInPandas(run, schema=schema)
    return links.groupBy("target").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_refs"),
        F.countDistinct("doc_id").cast("bigint").alias("n_src_docs"),
        F.min("anchor").alias("top_anchor"),
    )
