"""Regenerate KEYS.md from the live query registry: `python gen_keys.py`.

Keys are grouped into task sections (stable `##` headings = GitHub anchors)
so README.md's "pick your operator" index can deep-link; within a section the
table stays alphabetical. A key lands in the FIRST section whose tag set it
matches — ordering below is therefore the disambiguation rule.
"""

from __future__ import annotations

# (section title, matching tags) — first match wins
SECTIONS: list[tuple[str, set[str]]] = [
    ("Reference surface: snapshot audit & ingestion",
     {"audit", "flink-parity", "source", "sink", "envelope", "lookup",
      "resume", "scan", "pipeline", "sqlapi"}),
    ("Dedup a corpus",
     {"dedup", "lsh", "minhash", "simhash", "fuzzy", "merkle"}),
    ("Search embeddings",
     {"similarity", "ann", "ivf", "quantize", "vectors", "search", "recsys"}),
    ("Analyze & tokenize text",
     {"text", "tfidf", "tokenizer", "pii", "quality", "udtf"}),
    ("Process multimodal columns",
     {"multimodal", "png", "bmp", "gif", "jpeg", "audio", "video", "fft",
      "resize"}),
    ("Prepare training data",
     {"prep", "packing", "chunking", "contamination", "sampling", "sample",
      "impute", "privacy", "layout", "zorder"}),
    ("Streams, windows & sessions",
     {"streaming", "stateful", "cep", "session", "windows", "events"}),
    ("Sketches & approximate stats",
     {"sketch", "kmv", "bloom", "bitmap", "quantile"}),
    ("Graphs & iterative algorithms",
     {"graph", "iterative", "kmeans"}),
    ("Temporal, spatial & interval joins",
     {"asof", "spatial", "range", "intervals", "islands", "timeseries",
      "calendar", "rolling", "tolerance", "gapfill"}),
    ("CDC & table maintenance",
     {"cdc", "scd2", "diff", "incremental"}),
    ("Skew & scale machinery",
     {"skew", "scale", "shuffle", "pruning", "grid"}),
    ("TPC-H suite", {"tpch"}),
    ("Analytics, ML evaluation & behavior",
     {"analytics", "ml", "mleval", "stats", "behavior", "funnel", "cohort",
      "insights", "eval", "attribution", "profile", "skyline", "alloc"}),
    ("Relational core", set()),   # catch-all
]


def section_of(tags: set[str]) -> str:
    for title, match in SECTIONS:
        if not match or tags & match:
            return title
    return SECTIONS[-1][0]


def anchor(title: str) -> str:
    return "#" + "".join(c for c in title.lower().replace(" ", "-")
                         if c.isalnum() or c in "-_")


def main() -> None:
    from flink_job_spark.queries import all_queries

    qs = all_queries()
    grouped: dict[str, list[str]] = {t: [] for t, _ in SECTIONS}
    for name in sorted(qs):
        grouped[section_of(set(qs[name].tags))].append(name)

    lines = [
        "# KEYS — the query-key registry, auto-generated from "
        "`flink_job_spark/queries/`",
        "",
        f"{len(qs)} keys; 'oracle' = differentially checked against DuckDB SQL at",
        "sf0.01 (rows + columns + values); 'rows-only' = non-SQL-reproducible by",
        "nature (engine-specific sketch estimates / payload hashes), checked for",
        "shape. Regenerate with `python gen_keys.py`.",
        "",
        "Sections: " + " · ".join(
            f"[{t}]({anchor(t)})" for t, _ in SECTIONS if grouped[t]),
    ]
    for title, _ in SECTIONS:
        names = grouped[title]
        if not names:
            continue
        lines += ["", f"## {title}", "",
                  "| Key | Check | Tags | What it computes |",
                  "| --- | --- | --- | --- |"]
        for name in names:
            s = qs[name]
            check = "oracle" if s.oracle else "rows-only"
            tags = ", ".join(sorted(s.tags))
            doc = " ".join(s.doc.split())
            lines.append(f"| `{name}` | {check} | {tags} | {doc} |")
    with open("KEYS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    n_sections = sum(1 for t, _ in SECTIONS if grouped[t])
    print(f"KEYS.md regenerated: {len(qs)} keys in {n_sections} sections")


if __name__ == "__main__":
    main()
