"""Regenerate KEYS.md from the live query registry: `python gen_keys.py`."""

from __future__ import annotations


def main() -> None:
    from flink_job_spark.queries import all_queries

    qs = all_queries()
    lines = [
        "# KEYS — the query-key registry, auto-generated from "
        "`flink_job_spark/queries/`",
        "",
        f"{len(qs)} keys; 'oracle' = differentially checked against DuckDB SQL at",
        "sf0.01 (rows + columns + values); 'rows-only' = non-SQL-reproducible by",
        "nature (engine-specific sketch estimates / payload hashes), checked for",
        "shape. Regenerate with `python gen_keys.py`.",
        "",
        "| Key | Check | Tags | What it computes |",
        "| --- | --- | --- | --- |",
    ]
    for name in sorted(qs):
        s = qs[name]
        check = "oracle" if s.oracle else "rows-only"
        tags = ", ".join(sorted(s.tags))
        doc = " ".join(s.doc.split())
        lines.append(f"| `{name}` | {check} | {tags} | {doc} |")
    with open("KEYS.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"KEYS.md regenerated: {len(qs)} keys")


if __name__ == "__main__":
    main()
