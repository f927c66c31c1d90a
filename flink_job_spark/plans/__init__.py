"""Plan composition — the engine's 'IR' layer.

The reference's only query IR is generated SQL strings handed to Flink's
planner (SURVEY §3.1); this engine's IR is the Catalyst logical plan itself,
built by composing the operator builders below into DataFrame lineage. There
is deliberately no custom plan representation and no Catalyst extension
(SURVEY §4: every rewrite the reference needs — predicate/projection pushdown,
partition pruning, codegen — is built into Catalyst once plans are declared
through these builders).

This package is the single import surface for assembling end-to-end plans:

- snapshot protocol:  freeze_cutoff / cutoff_predicate / snapshot_scan
- audit envelope:     with_envelope / tech_column_names
- dual row hash:      row_hash_column (Column impl) + row_hash_sql_expr
                      (independent SQL-string impl for the sink side)
- consistency audit:  audit_aggregate / mismatch_topk / column_token_diff /
                      run_consistency_check
- full per-table plan: snapshot_ingest / ingest_tables (pipeline driver)
"""

from flink_job_spark.functions.hashing import (  # noqa: F401
    row_hash_column,
    row_hash_sql_expr,
)
from flink_job_spark.operators.audit import (  # noqa: F401
    audit_aggregate,
    column_token_diff,
    mismatch_topk,
    run_consistency_check,
)
from flink_job_spark.operators.envelope import (  # noqa: F401
    tech_column_names,
    with_envelope,
)
from flink_job_spark.operators.snapshot import (  # noqa: F401
    cutoff_predicate,
    freeze_cutoff,
    snapshot_scan,
)
from flink_job_spark.pipeline import (  # noqa: F401
    IngestConfig,
    IngestResult,
    ingest_tables,
    snapshot_ingest,
)

__all__ = [
    "row_hash_column", "row_hash_sql_expr",
    "audit_aggregate", "column_token_diff", "mismatch_topk",
    "run_consistency_check",
    "tech_column_names", "with_envelope",
    "cutoff_predicate", "freeze_cutoff", "snapshot_scan",
    "IngestConfig", "IngestResult", "ingest_tables", "snapshot_ingest",
]
