"""Streaming twins of the batch operators (see SURVEY.md §2 row 40-43)."""

from __future__ import annotations


def with_file_cap(reader, max_files_per_trigger: int | None):
    """Apply maxFilesPerTrigger only when a cap is given: None means 'no
    per-trigger limit' (one big availableNow batch), never a silent
    coercion to 1-file micro-batches."""
    if max_files_per_trigger is not None:
        return reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader
