"""Sink-side surfaces: Iceberg DDL/catalog generation + the writeTo branch."""
