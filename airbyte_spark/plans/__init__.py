"""Query plans for the driver's correctness gate.

These express the engine's operators over the driver-provided testdata
tables (events/documents/embeddings) so each has an exact DuckDB oracle.
"""
