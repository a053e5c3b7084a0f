"""Synthetic deterministic binlog/WAL change stream + golden oracle.

The reference tests CDC behavior against live DB containers with scripted
insert/update/delete sequences (CdcSourceTest.java:318-470) and golden
record fixtures (BaseTypingDedupingTest.java:240-535). We replace both with
a seeded generator whose every field is a pure function of the event index
— identical output for any partitioning/parallelism — plus a single-threaded
pandas "reference applier" that defines the expected final table.
"""

from airbyte_spark.changelog.generator import ChangelogConfig, changelog_df, seed_df, write_changelog
from airbyte_spark.changelog.golden import apply_golden

__all__ = ["ChangelogConfig", "changelog_df", "seed_df", "write_changelog", "apply_golden"]
