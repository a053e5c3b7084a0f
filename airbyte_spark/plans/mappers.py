"""Connection-level mappers — hash / mask / encrypt / rename / row-filter.

Reference parity: Airbyte's connection "mappings" feature (public docs:
"Mappings" — hash a field with MD5/SHA-256 (the mapped field gains a
``_hashed`` suffix), rename a field, filter rows by a condition, and
encrypt a field with AES (gaining ``_encrypted``)). The reference repo's
CDK ships the per-record transformation plugins this generalizes
(declarative/transformations/add_fields.py, remove_fields.py — applied one
record at a time in Python); the platform applies mappers per-record
between source and destination. Here every mapper compiles to a Catalyst
column expression, so the whole chain fuses into the scan's project/filter
stage (whole-stage codegen, zero Python on the data path) and row filters
still push down to the source scan.

Spec grammar (JSON-friendly, extends plans/transforms.py):
    {"op": "hash_field", "name": "<col>", "method": "sha256"|"md5",
     "suffix": "_hashed"}
    {"op": "mask_field", "name": "<col>", "keep_prefix": <int>,
     "mask_char": "*"}
    {"op": "encrypt_field", "name": "<col>", "key": "<16/24/32B>",
     "suffix": "_encrypted"}
    {"op": "rename_field", "from": "<col>", "to": "<col>"}
    {"op": "filter_rows", "predicate": "<SQL boolean expr>"}

Scale shape: all five are narrow (no exchange). ``encrypt_field`` uses the
JVM ``aes_encrypt`` in deterministic ECB mode so re-syncs of the same
record produce the same ciphertext — required for the destination's LWW
dedup to keep treating re-sent records as duplicates (at-least-once read,
exactly-once sink). ECB determinism is the point, not a weakness, for
equality-joinable pseudonymization; use hash_field when reversibility
isn't needed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HASHERS = {
    "md5": lambda c: F.md5(c),
    "sha256": lambda c: F.sha2(c, 256),
    "sha512": lambda c: F.sha2(c, 512),
}


def hash_field(
    df: DataFrame, name: str, method: str = "sha256", suffix: str = "_hashed"
) -> DataFrame:
    """Replace a column with the hex digest of its string form and rename
    it ``<name><suffix>`` (Airbyte hashing-mapper shape). NULL stays NULL
    (the platform does not hash missing values into a sentinel digest)."""
    try:
        hasher = _HASHERS[method]
    except KeyError:
        raise ValueError(f"unknown hash method {method!r}") from None
    col = F.col(name)
    hashed = F.when(col.isNotNull(), hasher(col.cast("string")))
    return df.withColumn(name, hashed).withColumnRenamed(name, name + suffix)


def mask_field(
    df: DataFrame, name: str, keep_prefix: int = 0, mask_char: str = "*"
) -> DataFrame:
    """Keep the first ``keep_prefix`` characters, replace the rest with
    ``mask_char`` (length-preserving PII redaction)."""
    col = F.col(name).cast("string")
    masked = F.concat(
        F.substring(col, 1, keep_prefix),
        F.repeat(
            F.lit(mask_char),
            F.greatest(F.length(col) - keep_prefix, F.lit(0)),
        ),
    )
    return df.withColumn(name, F.when(col.isNotNull(), masked))


def encrypt_field(
    df: DataFrame, name: str, key: str, suffix: str = "_encrypted"
) -> DataFrame:
    """AES-encrypt a column (hex ciphertext), renamed ``<name><suffix>``.

    Deterministic ECB so identical plaintexts — including the same record
    re-delivered by an at-least-once source — encrypt identically and
    survive downstream dedup/merge equality. Key must be 16/24/32 bytes.
    """
    if len(key.encode()) not in (16, 24, 32):
        raise ValueError("AES key must be 16, 24, or 32 bytes")
    col = F.col(name).cast("string")
    enc = F.when(
        col.isNotNull(),
        F.hex(
            F.aes_encrypt(
                col.cast("binary"), F.lit(key), F.lit("ECB"), F.lit("PKCS")
            )
        ),
    )
    return df.withColumn(name, enc).withColumnRenamed(name, name + suffix)


def decrypt_field(df: DataFrame, name: str, key: str, out: str) -> DataFrame:
    """Inverse of :func:`encrypt_field` (for tests / authorized readback)."""
    col = F.col(name)
    dec = F.when(
        col.isNotNull(),
        F.aes_decrypt(
            F.unhex(col), F.lit(key), F.lit("ECB"), F.lit("PKCS")
        ).cast("string"),
    )
    return df.withColumn(out, dec)


def apply_mappers(df: DataFrame, specs: list[dict]) -> DataFrame:
    """Compile and apply a mapper chain (composable with
    plans/transforms.py apply_transforms; transforms dispatches these ops
    too, so one declarative list can mix both grammars)."""
    for spec in specs:
        op = spec["op"]
        if op == "hash_field":
            df = hash_field(
                df,
                spec["name"],
                method=spec.get("method", "sha256"),
                suffix=spec.get("suffix", "_hashed"),
            )
        elif op == "mask_field":
            df = mask_field(
                df,
                spec["name"],
                keep_prefix=spec.get("keep_prefix", 0),
                mask_char=spec.get("mask_char", "*"),
            )
        elif op == "encrypt_field":
            df = encrypt_field(
                df,
                spec["name"],
                key=spec["key"],
                suffix=spec.get("suffix", "_encrypted"),
            )
        elif op == "rename_field":
            df = df.withColumnRenamed(spec["from"], spec["to"])
        elif op == "filter_rows":
            df = df.filter(F.expr(spec["predicate"]))
        else:
            raise ValueError(f"unknown mapper op {op!r}")
    return df
