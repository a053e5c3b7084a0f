"""Dialect-templated SQL builders for the training-data pipeline operators
(fuzzy dedup, similarity search, text analysis).

Same pattern as plans/derived.py: every operator is ONE expression template
emitted in two dialects ('spark' | 'duckdb') that are bit-identical in
semantics — only function *names* differ (transform/list_transform,
sequence/range, array_min/list_min, ...). The Spark dialect powers the
DataFrame operators (via F.expr / spark.sql); the DuckDB dialect IS the
driver oracle. All arithmetic is integer-exact (embeddings are quantized to
BIGINT milli-units before any math) so value-hash comparison never sees
float noise.

Reference note: rosecape/airbyte has no fuzzy-dedup/similarity operators at
all (its only dedup is the PK LWW window, SURVEY.md §2.5) — these operators
are the training-data-pipeline extension built Spark-first from public
MinHash/SimHash/LSH literature (Broder 1997; Charikar 2002).
"""

from __future__ import annotations

SPARK = "spark"
DUCKDB = "duckdb"

MOD = 1_000_000_007  # rolling-hash modulus
Q = 1000  # embedding quantization: milli-units


def _chk(d: str) -> None:
    if d not in (SPARK, DUCKDB):  # pragma: no cover
        raise ValueError(d)


# ----------------------------------------------------------- tiny dialect ops


def T(d: str) -> str:
    """Array map higher-order function name."""
    return "transform" if d == SPARK else "list_transform"


def AMIN(d: str) -> str:
    return "array_min" if d == SPARK else "list_min"


def SIZE(d: str, arr: str) -> str:
    return f"size({arr})" if d == SPARK else f"len({arr})"


def SEQ(d: str, lo: str | int, hi: str | int) -> str:
    """Inclusive [lo, hi] integer sequence (empty unsupported — callers guard)."""
    if d == SPARK:
        return f"sequence({lo}, {hi})"
    return f"range({lo}, ({hi}) + 1)"


def IDX(d: str, arr: str, i: str) -> str:
    """1-based element access. Callers must keep i in bounds (Spark ANSI)."""
    return f"element_at({arr}, {i})" if d == SPARK else f"{arr}[{i}]"


def STR(d: str, x: str) -> str:
    t = "STRING" if d == SPARK else "VARCHAR"
    return f"CAST({x} AS {t})"


def SPLIT_WORDS(d: str, col: str) -> str:
    return f"split({col}, ' ')" if d == SPARK else f"string_split({col}, ' ')"


def ASUM(d: str, arr: str) -> str:
    """Integer sum over an array; 0 for empty. Result BIGINT-safe."""
    if d == SPARK:
        return f"aggregate({arr}, CAST(0 AS BIGINT), (a, x) -> a + x)"
    return f"coalesce(CAST(list_sum({arr}) AS BIGINT), CAST(0 AS BIGINT))"


def SHL(d: str, x: str | int, n: str | int) -> str:
    return f"shiftleft({x}, {n})" if d == SPARK else f"(({x}) << ({n}))"


def SHR(d: str, x: str, n: str) -> str:
    return f"shiftright({x}, {n})" if d == SPARK else f"(({x}) >> ({n}))"


def ADISTINCT(d: str, arr: str) -> str:
    return f"array_distinct({arr})" if d == SPARK else f"list_distinct({arr})"


def AFILTER(d: str, arr: str, lam: str) -> str:
    return f"filter({arr}, {lam})" if d == SPARK else f"list_filter({arr}, {lam})"


def ACONTAINS(d: str, arr: str, x: str) -> str:
    return f"array_contains({arr}, {x})" if d == SPARK else f"list_contains({arr}, {x})"


def AINTERSECT(d: str, a: str, b: str) -> str:
    """Set intersection of two DISTINCT arrays (hash-based in both engines —
    O(|a|+|b|); the filter+contains form is O(|a|*|b|) per pair). Element
    order differs between engines; callers must only take its SIZE."""
    return f"array_intersect({a}, {b})" if d == SPARK else f"list_intersect({a}, {b})"


def EMPTY_STR_ARRAY(d: str) -> str:
    return "array()" if d == SPARK else "CAST([] AS VARCHAR[])"


def REGEXP_COUNT(d: str, col: str, pattern: str) -> str:
    if d == SPARK:
        return f"regexp_count({col}, '{pattern}')"
    return f"len(regexp_extract_all({col}, '{pattern}'))"


def REGEXP_REPLACE_ALL(d: str, col: str, pattern: str, replacement: str) -> str:
    """Replace ALL matches (Spark replaces globally by default; DuckDB needs
    the explicit 'g' flag). Patterns must use character classes ([.]) rather
    than backslash escapes so the single-quoted literal parses identically
    in both engines. Guarded against the cross-engine traps: a single quote
    or backslash would break/diverge the SQL literal, and '$' in the
    replacement is a group reference in Java regex but literal in RE2 —
    all three are rejected rather than silently diverging."""
    for s, what in ((pattern, "pattern"), (replacement, "replacement")):
        if "'" in s or "\\" in s:
            raise ValueError(f"{what} must not contain quotes/backslashes: {s!r}")
    if "$" in replacement:
        raise ValueError(f"replacement must not contain '$' (Java group ref): {replacement!r}")
    if d == SPARK:
        return f"regexp_replace({col}, '{pattern}', '{replacement}')"
    return f"regexp_replace({col}, '{pattern}', '{replacement}', 'g')"


# ------------------------------------------------------------- text operators


def words_sql(d: str, col: str = "text") -> str:
    _chk(d)
    return SPLIT_WORDS(d, col)


def shingles_sql(d: str, col: str = "text", k: int = 3) -> str:
    """Word k-gram shingles (space-joined). Empty array when < k words."""
    _chk(d)
    w = SPLIT_WORDS(d, col)
    n = SIZE(d, w)
    if d == SPARK:
        gram = f"array_join(slice({w}, i, {k}), ' ')"
        body = f"transform({SEQ(d, 1, f'{n} - {k} + 1')}, i -> {gram})"
    else:
        gram = f"array_to_string(({w})[i:i+{k}-1], ' ')"
        body = f"list_transform({SEQ(d, 1, f'{n} - {k} + 1')}, i -> {gram})"
    return f"CASE WHEN {n} >= {k} THEN {body} ELSE {EMPTY_STR_ARRAY(d)} END"


def lines_sql(d: str, col: str = "text", w: int = 10) -> str:
    """Non-overlapping ``w``-word segments ("lines") per document, space
    re-joined — the deterministic re-linearization that stands in for real
    newline-split lines on the single-line synthetic corpus (the operator
    semantics are line-granular either way; a real web corpus would split
    on '\\n' instead, same plan shape). The final segment may be short.
    One segment [''] for empty text (split('') == [''])."""
    _chk(d)
    ws = SPLIT_WORDS(d, col)
    nl = IDIV(d, f"{SIZE(d, ws)} + {w - 1}", w)
    if d == SPARK:
        seg = f"array_join(slice({ws}, (i - 1) * {w} + 1, {w}), ' ')"
        return f"transform({SEQ(d, 1, f'CAST({nl} AS INT)')}, i -> {seg})"
    seg = f"array_to_string(({ws})[((i - 1) * {w} + 1):((i - 1) * {w} + {w})], ' ')"
    return f"list_transform({SEQ(d, 1, f'CAST({nl} AS INT)')}, i -> {seg})"


def hexn_sql(d: str, m: str, start: int, n: int = 12) -> str:
    """n hex digits of string expr ``m`` starting at 1-based ``start``,
    parsed as a non-negative integer. The engines have no COMMON hex-parse
    function, but each has a fast native path — Spark ``conv(x, 16, 10)``
    (one JVM call vs n instr+substr ops per shingle; the MinHash CPU is the
    dominant cost of the LSH dedup queries), DuckDB digit arithmetic (the
    oracle runs at sf0.01 where per-char cost is irrelevant). Both yield the
    identical non-negative integer for n <= 12 (< 2^48, no sign wrap);
    equivalence is pinned by tests/test_textsql_dialects.py."""
    _chk(d)
    if d == SPARK:
        return f"CAST(conv(substr({m}, {start}, {n}), 16, 10) AS BIGINT)"
    terms = []
    for j in range(n):
        mult = 16 ** (n - 1 - j)
        terms.append(
            f"CAST(instr('0123456789abcdef', substr({m}, {start + j}, 1)) - 1 AS BIGINT)"
            f" * {mult}"
        )
    return "(" + " + ".join(terms) + ")"


def IDIV(d: str, x: str | int, y: str | int) -> str:
    """Integer floor division (non-negative operands only in our uses)."""
    _chk(d)
    return f"(({x}) DIV ({y}))" if d == SPARK else f"(({x}) // ({y}))"


def sample_bucket_sql(d: str, id_expr: str, denom: int = 1000, start: int = 9) -> str:
    """Deterministic per-id sampling bucket in [0, denom): 6 hex chars of
    md5(id) starting at ``start``, mod denom. Uses a different md5 window
    than hash_split (start=1) so split membership and sampling decisions
    are decorrelated — a doc's train/val/test assignment must not predict
    whether the mixture sampler keeps it."""
    _chk(d)
    return f"({hexn_sql(d, f'md5({STR(d, id_expr)})', start, 6)} % {denom})"


def weight_case_sql(
    d: str, col: str, weights_milli: dict[str, int], default_milli: int = 1000
) -> str:
    """CASE ladder mapping a group column to its integer milli-weight
    (1000 = keep exactly once). Identical syntax in both dialects."""
    _chk(d)
    branches = " ".join(
        f"WHEN '{k}' THEN {int(v)}" for k, v in sorted(weights_milli.items())
    )
    return f"(CASE {col} {branches} ELSE {int(default_milli)} END)"


MINHASH_P = 281_474_976_710_677  # prime > 2^48; b*h2 + h1 stays < 2^53


def minhash_sql(d: str, shingles: str, n_hashes: int) -> str:
    """MinHash signature (Broder 1997) with a Carter-Wegman hash family:
    md5 is computed once per shingle and split into two 48-bit integers
    (h1, h2); hash function b is (h1 + b*h2) mod P. All-integer, exact in
    both engines, and 1 md5 per shingle instead of n_hashes."""
    _chk(d)
    h1s = f"{T(d)}({shingles}, s -> {hexn_sql(d, 'md5(s)', 1)})"
    h2s = f"{T(d)}({shingles}, s -> {hexn_sql(d, 'md5(s)', 13)})"
    if d == SPARK:
        pair = f"named_struct('a', {h1s}, 'b', {h2s})"
    else:
        pair = f"{{'a': {h1s}, 'b': {h2s}}}"
    comb = f"({IDX(d, 'p.a', 'i')} + b * {IDX(d, 'p.b', 'i')}) % {MINHASH_P}"
    per_b = f"{AMIN(d)}({T(d)}({SEQ(d, 1, SIZE(d, 'p.a'))}, i -> {comb}))"
    sig = f"{T(d)}({SEQ(d, 0, n_hashes - 1)}, b -> {per_b})"
    # bind the (h1s, h2s) pair once via a singleton transform so the md5
    # arrays are evaluated once per row, not once per hash function
    bound = f"{T(d)}({T(d)}({SEQ(d, 1, 1)}, one -> {pair}), p -> {sig})"
    return IDX(d, bound, "1")


def band_key_sql(d: str, sig: str, band: str | int, rows_per_band: int) -> str:
    """LSH band key: concat of the band's rows_per_band signature entries."""
    _chk(d)
    idx = STR(d, IDX(d, sig, f"({band}) * {rows_per_band} + r + 1"))
    parts = f"{T(d)}({SEQ(d, 0, rows_per_band - 1)}, r -> {idx})"
    if d == SPARK:
        return f"array_join({parts}, '|')"
    return f"array_to_string({parts}, '|')"


def hex16_sql(d: str, s: str) -> str:
    """First 16 bits of md5(s) as an integer (native hex parse per dialect,
    same split as hexn_sql)."""
    _chk(d)
    if d == SPARK:
        return f"CAST(conv(substr(md5({s}), 1, 4), 16, 10) AS BIGINT)"
    digits = []
    for j, mult in ((1, 4096), (2, 256), (3, 16), (4, 1)):
        digits.append(f"(instr('0123456789abcdef', substr(md5({s}), {j}, 1)) - 1) * {mult}")
    return "(" + " + ".join(digits) + ")"


def simhash16_sql(d: str, shingles: str) -> str:
    """16-bit SimHash (Charikar 2002): bit b set iff the sum over shingles of
    (2*bit_b(h16(shingle)) - 1) is >= 0."""
    _chk(d)
    hs = f"{T(d)}({shingles}, s -> {hex16_sql(d, 's')})"
    vote = f"{T(d)}(hs_, h -> 2 * (({SHR(d, 'h', 'b')}) & 1) - 1)"
    bit = f"CASE WHEN {ASUM(d, vote)} >= 0 THEN {SHL(d, 1, 'b')} ELSE 0 END"
    per_bit = f"{T(d)}({SEQ(d, 0, 15)}, b -> {bit})"
    # bind hs_ via a nested transform-of-singleton to avoid recomputing md5s
    expr = f"{T(d)}({T(d)}({SEQ(d, 1, 1)}, one -> {hs}), hs_ -> {ASUM(d, per_bit)})"
    return f"CAST({IDX(d, expr, '1')} AS BIGINT)"


def rolling_hash_sql(d: str, col: str = "text") -> str:
    """Polynomial rolling hash over the code points: h = (h*31 + c) % p.

    ONE pass: the string is split into a char array once (split/string_split
    with the empty separator — identical semantics in both engines) and
    folded; the previous form re-sliced the string per character
    (substr(col, i, 1) inside a transform over 1..length), i.e. O(len^2)
    per document — it was the slowest doc query at sf0.1 by ~15x."""
    _chk(d)
    if d == SPARK:
        body = (
            f"aggregate(split({col}, ''), CAST(0 AS BIGINT), "
            f"(a, c) -> (a * 31 + ascii(c)) % {MOD})"
        )
    else:
        chars = f"list_transform(string_split({col}, ''), c -> CAST(ascii(c) AS BIGINT))"
        body = (
            f"list_reduce(list_prepend(CAST(0 AS BIGINT), {chars}), "
            f"(a, c) -> (a * 31 + c) % {MOD})"
        )
    return f"CASE WHEN length({col}) = 0 THEN CAST(0 AS BIGINT) ELSE {body} END"


# ------------------------------------------------------- embedding operators


def quantize_sql(d: str, col: str = "embedding") -> str:
    """array<float> -> array<bigint> milli-units. float->double widening is
    exact, double*1000 and floor are IEEE-deterministic, so both engines
    produce identical integers — all downstream math is integer-exact."""
    _chk(d)
    q = f"CAST(floor(CAST(x AS DOUBLE) * {Q}) AS BIGINT)"
    return f"{T(d)}({col}, x -> {q})"


def dot_sql(d: str, a: str, b: str, dim: int) -> str:
    """Integer dot product of two quantized vectors."""
    _chk(d)
    prods = f"{T(d)}({SEQ(d, 1, dim)}, i -> {IDX(d, a, 'i')} * {IDX(d, b, 'i')})"
    return ASUM(d, prods)


def norm2_sql(d: str, a: str, dim: int) -> str:
    return dot_sql(d, a, a, dim)


def l2_sql(d: str, a: str, b: str, dim: int) -> str:
    """Integer squared L2 distance of two quantized vectors."""
    _chk(d)
    diff = f"({IDX(d, a, 'i')} - {IDX(d, b, 'i')})"
    prods = f"{T(d)}({SEQ(d, 1, dim)}, i -> {diff} * {diff})"
    return ASUM(d, prods)


def signbit_bucket_sql(d: str, qvec: str, n_bits: int = 8, offset: int = 0) -> str:
    """LSH bucket id from the sign bits of quantized dims
    [offset, offset + n_bits) — an axis-aligned random-hyperplane sketch
    (deterministic across engines). ``offset`` slices disjoint bit ranges
    so multiple independent LSH BANDS come from one sketch
    (embedding_neardup_pairs n_bands)."""
    _chk(d)
    bit = (
        f"CASE WHEN {IDX(d, qvec, 'b + 1')} >= 0 "
        f"THEN {SHL(d, 1, f'b - {offset}')} ELSE 0 END"
    )
    rng = SEQ(d, offset, offset + n_bits - 1)
    return f"CAST({ASUM(d, f'{T(d)}({rng}, b -> {bit})')} AS BIGINT)"


def bloom_pos_sql(d: str, expr: str, i: int, m: int) -> str:
    """Bloom-filter bit position ``i`` for string expr ``expr``: the i-th
    6-hex-digit window of md5(expr) mod ``m``. One md5 per row serves every
    hash function (k <= 5 windows fit the 32-hex digest); windows are
    disjoint so the k positions are independent draws, exactly the
    Carter-Wegman trick minhash_sql uses. Integer-exact in both dialects."""
    _chk(d)
    if not 0 <= i <= 4:  # 1 + 6*4 + 6 - 1 = 30 <= 32 hex chars
        raise ValueError(f"bloom hash index {i} out of range 0..4")
    return f"({hexn_sql(d, f'md5({expr})', 1 + 6 * i, 6)} % {m})"


def hll_parts_sql(d: str, expr: str, p: int = 6) -> tuple[str, str]:
    """(register, rho) exprs of the deterministic HyperLogLog sketch
    (Flajolet 2007) over md5(expr): a 48-bit hash (12 hex chars) splits
    into a 2^p register index (low p-ish bits via modulo) and a rho =
    leading-zero-count + 1 of the remaining 48 - p bits. Bit length comes
    from ``length(bin(x))`` — identical semantics in both engines
    (pinned in tests/test_textsql_dialects.py) — so the registers are a
    pure function of the data, unlike the engines' native
    approx_count_distinct whose sketch layout is private."""
    _chk(d)
    m = 1 << p
    rem_bits = 48 - p
    h = hexn_sql(d, f"md5({expr})", 1, 12)
    reg = f"({h} % {m})"
    w = f"(({h}) DIV ({m}))" if d == SPARK else f"(({h}) // ({m}))"
    wb = f"CAST({w} AS BIGINT)"
    rho = (
        f"(CASE WHEN {wb} = 0 THEN {rem_bits + 1} "
        f"ELSE {rem_bits + 1} - length(bin({wb})) END)"
    )
    return reg, rho
