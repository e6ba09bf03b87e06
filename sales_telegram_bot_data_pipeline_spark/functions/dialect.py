"""Two-dialect SQL fragment builders (Spark SQL + DuckDB).

The price-parser suite (functions/prices.py) is written ONCE as SQL templates
over these shims and instantiated for both engines, so the driver-facing
Spark query and its DuckDB oracle are structurally the same expression —
correctness parity by construction, and the Spark side stays fully JVM-native
(whole-stage codegen, no Python UDFs).

Differences handled here:
- regex string literals: Spark SQL processes backslash escapes in string
  literals, DuckDB does not;
- ``regexp_extract_all`` arity, partial/full regex match names;
- lambda higher-order functions: ``transform/filter`` vs ``list_transform/
  list_filter``;
- 1-based list indexing: ``try_element_at`` vs ``list_extract`` (both NULL
  out of bounds);
- array length / literal / split names, integer division.
"""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class Dialect:
    name: str

    # --- regex -----------------------------------------------------------
    def rlit(self, pattern: str) -> str:
        """A regex as a string literal with dialect-correct escaping."""
        if self.name == "spark":
            return "'" + pattern.replace("\\", "\\\\").replace("'", "\\'") + "'"
        return "'" + pattern.replace("'", "''") + "'"

    def re_all(self, x: str, pattern: str, rep: str) -> str:
        """Replace ALL matches (DuckDB needs the 'g' flag)."""
        if self.name == "spark":
            return f"regexp_replace({x}, {self.rlit(pattern)}, '{rep}')"
        return f"regexp_replace({x}, {self.rlit(pattern)}, '{rep}', 'g')"

    def re_search(self, x: str, pattern: str) -> str:
        if self.name == "spark":
            return f"({x} rlike {self.rlit(pattern)})"
        return f"regexp_matches({x}, {self.rlit(pattern)})"

    def fullmatch(self, x: str, pattern: str) -> str:
        if self.name == "spark":
            return f"({x} rlike {self.rlit('^(' + pattern + ')$')})"
        return f"regexp_full_match({x}, {self.rlit(pattern)})"

    def tokens(self, x: str) -> str:
        """``re.findall(r'\\d+[.,]?\\d*', x)`` — the reference's number
        tokenizer (price_processing.py:31 et al.)."""
        pat = self.rlit(r"\d+[.,]?\d*")
        if self.name == "spark":
            return f"regexp_extract_all({x}, {pat}, 0)"
        return f"regexp_extract_all({x}, {pat})"

    def re_extract(self, x: str, pattern: str, group: int) -> str:
        return f"regexp_extract({x}, {self.rlit(pattern)}, {group})"

    def re_count(self, x: str, pattern: str) -> str:
        """Number of non-overlapping matches, as INT in both engines."""
        if self.name == "spark":
            return f"cast(regexp_count({x}, {self.rlit(pattern)}) as int)"
        return f"cast(len(regexp_extract_all({x}, {self.rlit(pattern)})) as int)"

    # --- arrays ----------------------------------------------------------
    def transform(self, arr: str, lam: str) -> str:
        fn = "transform" if self.name == "spark" else "list_transform"
        return f"{fn}({arr}, {lam})"

    def filter(self, arr: str, lam: str) -> str:
        fn = "filter" if self.name == "spark" else "list_filter"
        return f"{fn}({arr}, {lam})"

    def alen(self, arr: str) -> str:
        fn = "size" if self.name == "spark" else "len"
        return f"{fn}({arr})"

    def get1(self, arr: str, i) -> str:
        """1-based element access, NULL when out of bounds."""
        if self.name == "spark":
            return f"try_element_at({arr}, {i})"
        return f"list_extract({arr}, {i})"

    def array_lit(self, items: list[str]) -> str:
        quoted = ", ".join("'" + s.replace("'", "''") + "'" for s in items)
        if self.name == "spark":
            return f"array({quoted})"
        return f"[{quoted}]"

    def splitws(self, x: str) -> str:
        """Python ``str.split()``: split on whitespace runs, drop empties."""
        if self.name == "spark":
            arr = f"split({x}, {self.rlit(chr(92) + 's+')})"
        else:
            arr = f"regexp_split_to_array({x}, {self.rlit(chr(92) + 's+')})"
        return self.filter(arr, "t -> t <> ''")

    def split_char(self, x: str, ch: str) -> str:
        if self.name == "spark":
            return f"split({x}, {self.rlit(ch)})"
        return f"string_split({x}, '{ch}')"

    def asum_int(self, arr: str) -> str:
        """Sum of an integer array, as BIGINT."""
        if self.name == "spark":
            return f"aggregate({arr}, cast(0 as bigint), (a, x) -> a + x)"
        return f"cast(list_sum({arr}) as bigint)"

    def adistinct(self, arr: str) -> str:
        fn = "array_distinct" if self.name == "spark" else "list_distinct"
        return f"{fn}({arr})"

    def contains_arr(self, arr: str, item: str) -> str:
        fn = "array_contains" if self.name == "spark" else "list_contains"
        return f"{fn}({arr}, {item})"

    # --- scalars ---------------------------------------------------------
    def shr(self, x: str, n) -> str:
        if self.name == "spark":
            return f"shiftright({x}, {n})"
        return f"({x} >> {n})"

    def hex2int(self, hex15: str) -> str:
        """15 hex chars → BIGINT (60 bits, always positive). Verified to
        produce identical values in both engines."""
        if self.name == "spark":
            return f"cast(conv({hex15}, 16, 10) as bigint)"
        return f"cast(('0x' || {hex15}) as bigint)"

    def md5_prefix_int(self, x: str) -> str:
        """Portable 60-bit content hash: first 15 hex chars of md5."""
        return self.hex2int(f"substr(md5({x}), 1, 15)")

    def fast_hash(self, x: str) -> str:
        """Engine-NATIVE 64-bit hash — an order of magnitude cheaper than
        md5 but NOT portable: Spark's xxhash64 and DuckDB's murmur-style
        hash() disagree.  Use it only where the hash value is internal to
        one query (join/dedup/count keys) and never influences the emitted
        rows; anything whose VALUES must agree across engines (minhash
        signatures, content hashes in output) stays on md5_prefix_int."""
        if self.name == "spark":
            return f"xxhash64({x})"
        return f"hash({x})"  # UBIGINT; fine as an internal key, don't cast

    def translate_map(self, x: str, frm: str, to: str) -> str:
        """Char-by-char mapping (len(frm) == len(to)); DuckDB lacks
        translate → nested replace chain."""
        if self.name == "spark":
            return f"translate({x}, '{frm}', '{to}')"
        out = x
        for a, b in zip(frm, to):
            out = f"replace({out}, '{a}', '{b}')"
        return out

    def strcast(self, x: str) -> str:
        t = "string" if self.name == "spark" else "varchar"
        return f"cast({x} as {t})"

    def idiv(self, a: str, b: str) -> str:
        if self.name == "spark":
            return f"({a} div {b})"
        return f"({a} // {b})"

    # --- structs ---------------------------------------------------------
    def struct_lit(self, fields: dict[str, str]) -> str:
        """Named struct from {field: sql}.  Callers must type-align the
        field exprs across CASE branches (cast NULLs)."""
        if self.name == "spark":
            inner = ", ".join(f"'{k}', {v}" for k, v in fields.items())
            return f"named_struct({inner})"
        inner = ", ".join(f"{k} := {v}" for k, v in fields.items())
        return f"struct_pack({inner})"

    def struct_get(self, s: str, field: str) -> str:
        if self.name == "spark":
            return f"({s}).{field}"
        return f"struct_extract({s}, '{field}')"


SPARK = Dialect("spark")
DUCKDB = Dialect("duckdb")


def strip_order_by(sql: str) -> str:
    """Remove the final presentation ``ORDER BY`` clause from a rendered
    SQL template, for callers that materialize the relation as an
    INTERMEDIATE (truth sets, candidate feeds) where a global sort
    shuffle buys nothing.

    Unlike the former ``sql.replace("ORDER BY ...", "")`` string surgery
    (ADVICE r8: a formatting drift makes the replace silently no-op into
    a perf-only regression), this FAILS LOUDLY when no trailing ORDER BY
    is present, so template drift surfaces as an error at query-build
    time instead of a hidden extra shuffle.  Only a TRAILING clause is
    stripped — ORDER BYs inside window specs or subqueries are never
    touched.
    """
    import re

    out, n = re.subn(r"ORDER BY [^)]*?\s*$", "", sql.rstrip())
    if n != 1:
        raise ValueError(
            "strip_order_by: no trailing ORDER BY clause found — the "
            "template this caller expected to de-sort has drifted"
        )
    return out
