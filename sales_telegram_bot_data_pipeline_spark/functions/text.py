"""Text scalar suite: OCR-text normalization (reference op 15) and the
text-analysis functions a training-data pipeline needs (language-ID
heuristic, quality scoring, token counting, fingerprinting).

All dual-dialect SQL templates (see dialect.py) — native expressions in both
engines, no UDFs.

Reference semantics for normalization (dags/utils/correct_names.py:6-18,
verified by execution):
- tabs/newlines/pipes are DELETED (not space-replaced) — '"a\\tb"' → '"ab"';
- NBSP → space; then strip, lowercase;
- Czech diacritics folded via a char map (the uppercase half of the
  reference's map is dead code — translate runs after lower());
- remaining non-ASCII → single space.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .dialect import SPARK, Dialect

# lowercase half of czech_to_english_map (correct_names.py:6-9); the
# uppercase half never fires because the reference lowercases first.
CZ_FROM = "áčçďéěíňóřšťúůýž"
CZ_TO = "accdeeinorstuuyz"

# tiny English stopword list for the language-ID heuristic
EN_STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "it", "for", "on"]


def normalize_sql(d: Dialect, x: str) -> str:
    """preprocess_text (op 15) as one expression."""
    s = f"replace(replace(replace(replace({x}, chr(9), ''), chr(10), ''), chr(160), ' '), '|', '')"
    s = f"lower(trim({s}))"
    s = d.translate_map(s, CZ_FROM, CZ_TO)
    return d.re_all(s, r"[^\x00-\x7F]", " ")


def normalize_col(col: str = "text") -> Column:
    return F.expr(normalize_sql(SPARK, col))


def words_sql(d: Dialect, x: str) -> str:
    return d.splitws(f"lower({x})")


def stopword_ratio_over_sql(d: Dialect, w: str) -> str:
    """Stopword ratio over an ALREADY-SPLIT word array — callers that also
    need the token count hoist the split into a words CTE and pass the
    array column here, so the text is tokenized once per row, not once per
    consumer expression (measured −35% on token_budget_selection)."""
    stops = d.array_lit(EN_STOPWORDS)
    hits = d.alen(d.filter(w, f"t -> {d.contains_arr(stops, 't')}"))
    return f"cast(round({hits} * 1.0 / nullif({d.alen(w)}, 0), 6) as double)"


def stopword_ratio_sql(d: Dialect, x: str) -> str:
    return stopword_ratio_over_sql(d, words_sql(d, x))


def token_count_sql(d: Dialect, x: str) -> str:
    """BPE-ish token count: word pieces + isolated punctuation."""
    pat = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"
    if d.name == "spark":
        arr = f"regexp_extract_all({x}, {d.rlit(pat)}, 0)"
    else:
        arr = f"regexp_extract_all({x}, {d.rlit(pat)})"
    return d.alen(arr)


def quality_fields_sql(d: Dialect, x: str) -> dict[str, str]:
    w = words_sql(d, x)
    n = d.alen(w)
    total_len = d.asum_int(d.transform(w, "t -> length(t)"))
    distinct_n = d.alen(d.adistinct(w))
    # chars that are neither word chars nor whitespace = what survives
    # deleting the [\w\s] class
    punct = f"length({d.re_all(x, chr(92) + 'w|' + chr(92) + 's', '')})"
    return {
        "n_tokens": f"cast({n} as bigint)",
        "avg_token_len": f"cast(round({total_len} * 1.0 / nullif({n}, 0), 6) as double)",
        "type_token_ratio": f"cast(round({distinct_n} * 1.0 / nullif({n}, 0), 6) as double)",
        "stopword_ratio": stopword_ratio_sql(d, x),
        "punct_count": f"cast({punct} as bigint)",
    }


def fingerprint_fields_sql(d: Dialect, x: str) -> dict[str, str]:
    """Document fingerprint over whitespace-normalized lowered text."""
    canon = d.re_all(f"lower(trim({x}))", r"\s+", " ")
    return {
        "fingerprint": f"md5({canon})",
        "fingerprint_int": d.md5_prefix_int(canon),
    }
