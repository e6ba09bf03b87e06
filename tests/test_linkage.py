"""Property tests for the record-linkage operators' core lemmas (pure
Python — no Spark session needed, so they run in milliseconds).

symspell_name_correction's candidate EQUI-join is only exact if the
SymSpell pigeonhole lemma holds: any two strings within Levenshtein
distance 1 share a key in {s} ∪ deletes1(s).  The operator's soundness
comes from the explicit levenshtein refine; its COMPLETENESS (no missed
match can exist) comes from this lemma, so we fuzz it directly."""

from __future__ import annotations

from hypothesis import given, strategies as st


def _keys(s: str) -> set[str]:
    return {s} | {s[:i] + s[i + 1 :] for i in range(len(s))}


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[len(b)]


_word = st.text(alphabet="abcd", min_size=1, max_size=8)


@st.composite
def _near_pair(draw):
    """A word plus a ≤1-edit mutation of it (insert/delete/substitute/none)."""
    w = draw(_word)
    op = draw(st.sampled_from(["ins", "del", "sub", "none"]))
    i = draw(st.integers(0, max(0, len(w) - 1)))
    c = draw(st.sampled_from("abcd"))
    if op == "ins":
        m = w[:i] + c + w[i:]
    elif op == "del" and len(w) > 1:
        m = w[:i] + w[i + 1 :]
    elif op == "sub":
        m = w[:i] + c + w[i + 1 :]
    else:
        m = w
    return w, m


@given(_near_pair())
def test_distance_le_1_implies_shared_deletion_key(pair):
    w, m = pair
    assert _lev(w, m) <= 1
    assert _keys(w) & _keys(m), f"pigeonhole violated for {w!r} / {m!r}"


@given(_word, _word)
def test_shared_key_pairs_are_within_distance_2(a, b):
    """The converse bound: a shared k=1 deletion key never pairs strings
    farther than distance 2 apart — so the refine filter discards at most
    a bounded candidate set, never compensates for unbounded fan-in."""
    if _keys(a) & _keys(b):
        assert _lev(a, b) <= 2
