"""dedup_spell_variants' pigeonhole claim, fuzzed engine-free.

The query asserts depth-2 deletion-neighborhood blocking finds EVERY
pair within Levenshtein distance 2 (the SymSpell completeness
property). This test replays the exact neighborhood definition the
SQL uses (the word itself + all 1-char and ordered 2-char deletions)
in pure Python and checks, over hypothesis-generated word pairs, that
lev(a, b) <= 2 implies the neighborhoods intersect — so the equi-join
blocking can prune candidates but never lose a true pair."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

word = st.text(alphabet="abcd", min_size=0, max_size=7)


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def _neighborhood(w: str) -> set[str]:
    # mirrors the registry SQL: word + single deletions + ordered
    # double deletions (i < j)
    out = {w}
    n = len(w)
    for i in range(n):
        out.add(w[:i] + w[i + 1 :])
    for i in range(n):
        for j in range(i + 1, n):
            out.add(w[:i] + w[i + 1 : j] + w[j + 1 :])
    return out


@settings(max_examples=500, deadline=None)
@given(a=word, b=word)
def test_depth2_deletion_blocking_is_complete_for_lev2(a, b):
    if _lev(a, b) <= 2:
        assert _neighborhood(a) & _neighborhood(b), (a, b)


@settings(max_examples=200, deadline=None)
@given(a=word, b=word)
def test_blocking_prunes_most_far_pairs(a, b):
    # Not a completeness requirement — documents the OTHER direction:
    # sharing a variant bounds the distance (each word is within 2
    # deletions of the shared form, so lev(a, b) <= 4). Catches a
    # future neighborhood edit that accidentally blocks everything
    # into one bucket.
    if _neighborhood(a) & _neighborhood(b):
        assert _lev(a, b) <= 4, (a, b)
