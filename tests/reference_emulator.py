"""Single-threaded reference-semantics emulator (independent oracle).

A direct, pure-Python transliteration of the reference algorithm's *semantics*
for the α=0 configuration (attribute-only scoring, the reference default,
resolver.py:236):

1. exact-match bootstrap: union-find over pairs whose canonical docs are equal
   (resolver.py:444-475 with default identity attrs);
2. agglomerative clustering with max linkage and a similarity threshold over
   the candidate pairs (resolver.py:506-555). With α=0 and max linkage this is
   exactly the transitive closure of {pairs with sim >= θ} — merge order
   cannot change the outcome because pair scores never change.

Every kernel here is an independent scalar implementation (no imports from the
package under test) so the e2e test is a genuine cross-check, not circular.
"""

from __future__ import annotations

import math
import re
from collections import Counter


def tokenize(doc: str) -> list[str]:
    return re.sub("[^a-zA-Z0-9]", " ", doc.strip()).lower().split()


def jaro(s1: str, s2: str) -> float:
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    w = max(max(l1, l2) // 2 - 1, 0)
    f1, f2 = [False] * l1, [False] * l2
    m = 0
    for i in range(l1):
        for j in range(max(0, i - w), min(l2 - 1, i + w) + 1):
            if not f2[j] and s2[j] == s1[i]:
                f1[i] = f2[j] = True
                m += 1
                break
    if m == 0:
        return 0.0
    a = [c for i, c in enumerate(s1) if f1[i]]
    b = [c for j, c in enumerate(s2) if f2[j]]
    t = sum(1 for x, y in zip(a, b) if x != y) / 2
    return (m / l1 + m / l2 + (m - t) / m) / 3


def jaro_winkler(s1: str, s2: str, p: float = 0.1) -> float:
    j = jaro(s1, s2)
    l = 0
    for a, b in zip(s1[:4], s2[:4]):
        if a != b:
            break
        l += 1
    return j + l * p * (1 - j)


def levenshtein(s1: str, s2: str) -> int:
    if not s1:
        return len(s2)
    prev = list(range(len(s2) + 1))
    for i, c1 in enumerate(s1, 1):
        cur = [i]
        for j, c2 in enumerate(s2, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (c1 != c2)))
        prev = cur
    return prev[-1]


def scaled_lev(s1: str, s2: str) -> float:
    mx = max(len(s1), len(s2))
    return 1.0 if mx == 0 else 1.0 - levenshtein(s1, s2) / mx


def tfidf_cosine(tokens1, tokens2, df, n_docs) -> float:
    def vec(tokens):
        tf = Counter(tokens)
        return {t: c * (n_docs / df[t]) for t, c in tf.items() if t in df}

    v1, v2 = vec(tokens1), vec(tokens2)
    dot = sum(w * v2[t] for t, w in v1.items() if t in v2)
    n1 = math.sqrt(sum(w * w for w in v1.values()))
    n2 = math.sqrt(sum(w * w for w in v2.values()))
    if n1 == 0 or n2 == 0:
        return 0.0
    return dot / (n1 * n2)


class DSU:
    def __init__(self):
        self.parent = {}

    def find(self, x):
        self.parent.setdefault(x, x)
        while self.parent[x] != x:
            self.parent[x] = self.parent[self.parent[x]]
            x = self.parent[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb


def resolve(
    docs: dict[str, str],
    candidate_pairs: list[tuple[str, str]],
    weights: dict[str, float],
    threshold: float,
    prefix_len: int = 64,
) -> dict[str, str]:
    """docs: conv_id -> canonical doc. Returns conv_id -> cluster label
    (min conv_id of the cluster, the deterministic representative)."""
    toks = {k: tokenize(v) for k, v in docs.items()}
    df = Counter()
    for ts in toks.values():
        df.update(set(ts))
    n = len(docs)

    dsu = DSU()
    for k in docs:
        dsu.find(k)

    # exact-match bootstrap
    by_doc: dict[str, str] = {}
    for k, v in sorted(docs.items()):
        if v in by_doc:
            dsu.union(k, by_doc[v])
        else:
            by_doc[v] = k

    # pair scoring + threshold merges (order-independent for alpha=0)
    for a, b in candidate_pairs:
        pa, pb = docs[a][:prefix_len], docs[b][:prefix_len]
        sim = 0.0
        if "jw" in weights:
            sim += weights["jw"] * jaro_winkler(pa, pb)
        if "jaro" in weights:
            sim += weights["jaro"] * jaro(pa, pb)
        if "lev" in weights:
            sim += weights["lev"] * scaled_lev(pa, pb)
        if "tfidf" in weights:
            sim += weights["tfidf"] * tfidf_cosine(toks[a], toks[b], df, n)
        if sim >= threshold:
            dsu.union(a, b)

    groups: dict[str, list[str]] = {}
    for k in docs:
        groups.setdefault(dsu.find(k), []).append(k)
    out = {}
    for members in groups.values():
        rep = min(members)
        for m in members:
            out[m] = rep
    return out
