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


# ---------------------------------------------------------------------------
# alpha > 0 extension: relational (jaccard / adar) kernels + merge loops.
# Scalar re-implementation of the reference's cluster-level relational
# machinery (resolver.py:1018-1100, utils.py:456-637) for pinning the
# distributed operators; shares no code with the reference.
# ---------------------------------------------------------------------------

import math


def cluster_nbr_multiset(assign: dict, edges: dict) -> dict:
    """cluster -> multiset (dict nbr_cluster -> count) of neighbor clusters.

    edges: node -> edge_id (one hyper-edge per node, citeseer shape).
    A node's neighbors are all co-members of its edge INCLUDING itself.
    """
    by_edge = {}
    for node, e in edges.items():
        by_edge.setdefault(e, []).append(node)
    out = {}
    for node, e in edges.items():
        c = assign[node]
        m = out.setdefault(c, {})
        for other in by_edge[e]:
            oc = assign[other]
            m[oc] = m.get(oc, 0) + 1
    return out


def rel_sim_scalar(n1: dict, n2: dict, strategy: str, uniq=None) -> float:
    """Relational similarity of two neighbor multisets under the strategy."""
    multiset = strategy.endswith("_fr")
    keys = set(n1) | set(n2)
    if strategy.startswith("jaccard"):
        if multiset:
            num = sum(min(n1.get(k, 0), n2.get(k, 0)) for k in keys)
            den = sum(max(n1.get(k, 0), n2.get(k, 0)) for k in keys)
        else:
            num = len(set(n1) & set(n2))
            den = len(keys)
        return num / den if den else 0.0
    # adar: uniqueness-weighted
    num = den = 0.0
    for k in keys:
        u = uniq(k)
        if multiset:
            num += min(n1.get(k, 0), n2.get(k, 0)) * u
            den += max(n1.get(k, 0), n2.get(k, 0)) * u
        else:
            num += u if (k in n1 and k in n2) else 0.0
            den += u
    return num / den if den else 0.0


def make_uniq_fn(nbrs: dict, strategy: str):
    """u(c) = 1/(1+ln(n_c)); n = distinct (set) vs multiset neighbor count."""
    multiset = strategy.endswith("_fr")

    def u(c):
        m = nbrs.get(c, {})
        n = sum(m.values()) if multiset else len(m)
        return 1.0 / (1.0 + math.log(n)) if n else 1.0

    return u


def resolve_alpha_rounds(
    ids, node_scores, edges, alpha, threshold,
    strategy="jaccard_coef", linkage="max", max_rounds=10,
):
    """Round-synchronous alpha-mixed merging — the distributed operator's
    contract (operators/iterative.py), scalar. Returns node -> cluster label.

    node_scores: {(id1, id2): attr_sim} unordered; missing pairs score 0.
    """
    assign = {i: i for i in ids}
    for _ in range(max_rounds):
        # cluster-pair attr linkage over member products (missing -> 0.0)
        members = {}
        for n, c in assign.items():
            members.setdefault(c, []).append(n)
        cand = set()
        for (a, b) in node_scores:
            ca, cb = assign[a], assign[b]
            if ca != cb:
                cand.add((min(ca, cb), max(ca, cb)))
        nbrs = cluster_nbr_multiset(assign, edges)
        uniq = make_uniq_fn(nbrs, strategy) if strategy.startswith("adar") else None

        def attr_link(ca, cb):
            vals = [
                node_scores.get((min(x, y), max(x, y)), 0.0)
                for x in members[ca]
                for y in members[cb]
            ]
            if linkage == "min":
                return min(vals)
            if linkage == "average":
                return sum(vals) / len(vals)
            return max(vals)

        merges = []
        for ca, cb in sorted(cand):
            rel = rel_sim_scalar(nbrs.get(ca, {}), nbrs.get(cb, {}), strategy, uniq)
            sim = (1 - alpha) * attr_link(ca, cb) + alpha * rel
            if sim >= threshold:
                merges.append((ca, cb))
        if not merges:
            break
        parent = {c: c for c in members}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for ca, cb in merges:
            ra, rb = find(ca), find(cb)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        assign = {n: find(c) for n, c in assign.items()}
    return assign
