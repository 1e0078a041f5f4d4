"""Deterministic, seeded synthetic transcript corpus with ground-truth entities.

Shape per FIXTURES.md / BASELINE.json input_hint: ``transcripts(conv_id,
turn_idx, role, text, tool, ts)`` plus ``labels(conv_id, entity_id)``.

Each entity has a persona template (a token sequence built from a seeded
vocabulary). Each of its conversations perturbs the template with:
- character typos (swap / drop / replace)  -> exercises Jaro-Winkler / Levenshtein
- token dropout and tail shuffles          -> exercises TF-IDF cosine
- exact duplicates                          -> exercises the exact-match bootstrap
  (reference resolver.py:444-475)
- a shared hot token in >=10% of convs      -> exercises hot-block skew handling

Everything derives from ``numpy.random.Generator(PCG64(seed))`` — two calls
with the same arguments produce byte-identical corpora (no wall-clock, no
global RNG).
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta

import numpy as np
import pandas as pd

_CONSONANTS = list("bcdfghjklmnpqrstvwz")
_VOWELS = list("aeiou")
ROLES = ["user", "assistant", "tool"]
TOOLS = ["search", "calculator", "browser", ""]
HOT_TOKEN = "commonhot"


@dataclass
class CorpusSpec:
    n_entities: int = 50
    convs_per_entity: int = 4
    tokens_per_template: int = 24
    turns_per_conv: int = 6
    typo_rate: float = 0.05
    drop_rate: float = 0.07
    dup_fraction: float = 0.15  # fraction of convs that are exact duplicates
    hot_fraction: float = 0.15  # fraction of convs carrying the hot token
    seed: int = 42


def _make_word(rng: np.random.Generator, n_chars: int) -> str:
    out = []
    for i in range(n_chars):
        pool = _CONSONANTS if i % 2 == 0 else _VOWELS
        out.append(pool[rng.integers(0, len(pool))])
    return "".join(out)


def _typo(rng: np.random.Generator, word: str) -> str:
    if len(word) < 2:
        return word
    kind = rng.integers(0, 3)
    pos = int(rng.integers(0, len(word) - 1))
    if kind == 0:  # swap
        return word[:pos] + word[pos + 1] + word[pos] + word[pos + 2 :]
    if kind == 1:  # drop
        return word[:pos] + word[pos + 1 :]
    repl = _CONSONANTS[rng.integers(0, len(_CONSONANTS))]
    return word[:pos] + repl + word[pos + 1 :]


def generate_corpus(spec: CorpusSpec | None = None) -> tuple[pd.DataFrame, pd.DataFrame]:
    """Return (transcripts, labels) pandas frames (deterministic for a spec)."""
    spec = spec or CorpusSpec()
    rng = np.random.Generator(np.random.PCG64(spec.seed))
    base_ts = datetime(2024, 1, 1)

    # shared vocabulary (so TF-IDF has cross-entity collisions) + entity-unique tokens
    shared_vocab = [_make_word(rng, int(rng.integers(4, 9))) for _ in range(200)]

    t_rows: list[tuple] = []
    l_rows: list[tuple] = []
    conv_counter = 0
    for ent in range(spec.n_entities):
        unique = [_make_word(rng, int(rng.integers(6, 11))) for _ in range(6)]
        template = []
        for i in range(spec.tokens_per_template):
            if i % 3 == 0:
                template.append(unique[i % len(unique)])
            else:
                template.append(shared_vocab[int(rng.integers(0, len(shared_vocab)))])

        prev_tokens: list[str] | None = None
        for c in range(spec.convs_per_entity):
            conv_id = f"c{conv_counter:06d}"
            conv_counter += 1
            if prev_tokens is not None and rng.random() < spec.dup_fraction:
                tokens = list(prev_tokens)  # exact duplicate of previous conv
            else:
                tokens = []
                for w in template:
                    if rng.random() < spec.drop_rate:
                        continue
                    if rng.random() < spec.typo_rate:
                        w = _typo(rng, w)
                    tokens.append(w)
                if not tokens:
                    tokens = [template[0]]
                if rng.random() < spec.hot_fraction:
                    tokens.append(HOT_TOKEN)
            prev_tokens = tokens

            # chunk tokens into turns
            per_turn = max(1, len(tokens) // spec.turns_per_conv)
            chunks = [
                tokens[i : i + per_turn] for i in range(0, len(tokens), per_turn)
            ]
            for t_idx, chunk in enumerate(chunks):
                role = ROLES[t_idx % 3]
                tool = TOOLS[t_idx % 4] if role == "tool" else ""
                ts = base_ts + timedelta(minutes=conv_counter, seconds=t_idx)
                t_rows.append((conv_id, t_idx, role, " ".join(chunk), tool, ts))
            l_rows.append((conv_id, ent))

    transcripts = pd.DataFrame(
        t_rows, columns=["conv_id", "turn_idx", "role", "text", "tool", "ts"]
    )
    transcripts["turn_idx"] = transcripts["turn_idx"].astype("int32")
    labels = pd.DataFrame(l_rows, columns=["conv_id", "entity_id"])
    labels["entity_id"] = labels["entity_id"].astype("int64")
    return transcripts, labels


def corpus_dataframes(spark, spec: CorpusSpec | None = None):
    """(transcripts_df, labels_df) as Spark DataFrames with canonical schemas."""
    from . import schemas

    t_pd, l_pd = generate_corpus(spec)
    return (
        spark.createDataFrame(t_pd, schema=schemas.TRANSCRIPTS),
        spark.createDataFrame(l_pd, schema=schemas.LABELS),
    )
