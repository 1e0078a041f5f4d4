"""entityresolution_capstone_spark — a from-scratch PySpark-native record-linkage engine.

A brand-new implementation of the *capabilities* of the reference capstone
(``wangyiranamy/EntityResolution_Capstone``, read-only at ``/root/reference/``):
blocking, pairwise string/relational similarity scoring, transitive clustering,
and pairwise-F1 evaluation — re-architected as an idiomatic PySpark DataFrame
pipeline over tables of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)``.

Nothing here is a port: the reference is a single-threaded in-memory Python
object-graph algorithm (see ``/root/repo/SURVEY.md``); this package expresses
the same semantics as distributed DataFrame plans (Catalyst-optimizable,
shuffle/skew-aware) plus vectorized pandas/Arrow UDF kernels where Spark
builtins cannot express the math (Jaro-Winkler, soft-TF-IDF).

Layout
------
- ``session``     SparkSession factory (Arrow, AQE, checkpointing).
- ``schemas``     canonical StructTypes.
- ``datagen``     deterministic seeded synthetic transcript corpus.
- ``sources``     readers/writers (parquet-manifest tables w/ Iceberg-style
                  commit semantics; legacy JSON/.dat parity parsers).
- ``functions``   scalar/kernel functions: tokenizer, name cleaner, string
                  similarity (Jaro/JW/Levenshtein), TF-IDF, soft-TF-IDF,
                  relational (Jaccard/Adar) kernels, deterministic hashing.
- ``operators``   pipeline operators: canonicalize, blocking, pair generation,
                  scoring, bootstrap, connected components, dedup,
                  similarity search, text stats, multimodal plumbing.
- ``plans``       stage runner with lineage + metrics + checkpoint/resume.
- ``streaming``   structured-streaming transcript ingest.
- ``evaluate``    pairwise P/R/F1 (distributed), AMI / V-measure.
"""

__version__ = "0.1.0"
