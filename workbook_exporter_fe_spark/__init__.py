"""workbook_exporter_fe_spark — a PySpark-native time-series rollup engine.

A from-scratch re-expression of the query/data-processing capabilities of
the reference converter (``/root/reference/workbook_exporter-fe.py``) as an
idiomatic Spark engine:

- deterministic synthetic *sequences* input ``(doc_id, tokens, n_tok, source)``
  (``sources.datagen``),
- tier-0 eventization and 1m/1h/1d continuous-aggregate tiers
  (``operators.eventize``, ``operators.tiers``),
- gap-fill: LOCF + linear interpolation (``operators.gapfill``),
- Gorilla XOR float / delta-of-delta timestamp codecs in vectorized
  Arrow UDFs (``functions.codecs``),
- merge-upsert + retention + checkpoint/manifest resumability
  (``operators.merge``, ``operators.retention``, ``plans.pipeline``),
- operator-parity surface for every abstract operator in SURVEY.md §2
  (``operators.workbook``),
- training-data pipeline ops: dedup (exact / MinHash-LSH over words or
  token shingles / SimHash / n-gram Jaccard / embedding-cosine near-dup),
  similarity search (brute cosine, hyperplane LSH, IVF probe), text
  analysis, deterministic hash sampling + sequence packing
  (``operators.dedup``, ``operators.similarity``, ``operators.sampling``,
  ``functions.textops``).

Everything is DataFrame-native; pandas/Arrow UDFs appear only where Column
expressions cannot express the semantics (bit-packing codecs).
"""

__version__ = "0.1.0"
