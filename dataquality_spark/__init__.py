"""dataquality_spark — a from-scratch, PySpark-native quality-filter engine.

Reimplements the decision semantics of the reference app
``adebnathdebnath43/DataQuality`` (17-dimension quality scoring, keep/drop
policy, timeliness rule, metadata-gated near-duplicate detection, PII risk
handling — see SURVEY.md for file:line citations) as an idiomatic Spark
DataFrame DAG over tables of audio-clip + transcript pairs.

Layout:
    datagen/    deterministic synthetic clips table (WAV PCM16 + transcripts)
    functions/  scalar building blocks: WAV codec, langid, perplexity, PII,
                MinHash — all vectorized (numpy / pandas UDF friendly)
    operators/  DataFrame-level stages: scoring, policy, dedup, reports
    oracle/     pure-Python (non-Spark) oracle of the same rules, for golden
                F1 testing
    io/         TableIO seam: partitioned parquet + manifest (Iceberg-style
                snapshot/resume semantics without the Iceberg jar)
    pipeline.py end-to-end run wiring
"""

__version__ = "0.1.0"
