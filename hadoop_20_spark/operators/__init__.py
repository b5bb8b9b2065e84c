"""Operator library — the semantics layer over Spark DataFrames.

Each module maps a section of SURVEY.md §2:

- ``rowops``      §2.3 projections/filters/row transforms (library mappers)
- ``joins``       §2.4 joins incl. override join and the join-expression DSL
- ``aggregate``   §2.5 aggregation descriptor DSL, ValueHistogram, counters
- ``sort``        §2.6-2.7 secondary sort, total order, top-k, sampling
- ``setops``      §2.8 union/intersect/except/dedup
- ``dedup``       LLM-pipeline dedup: exact, minhash-LSH, simhash, jaccard
- ``similarity``  embedding similarity search (brute-force + LSH-bucketed)
- ``text``        text analysis: lang-id, quality, tokens, fingerprints
- ``multimodal``  binary-column (image/audio/video) plumbing
- ``pipe``        §2.11 streaming-script pipe protocol compat
"""
